"""Checkpoint / resume for the SD solver state.

The reference has no checkpointing — algorithm state lives only in process
memory (SURVEY.md §5.4). Because our entire solver state is one pytree of
arrays (sqlp_tpu/sd/state.py), a checkpoint is a flat .npz of its fields;
resume restores every array including the PRNG key, so a restored run
continues the exact trajectory (deterministic step + restored key).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sqlp_tpu.sd.state import SDState

_META_PREFIX = "__meta_"


def save_state(path: str, state: SDState, **meta) -> None:
    """Write the state pytree (and optional scalar metadata) to .npz.

    Works on sharded states, including cross-process meshes: every field
    is gathered to the host first, so each process writes the full global
    state (call from process 0 only, or give each process its own path).
    """
    from sqlp_tpu.parallel.mesh import to_host

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {f.name: to_host(getattr(state, f.name))
               for f in dataclasses.fields(state)}
    for k, v in meta.items():
        payload[_META_PREFIX + k] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)


def load_state(path: str, template: Optional[SDState] = None) -> SDState:
    """Restore an SDState. With a template (from init_state), dtypes/shapes
    are validated against the current configuration."""
    with np.load(path) as z:
        fields = {k: z[k] for k in z.files if not k.startswith(_META_PREFIX)}
    names = {f.name for f in dataclasses.fields(SDState)}
    # n_stream (the reservoir's stream scenario count) predates weighted
    # streams; every earlier run used unit weights, where the stream count
    # IS the total weight — restore it exactly (not from the template).
    if "n_stream" not in fields and "total_weight" in fields:
        fields["n_stream"] = np.asarray(fields["total_weight"], np.int32)
    # cut_x (each cut's generating point, for periodic cut refresh)
    # predates round 4; any feasible point is a valid generating point,
    # so default legacy checkpoints to the incumbent.
    if "cut_x" not in fields and "cut_alpha" in fields:
        # single-run states are [E, K]; replicated checkpoints carry a
        # leading replication axis ([R, E, K] cut_alpha, [R, n1]
        # x_incumbent) — default each replication's generating points to
        # its own incumbent
        ca = fields["cut_alpha"]
        xi = np.asarray(fields["x_incumbent"])
        if ca.ndim == 2:
            E, K = ca.shape
            fields["cut_x"] = np.broadcast_to(
                xi, (E, K) + xi.shape).copy()
        else:
            R, E, K = ca.shape
            fields["cut_x"] = np.broadcast_to(
                xi[:, None, None, :], (R, E, K, xi.shape[-1])).copy()
    missing = names - fields.keys()
    if missing:
        # Forward compatibility with checkpoints written before SDState
        # grew a field (e.g. master_rho): scalar fields default from the
        # template (its init_state value — for master_rho, config.qp.rho),
        # which is exactly what a pre-change run was implicitly using.
        # Array fields have no safe default, so those still hard-error.
        defaultable = {n for n in missing
                       if template is not None
                       and jnp.ndim(getattr(template, n)) == 0}
        if missing - defaultable:
            raise ValueError(
                f"checkpoint {path} missing fields: {sorted(missing)}")
        import warnings
        warnings.warn(
            f"checkpoint {path} predates fields {sorted(defaultable)}; "
            "defaulting them from the current configuration")
        for n in defaultable:
            fields[n] = np.asarray(getattr(template, n))
    arrays = {}
    for name in names:
        a = jnp.asarray(fields[name])
        if template is not None:
            t = getattr(template, name)
            if a.shape != t.shape:
                raise ValueError(
                    f"checkpoint field {name}: shape {a.shape} != "
                    f"configured {t.shape} (capacities must match)")
            a = a.astype(t.dtype)
        arrays[name] = a
    return SDState(**arrays)


def load_meta(path: str) -> dict:
    with np.load(path) as z:
        return {k[len(_META_PREFIX):]: z[k].item()
                for k in z.files if k.startswith(_META_PREFIX)}
