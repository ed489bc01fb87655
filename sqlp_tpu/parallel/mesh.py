"""Device mesh construction and sharding specs for the SD solver.

The reference is single-threaded CPU; its parallel design exists only as
comments ("Do 2, 3 (in parallel) for each epigraph ... Need mutex on DV
set", src/sd_algorithm/algorithm.jl:7-11). Here the implied parallel axes
become sharded tensor axes over a 1-D ``jax.sharding.Mesh``:

  * scenario stores ``scen_deltas``/``scen_weights`` shard over S — the
    argmax matmul [D,R]x[R,S] then computes per-shard scores locally and
    the SASA alpha/beta probability-weighted sums reduce across shards
    (XLA inserts the psum);
  * Monte-Carlo evaluation and large subproblem batches shard over B;
  * the dual pool, cut pools, master state, and x vectors stay replicated
    (small, and the dedup scan is inherently sequential).

Multi-host: initialize jax.distributed outside, build the mesh over all
devices; the same specs apply.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenarios"
DUAL_AXIS = "duals"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_duals: int, n_scenarios: int,
                 dual_axis: str = DUAL_AXIS,
                 scenario_axis: str = SCENARIO_AXIS) -> Mesh:
    """2-D mesh (duals x scenarios): the two growth axes of the argmax
    matmul [D,R]x[R,S] each get their own mesh dimension (SURVEY §5.7 —
    the solver's analog of 2-D sequence sharding). The dual pool shards
    over the first axis, scenario stores over the second; per-device
    memory then scales as D/n_duals + S/n_scenarios, and the [D,S] score
    panel is computed blockwise with no replicated big operand. The step
    stays global-view; XLA inserts the cross-shard argmax/psum combines.
    """
    devs = jax.devices()[:n_duals * n_scenarios]
    assert len(devs) == n_duals * n_scenarios, (
        f"need {n_duals * n_scenarios} devices, have {len(jax.devices())}")
    return Mesh(np.asarray(devs).reshape(n_duals, n_scenarios),
                (dual_axis, scenario_axis))


def state_pspecs(axis_name: str = SCENARIO_AXIS,
                 shard_duals: bool = False,
                 dual_axis: Optional[str] = None):
    """PartitionSpec pytree for SDState (field-name keyed).

    ``shard_duals`` additionally shards the dual-vertex pool (the
    north-star's second scaling axis: the argmax matmul is [D,R]x[R,S],
    and at large pool capacities the replicated [D, m2] pool dominates
    per-device memory) — over ``dual_axis`` when given (2-D mesh from
    ``make_mesh_2d``), else over the same 1-D axis as the scenarios.
    The step function is written in global view, so no op changes — XLA
    inserts the cross-shard max/psum for the argmax reduction and the
    dedup compare. Leave off (replicated) for small pools, where the
    collectives cost more than they save.
    """
    da = dual_axis if dual_axis is not None else axis_name
    s = P(None, axis_name)          # [E, S]
    s3 = P(None, axis_name, None)   # [E, S, R]
    d = P(da, None) if shard_duals else P()   # [D, m2]
    d1 = P(da) if shard_duals else P()        # [D]
    r = P()                         # replicated
    return dict(
        key=r, it=r,
        scen_deltas=s3, scen_weights=s, n_scen=r, n_stream=r,
        total_weight=r, scen_dropped=r,
        duals=d, duals_rounded=d, n_duals=r, duals_dropped=r,
        duals_score=d1,
        cut_alpha=r, cut_beta=r, cut_mark=r, cut_live=r, cut_dual=r,
        cut_x=r,
        inc_alpha=r, inc_beta=r, inc_valid=r,
        x_candidate=r, x_incumbent=r,
        cand_est=r, inc_est=r, req_improvement=r, is_improved=r,
        quad_scalar=r, normDk_1=r, normDk_init=r, xover_dry=r,
        master_solved=r, master_z=r, master_mu=r, master_rho=r,
        sub_warm_Y=r, sub_warm_L=r,
    )


def state_shardings(mesh: Mesh, axis_name: str = SCENARIO_AXIS,
                    shard_duals: bool = False,
                    dual_axis: Optional[str] = None):
    """NamedSharding pytree matching SDState's dataclass fields. A 2-D
    mesh (make_mesh_2d) implies shard_duals over its dual axis."""
    if dual_axis is None and len(mesh.axis_names) == 2:
        dual_axis, axis_name = mesh.axis_names
        shard_duals = True
    specs = state_pspecs(axis_name, shard_duals=shard_duals,
                         dual_axis=dual_axis)
    return {k: NamedSharding(mesh, v) for k, v in specs.items()}


def _put(a, sharding):
    """Place host data with a sharding that may span processes.

    ``jax.device_put`` only targets addressable devices; when the mesh
    spans multiple processes (multi-host), each process must contribute
    its local shards of the global array instead — every process holds the
    same host value (instance data / the seed-deterministic initial
    state), so slicing it by the global index is exactly SPMD placement.
    """
    if jax.process_count() > 1:
        import numpy as _np
        h = _np.asarray(a)
        return jax.make_array_from_callback(h.shape, sharding,
                                            lambda idx: h[idx])
    return jax.device_put(a, sharding)


def shard_state(state, mesh: Mesh, axis_name: str = SCENARIO_AXIS,
                shard_duals: bool = False):
    """Place an SDState's arrays according to the sharding plan (1-D or
    2-D mesh; a 2-D mesh shards duals over its first axis)."""
    sh = state_shardings(mesh, axis_name, shard_duals=shard_duals)
    kw = {f.name: _put(getattr(state, f.name), sh[f.name])
          for f in dataclasses.fields(state)}
    return dataclasses.replace(state, **kw)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (instance arrays, prep, etc.)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: _put(a, sharding), tree)


def place_batch(a, mesh: Mesh, axis_name: str = SCENARIO_AXIS):
    """Shard a host [B, ...] panel along its batch axis over the mesh
    (Monte-Carlo evaluation panels, large subproblem batches). On a 2-D
    mesh the batch axis shards over BOTH mesh axes (an evaluation panel
    has no dual dimension, so every device takes a slice). B must be
    divisible by the total mesh size; multi-process safe."""
    axes = tuple(mesh.axis_names) if len(mesh.axis_names) > 1 \
        else (axis_name,)
    spec = P(axes, *([None] * (np.ndim(a) - 1)))
    return _put(a, NamedSharding(mesh, spec))


def to_host(a) -> np.ndarray:
    """Fetch a (possibly cross-process sharded) array to every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)
