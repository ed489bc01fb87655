"""Compromise decisions across SD replications.

The reference planned this as a plugin and never implemented it
(src/sd_algorithm/plugin/compromise.jl is 0 bytes). Following Sen & Liu,
"Mitigating Uncertainty via Compromise Decisions in Two-stage Stochastic
Linear Programming" (the standard SD aggregation): run R independent SD
replications, then solve the compromise problem

    min_x  c@x + (1/R) sum_r F_r(x) + rho/2 ||x - x_bar||^2

where F_r is replication r's cut-pool model (its epigraph max) and x_bar
the average of the replication incumbents. Here the compromise master is
assembled by concatenating the replications' cut pools into one merged
multi-epigraph state — exactly the machinery the per-iteration master uses
— and solved by the on-device ADMM QP.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqlp_tpu.config import QPConfig
from sqlp_tpu.models.instance import Instance
from sqlp_tpu.ops.prox_qp import solve_qp
from sqlp_tpu.sd.master import assemble_master
from sqlp_tpu.sd.state import EpigraphSpec, SDState


def _merge_states(states: Sequence[SDState], especs: Sequence[EpigraphSpec],
                  scale: float) -> Tuple[SDState, EpigraphSpec]:
    """Concatenate replications' epigraphs into one state; weights scaled
    by 1/R so the merged objective is the replication average."""
    cat = lambda field: jnp.concatenate([getattr(s, field) for s in states],
                                        axis=0)
    merged = dataclasses.replace(
        states[0],
        cut_alpha=cat("cut_alpha"),
        cut_beta=cat("cut_beta"),
        cut_mark=cat("cut_mark"),
        cut_live=cat("cut_live"),
        cut_dual=cat("cut_dual"),
        cut_x=cat("cut_x"),
        inc_alpha=cat("inc_alpha"),
        inc_beta=cat("inc_beta"),
        inc_valid=cat("inc_valid"),
        total_weight=cat("total_weight"),
    )
    espec = EpigraphSpec(
        obj_weight=jnp.concatenate(
            [e.obj_weight * scale for e in especs]),
        lower_bound=jnp.concatenate([e.lower_bound for e in especs]),
    )
    return merged, espec


def compromise_decision(inst: Instance, states: Sequence[SDState],
                        especs: Sequence[EpigraphSpec],
                        rho: float = 1.0,
                        qp_config: QPConfig = QPConfig(),
                        obj_scale: float = 1.0
                        ) -> Tuple[np.ndarray, dict]:
    """Solve the compromise problem over replication cut models.

    Args:
      inst: the (shared) instance.
      states: final SDState per replication.
      especs: per-replication epigraph specs.
      rho: proximal weight toward the incumbent average (user units).
      qp_config: master QP parameters.
      obj_scale: the replications' SDSolver.obj_scale when objective
        normalization was active (their cut pools live in scaled units).

    Returns: (x_compromise, info) with info holding the QP stats, the
    incumbent average, and per-replication incumbents.
    """
    R = len(states)
    assert R >= 1 and len(especs) == R
    x_bar = jnp.mean(jnp.stack([s.x_incumbent for s in states]), axis=0)

    arrays = inst.arrays
    if obj_scale != 1.0:
        arrays = dataclasses.replace(
            arrays, c=arrays.c / obj_scale, q=arrays.q / obj_scale)
        rho = rho / obj_scale
    merged, espec = _merge_states(states, especs, 1.0 / R)
    merged = dataclasses.replace(merged, x_incumbent=x_bar)
    rho_j = jnp.asarray(rho, arrays.c.dtype)
    p_diag, g, A, l, u, is_eq = assemble_master(
        arrays, espec, merged, rho_j)
    z, mu, stats = solve_qp(p_diag, g, A, l, u, is_eq, qp_config)
    # The ADMM exit is feasible only to its tolerance; a compromise x with
    # an epsilon-negative component makes downstream recourse LPs
    # INFEASIBLE at exact-solver tolerances (observed on ssn: the MC
    # evaluator's HiGHS fallback threw on x_comp with a -3e-6 entry).
    # Clip to the variable box, then project onto the first-stage polytope
    # when any row is still violated — the same discipline sd_step applies
    # to every candidate.
    from sqlp_tpu.models.routines import project_first_stage

    x = np.clip(np.asarray(z[: inst.n1], np.float64),
                np.asarray(inst.arrays.lb1, np.float64),
                np.asarray(inst.arrays.ub1, np.float64))
    x, proj_dist = project_first_stage(inst.arrays, x)
    info = {
        "x_bar": np.asarray(x_bar),
        "incumbents": [np.asarray(s.x_incumbent) for s in states],
        "projection_distance": proj_dist,
        **{k: np.asarray(v) for k, v in stats.items()},
    }
    return x, info
