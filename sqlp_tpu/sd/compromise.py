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
from typing import Sequence, Tuple

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


def polish_decision(arrays, scenario_model, prep_sub, config, x0,
                    obj_scale: float = 1.0, n_scenarios: int = 8192,
                    rounds: int = 12, rho: float = 1.0, seed: int = 4242,
                    sampling: str = "stratified", qp_config=None,
                    values_fn=None):
    """Proximal-bundle polish of a first-stage decision on a fixed fresh
    scenario panel.

    The compromise decision aggregates the replications' cut models; its
    true cost still sits noticeably above the optimum on hard instances
    (ssn: ~9.96-9.99 vs ~9.90). This routine treats decision improvement
    as a direct SAA solve warmed at x0: draw one variance-reduced panel,
    and iterate (evaluate panel -> aggregate exact cut -> proximal
    master step toward the best-so-far point). Any first-stage-feasible
    x is a valid decision, so no validity machinery is needed — but the
    FINAL upper-bound estimate must come from an INDEPENDENT sample
    (evaluate_ci with a different seed), or selection bias contaminates
    it.

    ``values_fn`` (e.g. ``SDSolver._recourse_objs``; called as
    ``values_fn(H, obj0=..., valid0=...)`` so the round's own solve is
    reused) supplies certified per-element recourse objectives for the
    serious-step test; without
    it the raw kernel objectives are used, and the few uncertified
    elements' inflated values were measured to swamp the per-step
    objective differences entirely (ssn: a 1e-3-norm x move "changed"
    the panel mean by 0.06 — all of it uncertified-element noise).

    Arguments mirror the driver's scaled internals (``SDSolver.arrays``,
    ``.prep_sub``, ``.config``); x is never scaled. Returns
    (x_best, info) with info holding the per-round exact-sample values
    (unscaled) and the serious-step trace.
    """
    import jax
    import jax.numpy as jnp

    from sqlp_tpu.config import QPConfig
    from sqlp_tpu.models.routines import project_first_stage
    from sqlp_tpu.models.scenario import sample_deltas
    from sqlp_tpu.ops.pdhg import solve_batch
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    assert not scenario_model.has_cost, \
        "random-cost instances need per-scenario objectives here"
    prec = jax.lax.Precision.HIGHEST
    dt = np.asarray(arrays.c).dtype
    c64 = np.asarray(arrays.c, np.float64)
    r64 = np.asarray(arrays.r, np.float64)
    T64 = np.asarray(arrays.T, np.float64)
    A1 = np.asarray(arrays.A1, np.float64)
    b1 = np.asarray(arrays.b1, np.float64)
    senses1 = np.asarray(arrays.senses1)
    lb1 = np.asarray(arrays.lb1, np.float64)
    ub1 = np.asarray(arrays.ub1, np.float64)
    rv_row = np.asarray(scenario_model.rv_row)
    rv_is_rhs = np.asarray(scenario_model.rv_is_rhs)
    n1 = c64.shape[0]
    m1 = b1.shape[0]

    key = jax.random.PRNGKey(seed)
    deltas = sample_deltas(key, scenario_model, n_scenarios,
                           method=sampling)
    deltas_h = np.asarray(deltas, np.float64)
    p = np.full(n_scenarios, 1.0 / n_scenarios)

    # proximal master QP: z = [x, eta]; rows = stage-1 | x bounds | cuts
    nz = n1 + 1
    n_rows = m1 + n1 + rounds
    p_diag = jnp.asarray(np.concatenate([np.full(n1, rho), [0.0]]), dt)
    is_eq = jnp.asarray(np.concatenate([senses1 == 0,
                                        np.zeros(n_rows - m1, bool)]))
    A_q = np.zeros((n_rows, nz))
    l_q = np.full(n_rows, -np.inf)
    u_q = np.full(n_rows, np.inf)
    A_q[:m1, :n1] = A1
    l_q[:m1] = np.where(senses1 == -1, -np.inf, b1)
    u_q[:m1] = np.where(senses1 == 1, np.inf, b1)
    A_q[m1:m1 + n1, :n1] = np.eye(n1)
    l_q[m1:m1 + n1] = lb1
    u_q[m1:m1 + n1] = ub1

    if qp_config is None:
        # the one-shot generous config, NOT the SD master's stall-capped
        # override: this master must actually reach its prox-regularized
        # optimum or the step direction is noise
        qp_config = QPConfig()
    x = np.asarray(x0, np.float64)
    x_best = x.copy()
    f_best = np.inf
    values = []
    serious = []
    steps = []
    Y0 = L0 = None
    for k in range(rounds):
        H = _scenario_rhs(arrays, scenario_model,
                          jnp.asarray(deltas, dt), jnp.asarray(x, dt))
        obj, Y, Pi, stats = solve_batch(prep_sub, H, config.pdhg,
                                        Y0=Y0, L0=L0)
        Y0, L0 = Y, Pi
        if values_fn is not None:
            # reuse this round's solve: values_fn only runs the
            # escalation ladder on the uncertified residue instead of
            # re-solving the whole panel (it was measured doubling the
            # dominant per-round cost)
            vals = values_fn(H, obj0=obj, valid0=stats["pdhg_valid"])
        else:
            vals = np.asarray(obj, np.float64)
        f_x = float(c64 @ x + p @ vals)
        values.append(f_x * obj_scale)
        if f_x < f_best:
            f_best, x_best = f_x, x.copy()
            serious.append(k)
        # aggregate exact cut at x (host f64; RHS-only instances)
        Pi_h = np.asarray(Pi, np.float64)
        pi_rows = Pi_h[:, rv_row]
        rhs_d = np.where(rv_is_rhs[None, :], deltas_h, 0.0)
        alpha = p @ (Pi_h @ r64) + np.sum(p[:, None] * rhs_d * pi_rows)
        beta = -(T64.T @ (p @ Pi_h))
        A_q[m1 + n1 + k, :n1] = -beta
        A_q[m1 + n1 + k, n1] = 1.0
        l_q[m1 + n1 + k] = alpha
        # proximal master step toward the best point
        g = np.concatenate([c64 - rho * x_best, [1.0]])
        z, _, qstats = solve_qp(jnp.asarray(p_diag), jnp.asarray(g, dt),
                                jnp.asarray(A_q, dt), jnp.asarray(l_q, dt),
                                jnp.asarray(u_q, dt), is_eq, qp_config)
        x = np.clip(np.asarray(z, np.float64)[:n1], lb1, ub1)
        x, _ = project_first_stage(arrays, x)
        steps.append(float(np.linalg.norm(x - x_best)))
    info = {"values": values, "serious_steps": serious,
            "step_norms": steps, "f_best": f_best * obj_scale}
    return x_best, info
