"""Host-side (exact) stage-LP solve + Monte-Carlo evaluation.

Behavioral port of record: src/smps/smps_routines.jl (``solve_problem!``
:50-62, ``evaluate`` :67-82). The reference round-trips through
JuMP -> MOI -> GLPK/CPLEX; here the host backend is scipy.linprog (HiGHS).
This path is the cross-validation oracle for the on-device batched PDHG
kernel (sqlp_tpu/ops/pdhg.py) — the same role the external solver objective
plays for ``eval_dual`` in the reference tests (test/sd_test.jl:62-65).

Dual sign convention matches JuMP's for MIN problems: the dual of a
constraint is d(objective)/d(rhs), so duals of '>=' rows are >= 0 and duals
of '<=' rows are <= 0. The golden subgradient test (test/sgd_example.jl:28,
beta = -T' pi) pins this convention.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.optimize

from sqlp_tpu.models.stage import (SENSE_E, SENSE_G, SENSE_L, StageLP,
                                   instantiate)
from sqlp_tpu.models.smps_sto import Scenario, StoData, sample_scenario


def solve_lp_host(c: np.ndarray, A: np.ndarray, rhs: np.ndarray,
                  senses: np.ndarray, lb: np.ndarray, ub: np.ndarray
                  ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Solve min c@y s.t. A y {sense} rhs, lb <= y <= ub via HiGHS.

    Returns (objective, y, duals) with duals in the d(obj)/d(rhs)
    convention described in the module docstring.
    """
    m = len(rhs)
    g = senses == SENSE_G
    l = senses == SENSE_L
    e = senses == SENSE_E
    # '<=' block: L rows as-is, G rows negated.
    A_ub = np.concatenate([A[l], -A[g]], axis=0) if (l.any() or g.any()) else None
    b_ub = np.concatenate([rhs[l], -rhs[g]]) if A_ub is not None else None
    A_eq = A[e] if e.any() else None
    b_eq = rhs[e] if A_eq is not None else None
    bounds = list(zip(
        [v if np.isfinite(v) else None for v in lb],
        [v if np.isfinite(v) else None for v in ub],
    ))
    res = scipy.optimize.linprog(
        c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq, bounds=bounds,
        method="highs")
    if res.status != 0:
        raise RuntimeError(f"Failed to solve subproblem: {res.message}")
    duals = np.zeros(m, dtype=np.float64)
    if A_ub is not None:
        mu = np.asarray(res.ineqlin.marginals, dtype=np.float64)
        n_l = int(l.sum())
        # L rows: d obj/d rhs = marginal; G rows: rhs enters negated.
        duals[l] = mu[:n_l]
        duals[g] = -mu[n_l:]
    if A_eq is not None:
        duals[e] = np.asarray(res.eqlin.marginals, dtype=np.float64)
    return float(res.fun), np.asarray(res.x, dtype=np.float64), duals


def solve_problem(sp: StageLP, last_stage_val: np.ndarray,
                  scenario: Scenario
                  ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Solve the stage LP with last-stage vars fixed (smps_routines.jl:50-62).

    Returns (obj, y_opt, dual_opt); dual_opt are duals of the stage
    constraint rows only (bound duals are not returned, matching the
    reference's cut math assumption, src/sd_algorithm/subprob.jl:17-27).
    """
    inst = instantiate(sp, scenario)
    x = np.asarray(last_stage_val, dtype=np.float64)
    h = inst.rhs - inst.T @ x
    return solve_lp_host(inst.c, inst.W, h, inst.senses, inst.lb, inst.ub)


def evaluate_host(sp1: StageLP, sp2: StageLP, sto: StoData, x: np.ndarray,
                  n_samples: int = 10_000,
                  rng: Optional[np.random.Generator] = None) -> float:
    """Monte-Carlo upper-bound estimate at x (smps_routines.jl:67-82).

    Serial host path; the batched on-device estimator lives in
    sqlp_tpu/sd/evaluate.py.
    """
    rng = rng or np.random.default_rng(0)
    x = np.asarray(x, dtype=np.float64)
    s1_cost = float(sp1.c @ x)
    s2_cost = 0.0
    for _ in range(n_samples):
        scenario = sample_scenario(rng, sto)
        obj, _, _ = solve_problem(sp2, x, scenario)
        s2_cost += obj / n_samples
    return s1_cost + s2_cost
