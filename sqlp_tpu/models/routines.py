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


def project_first_stage(arrays, x0: np.ndarray, tol: float = 1e-7
                        ) -> Tuple[np.ndarray, float]:
    """Project x0 onto the first-stage feasible set {A1 x {senses} b1,
    lb1 <= x <= ub1} in the 1-norm (one host LP).

    The SD incumbent test compares cut-model estimates that ignore
    first-stage feasibility (check_improvement, src/sd_algorithm/
    improvement.jl:19-49), so an infeasible start x0 can pin the incumbent
    forever: its fictitiously low estimate is unbeatable by any feasible
    candidate (observed on storm with x0=0, whose 185 first-stage rows
    exclude 0; the reference only avoids this by crash-starting and its
    ``check_first_stage_feasible`` helper, src/prob.jl:20-32, is never
    called by the drivers).

    Returns (x_projected, distance). distance == 0.0 when x0 was feasible.
    """
    c_dt = np.float64
    x0 = np.asarray(x0, c_dt)
    b1 = np.asarray(arrays.b1, c_dt)
    n1 = x0.shape[0]
    A1 = np.asarray(arrays.A1, c_dt) if b1.size else np.zeros((0, n1))
    senses1 = np.asarray(arrays.senses1)
    lb1 = np.asarray(arrays.lb1, c_dt)
    ub1 = np.asarray(arrays.ub1, c_dt)

    # feasibility check first
    r = A1 @ x0 - b1 if b1.size else np.zeros(0)
    viol = np.concatenate([
        np.abs(r[senses1 == SENSE_E]) if b1.size else np.zeros(0),
        np.maximum(-r[senses1 == SENSE_G], 0.0) if b1.size else np.zeros(0),
        np.maximum(r[senses1 == SENSE_L], 0.0) if b1.size else np.zeros(0),
        np.maximum(lb1 - x0, 0.0),
        np.maximum(x0 - ub1, 0.0),
    ])
    scale = 1.0 + np.abs(b1).max(initial=0.0) + np.abs(x0).max(initial=0.0)
    if viol.size == 0 or viol.max(initial=0.0) <= tol * scale:
        return x0, 0.0

    # min 1'u  s.t.  u >= x - x0, u >= x0 - x, A1 x {senses} b1, bounds
    g = senses1 == SENSE_G
    l = senses1 == SENSE_L
    e = senses1 == SENSE_E
    I = np.eye(n1)
    A_ub_rows = [np.concatenate([I, -I], axis=1),      # x - u <= x0
                 np.concatenate([-I, -I], axis=1)]     # -x - u <= -x0
    b_ub_rows = [x0, -x0]
    if l.any():
        A_ub_rows.append(np.concatenate([A1[l], np.zeros((l.sum(), n1))],
                                        axis=1))
        b_ub_rows.append(b1[l])
    if g.any():
        A_ub_rows.append(np.concatenate([-A1[g], np.zeros((g.sum(), n1))],
                                        axis=1))
        b_ub_rows.append(-b1[g])
    A_ub = np.concatenate(A_ub_rows, axis=0)
    b_ub = np.concatenate(b_ub_rows)
    A_eq = np.concatenate([A1[e], np.zeros((e.sum(), n1))], axis=1) \
        if e.any() else None
    b_eq = b1[e] if A_eq is not None else None
    obj = np.concatenate([np.zeros(n1), np.ones(n1)])
    bounds = [(lo if np.isfinite(lo) else None, hi if np.isfinite(hi) else None)
              for lo, hi in zip(lb1, ub1)] + [(0.0, None)] * n1
    res = scipy.optimize.linprog(obj, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq,
                                 b_eq=b_eq, bounds=bounds, method="highs")
    if res.status != 0:
        raise RuntimeError(
            f"first-stage projection LP failed (status {res.status}: "
            f"{res.message}); the first stage may be infeasible")
    return np.asarray(res.x[:n1], c_dt), float(res.fun)


def recourse_lower_bound(arrays, scenario_model, normal_sigmas: float = 10.0
                         ) -> float:
    """Provably valid lower bound on the per-scenario recourse Q(x, xi).

    The reference takes the epigraph lower bound as a user constant
    (sdEpigraph ctor, src/sd_algorithm/epigraph.jl:52-61) and blends it
    into every stored cut as (1-d)*lb (epigraph.jl:105-106). SD theory
    requires lb <= Q(x, xi) for every master-feasible x and every scenario
    xi: a too-high lb makes every decayed cut overestimate the recourse
    and SD converges to the wrong point (observed on baa99-20, whose
    reference driver passes lb=-500000 while Q dips below -860000 near
    the optimum).

    Here the bound is computed, not guessed: one exact host LP

        min  q'y   s.t.  A1 x {senses1} b1,  W y + T x - S eta {senses2} r,
                         lb1<=x<=ub1, lb2<=y<=ub2, eta in support box,

    where eta_k ranges over each random position's support (discrete:
    [min,max] outcome; uniform: [a,b]; normal: mean +- normal_sigmas*sigma
    — the device sampler is inverse-CDF so draws beyond ~6 sigma cannot
    occur in float32) and S scatters positions to rows. Minimizing jointly
    over x and eta lower-bounds Q at every feasible (x, scenario) pair.
    Transfer-matrix positions contribute the bilinear term -delta*x[j],
    bounded by its box corners (needs finite x bounds).

    Returns -inf (with a warning) when no finite bound exists (unbounded
    recourse over the box, or T-randomness with unbounded x).
    """
    import warnings

    m = scenario_model
    c_dt = np.float64
    q = np.asarray(arrays.q, c_dt)
    W = np.asarray(arrays.W, c_dt)
    T = np.asarray(arrays.T, c_dt)
    r = np.asarray(arrays.r, c_dt)
    b1 = np.asarray(arrays.b1, c_dt)
    A1 = np.asarray(arrays.A1, c_dt) if b1.size else np.zeros((0, T.shape[1]))
    senses1 = np.asarray(arrays.senses1)
    senses2 = np.asarray(arrays.senses2)
    lb1 = np.asarray(arrays.lb1, c_dt)
    ub1 = np.asarray(arrays.ub1, c_dt)
    lb2 = np.asarray(arrays.lb2, c_dt)
    ub2 = np.asarray(arrays.ub2, c_dt)
    m1, n1 = A1.shape
    m2, n2 = W.shape

    # per-position support bounds of the raw value
    from sqlp_tpu.models.scenario import DIST_DISCRETE, DIST_NORMAL
    dist = np.asarray(m.dist_type)
    values = np.asarray(m.values, c_dt)
    mean = np.asarray(m.mean, c_dt)
    std = np.asarray(m.std, c_dt)
    left = np.asarray(m.left, c_dt)
    width = np.asarray(m.width, c_dt)
    v_lo = np.where(dist == DIST_DISCRETE, values.min(axis=1),
                    np.where(dist == DIST_NORMAL,
                             mean - normal_sigmas * std, left))
    v_hi = np.where(dist == DIST_DISCRETE, values.max(axis=1),
                    np.where(dist == DIST_NORMAL,
                             mean + normal_sigmas * std, left + width))
    base = np.asarray(m.base, c_dt)
    is_rhs = np.asarray(m.rv_is_rhs)
    is_cost = np.asarray(m.rv_is_cost)
    rv_col = np.asarray(m.rv_col)
    d_lo, d_hi = v_lo - base, v_hi - base            # delta box
    # effective per-row contribution bounds eta_k
    e_lo, e_hi = d_lo.copy(), d_hi.copy()

    # Random COST positions (reference TODO 6): q_j y_j with q_j ranging
    # over [v_lo, v_hi] is lower-bounded by a LINEAR term when the sign of
    # y_j is fixed by its bounds — q_lo y (y >= 0) / q_hi y (y <= 0); a
    # sign-spanning y with a finite box contributes the constant corner
    # minimum instead (its q term drops to 0). These positions carry no
    # eta variable.
    const_term = 0.0
    q = q.copy()
    if is_cost.any():
        rv_ycol = np.asarray(m.rv_ycol)
        for k in np.nonzero(is_cost)[0]:
            j = int(rv_ycol[k])
            e_lo[k] = e_hi[k] = 0.0
            if lb2[j] >= 0.0:
                q[j] = min(q[j], v_lo[k])
            elif np.isfinite(ub2[j]) and ub2[j] <= 0.0:
                q[j] = max(q[j], v_hi[k])            # y <= 0: min is q_hi y
            elif np.isfinite(lb2[j]) and np.isfinite(ub2[j]):
                corners = [v_lo[k] * lb2[j], v_lo[k] * ub2[j],
                           v_hi[k] * lb2[j], v_hi[k] * ub2[j]]
                const_term += min(corners)
                q[j] = 0.0
            else:
                warnings.warn(
                    "recourse_lower_bound: random cost on a sign-spanning "
                    "unbounded column — no finite bound; supply an "
                    "explicit epigraph lower bound")
                return float("-inf")

    tpos = ~is_rhs & ~is_cost
    if tpos.any():
        xl, xu = lb1[rv_col[tpos]].copy(), ub1[rv_col[tpos]].copy()
        # When the box on x is infinite, the first-stage POLYTOPE may still
        # bound it (master-feasible candidates always satisfy A1 x senses b1;
        # the driver projects x0 onto it too). Tighten each needed column
        # with two tiny implied-bound LPs before giving up.
        need = ~(np.isfinite(xl) & np.isfinite(xu))
        if need.any():
            m1_, n1_ = A1.shape
            g1 = senses1 == SENSE_G
            l1 = senses1 == SENSE_L
            e1 = senses1 == SENSE_E
            A1_ub = (np.concatenate([A1[l1], -A1[g1]], axis=0)
                     if (l1.any() or g1.any()) else None)
            b1_ub = (np.concatenate([b1[l1], -b1[g1]])
                     if A1_ub is not None else None)
            A1_eq = A1[e1] if e1.any() else None
            b1_eq = b1[e1] if A1_eq is not None else None
            x_bounds = list(zip(
                [v if np.isfinite(v) else None for v in lb1],
                [v if np.isfinite(v) else None for v in ub1]))
            for idx in np.nonzero(need)[0]:
                j = rv_col[tpos][idx]
                obj_j = np.zeros(n1_)
                obj_j[j] = 1.0
                for sign, tgt in ((1.0, xl), (-1.0, xu)):
                    res = scipy.optimize.linprog(
                        sign * obj_j, A_ub=A1_ub, b_ub=b1_ub, A_eq=A1_eq,
                        b_eq=b1_eq, bounds=x_bounds, method="highs")
                    if res.status == 0:
                        tgt[idx] = sign * res.fun
        if not (np.isfinite(xl).all() and np.isfinite(xu).all()):
            warnings.warn("recourse_lower_bound: transfer-matrix randomness "
                          "with x unbounded even over the first-stage "
                          "polytope — no finite bound; supply an explicit "
                          "epigraph lower bound")
            return float("-inf")
        corners = np.stack([-d_lo[tpos] * xl, -d_lo[tpos] * xu,
                            -d_hi[tpos] * xl, -d_hi[tpos] * xu])
        e_lo[tpos] = corners.min(axis=0)
        e_hi[tpos] = corners.max(axis=0)

    R = dist.shape[0]
    S = np.zeros((m2, R))
    S[np.asarray(m.rv_row), np.arange(R)] = 1.0
    S[:, is_cost] = 0.0        # cost positions patch q, not a row

    # stacked LP over z = (x, y, eta)
    A = np.zeros((m1 + m2, n1 + n2 + R))
    if m1:
        A[:m1, :n1] = A1
    A[m1:, :n1] = T
    A[m1:, n1:n1 + n2] = W
    A[m1:, n1 + n2:] = -S
    senses = np.concatenate([senses1, senses2])
    rhs = np.concatenate([b1, r])
    obj = np.concatenate([np.zeros(n1), q, np.zeros(R)])
    lo = np.concatenate([lb1, lb2, e_lo])
    hi = np.concatenate([ub1, ub2, e_hi])

    g = senses == SENSE_G
    l = senses == SENSE_L
    e = senses == SENSE_E
    A_ub = np.concatenate([A[l], -A[g]], axis=0) if (l.any() or g.any()) else None
    b_ub = np.concatenate([rhs[l], -rhs[g]]) if A_ub is not None else None
    A_eq = A[e] if e.any() else None
    b_eq = rhs[e] if A_eq is not None else None
    bounds = list(zip([v if np.isfinite(v) else None for v in lo],
                      [v if np.isfinite(v) else None for v in hi]))
    res = scipy.optimize.linprog(obj, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq,
                                 b_eq=b_eq, bounds=bounds, method="highs")
    if res.status != 0:
        warnings.warn(f"recourse_lower_bound LP did not solve "
                      f"(status {res.status}: {res.message}); supply an "
                      f"explicit epigraph lower bound")
        return float("-inf")
    return float(res.fun) + const_term


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


def oracle_solve_batch(prep, H, config=None, Y0=None, L0=None, Q=None):
    """Drop-in exact replacement for ``ops.pdhg.solve_batch``.

    Solves every RHS panel row with the host HiGHS solver through
    ``jax.pure_callback`` — the moral equivalent of the reference's
    JuMP -> CPLEX round-trip (smps_routines.jl:50-62), usable inside the
    jitted SD step by monkeypatching ``sqlp_tpu.sd.algorithm.solve_batch``.
    Exists for parity testing: a B=1 trajectory driven by exact simplex
    duals isolates the SD semantics from first-order solver tolerance
    (VERDICT r1 item 7). Slow by construction; never use in production.

    The original-problem data is reconstructed from the PreparedLP scaling
    (K = diag(row_scale) (flip * W) diag(col_scale), q/lb/ub col-scaled).
    """
    import jax
    import jax.numpy as jnp

    from sqlp_tpu.models.stage import SENSE_E, SENSE_G, SENSE_L

    B, m = H.shape
    n = prep.n
    dt = prep.K.dtype

    def host(Hn, Qn, K, qs, lbs, ubs, is_eq, flip, rs, cs):
        # unscale back to the original stage LP (prep leaves arrive as
        # concrete values at callback time, never at trace time)
        Hn = np.asarray(Hn, np.float64)
        W = (np.asarray(K, np.float64) / np.asarray(rs)[:, None]
             / np.asarray(cs)[None, :] * np.asarray(flip)[:, None])
        q = np.asarray(qs, np.float64) / np.asarray(cs)
        lb = np.asarray(lbs, np.float64) * np.asarray(cs)
        ub = np.asarray(ubs, np.float64) * np.asarray(cs)
        senses = np.where(np.asarray(is_eq), SENSE_E,
                          np.where(np.asarray(flip) < 0, SENSE_L, SENSE_G))
        Qn = None if Qn.shape[-1] == 0 else np.asarray(Qn, np.float64)
        objs = np.zeros(B, np.float64)
        Y = np.zeros((B, n), np.float64)
        Pi = np.zeros((B, m), np.float64)
        for b in range(B):
            objs[b], Y[b], Pi[b] = solve_lp_host(
                q if Qn is None else Qn[b], W, Hn[b], senses, lb, ub)
        return (objs.astype(dt), Y.astype(dt), Pi.astype(dt))

    out_shapes = (jax.ShapeDtypeStruct((B,), dt),
                  jax.ShapeDtypeStruct((B, n), dt),
                  jax.ShapeDtypeStruct((B, m), dt))
    # Q (per-element objective, random-cost instances) rides through as a
    # [B, 0] sentinel when absent — pure_callback args must be arrays
    Qc = jnp.zeros((B, 0), dt) if Q is None else Q.astype(dt)
    obj, Y, Pi = jax.pure_callback(
        host, out_shapes, H, Qc, prep.K, prep.q, prep.lb, prep.ub,
        prep.is_eq, prep.flip, prep.row_scale, prep.col_scale)

    zero_i = jnp.zeros((), jnp.int32)
    stats = {
        "pdhg_rounds": zero_i,
        "pdhg_phase_rounds": jnp.zeros((1,), jnp.int32),
        "pdhg_iters": zero_i,
        "pdhg_err_max": jnp.zeros((), dt),
        "pdhg_converged": jnp.asarray(True),
        "pdhg_omega": jnp.ones((), dt),
        "pdhg_done": jnp.ones((B,), bool),
        "pdhg_valid": jnp.ones((B,), bool),
        "pdhg_err": jnp.zeros((B,), dt),
    }
    return obj, Y, Pi, stats
