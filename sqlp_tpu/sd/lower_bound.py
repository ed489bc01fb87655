"""Certified lower bounds for SD solutions.

The reference's drivers print the candidate's cut-model estimate as the
"lb" (test/instance_test/sd_single_cut_test.jl:71-77). That number is a
proxy, not a bound: it evaluates the cut model at one point, moves with
every new cut, and can sit ABOVE the true optimum early in a run
(RESULTS.md: newsvendor 1.04 after 200 iterations vs the exact 1.0).

This module provides the statistically valid route (the standard SD/SAA
argument; Higle & Sen's stopping theory is the model). Per replication,
a DETERMINISTIC lower bound on its sample-average optimum v_N:

1. ``cut_model_min`` — the exact minimum of a valid cut model over the
   first-stage polytope, solved on the host by HiGHS in f64. Validity of
   the SD run's own cuts: a cut built at stream position k satisfies
   cut_k(x) <= (1/k) sum_{s<=k} Q(x, xi_s), and the weight-mark discount
   d = mark/total with the (1-d)*lb blending
   (src/sd_algorithm/epigraph.jl:101-117) extends that to the full
   stream because lb <= Q(x, xi) everywhere; the incumbent cut is
   rebuilt at full weight; the per-epigraph lower bound is itself a
   computed valid recourse bound (models/routines.py). Hence
   min_x c@x + sum_e w_e max(cuts_e, inc_e, lb_e) <= v_N. Tightness is
   the problem — the SD model is only tight near its iterates.

2. ``saa_polish`` — a level-bundle method that tightens the model with
   full-stream average cuts before taking the minimum (monotone, stop
   any time). Converges in a few rounds on small instances; slow tail
   on high-dimensional ones (ssn).

3. ``saa_ef_bound`` — THE TIGHT ROUTE: solve each replication's
   sample-average extensive form with the structured batched PDHG
   solver (models/crash.py) and build ONE aggregate cut from its
   per-scenario duals. By LP duality the single-cut model minimum
   equals v_N minus the solve's duality gap. Certification streams can
   be the SD run's own draws or fresh variance-reduced (Latin
   hypercube) samples — stratified averages stay unbiased for every
   fixed x, so the bound argument is unchanged while v_N concentrates.

Then ``t_lower_bound`` / ``certified_lower_bound``: R independent
replications give i.i.d. lb_r <= v_N^(r); unbiased-per-x sampling gives
E[v_N] <= v* (E[min] <= min E, requiring the epigraph weights to sum to
1), so mean(lb_r) - t_{R-1,conf} * std/sqrt(R) is a (conf)-level
confidence lower bound on the true optimum v*.

Validity caveats (checked and warned about at runtime):
  * the scenario reservoir must not have overflowed (state.scen_dropped
    == 0) when the SD run's own cuts enter the model: past saturation
    they average a uniform SUBSAMPLE of the stream;
  * scenario weights must be 1 (plain i.i.d./stratified sampling, no
    importance sampling): the self-normalized IS ratio estimator is
    biased, which breaks E[min] <= min E;
  * first-order duals are epsilon-feasible, not exactly feasible like
    the reference's simplex duals: each cut can over-estimate by
    O(residual * scale). The EF certificates' worst per-scenario
    reduced-cost violation is measured and returned
    (``dual_infeas_per_rep``; the off-TPU f64 refinement pass drives it
    to ~1e-6), and grossly unconverged certificates (> 5e-2 relative —
    an order of magnitude above healthy runs) are REJECTED rather than
    reported.
"""

from __future__ import annotations

import math
import warnings
from typing import Dict, Optional, Sequence

import numpy as np
import scipy.optimize


def _np64(a) -> np.ndarray:
    from sqlp_tpu.parallel.mesh import to_host
    return np.asarray(to_host(a), np.float64)


def cut_model_min(arrays, espec, state, obj_scale: float = 1.0,
                  check_validity: bool = True,
                  extra_cuts: Optional[Sequence] = None,
                  include_state_cuts: bool = True,
                  return_x: bool = False):
    """Exact minimum of the cut model over the first-stage polytope.

        min_x  c@x + sum_e w_e eta_e
        s.t.   A1 x {senses1} b1,  lb1 <= x <= ub1,
               eta_e >= d alpha + (1-d) lb_e + d beta@x   (live cuts)
               eta_e >= alpha_inc + beta_inc@x            (incumbent cut)
               eta_e >= lb_e

    solved on the host by HiGHS in f64 (scipy.optimize.linprog). The
    arguments are the solver's SCALED arrays/espec/state when objective
    normalization is active; ``obj_scale`` unscales the returned value.

    ``extra_cuts``: optional additional FULL-WEIGHT cuts per epigraph,
    ``[(e, alpha, beta), ...]`` in scaled units — the SAA-polish cuts
    (:func:`saa_polish`) enter the model through this.
    ``include_state_cuts=False`` drops the SD run's own cut pool and
    incumbent cuts from the model (keeping stage-1 rows, eta >= lb_e,
    and the extra cuts): required when the extra cuts certify an
    EXTENDED scenario stream the SD cuts are not valid for.

    Returns the unscaled optimal value — a deterministic lower bound on
    the replication's SAA optimum (module docstring) — or, with
    ``return_x``, the tuple (value, x, eta) in scaled units.
    """
    c = _np64(arrays.c)
    A1 = _np64(arrays.A1)
    b1 = _np64(arrays.b1)
    senses1 = np.asarray(arrays.senses1)
    lb1 = _np64(arrays.lb1)
    ub1 = _np64(arrays.ub1)
    w = _np64(espec.obj_weight)
    lb_e = _np64(espec.lower_bound)
    n1 = c.shape[0]
    E = w.shape[0]

    if check_validity:
        if int(np.asarray(state.scen_dropped)) != 0:
            warnings.warn(
                "scenario reservoir overflowed during this run "
                f"(scen_dropped={int(np.asarray(state.scen_dropped))}); "
                "post-saturation cuts average a subsample of the stream, "
                "so the cut-model minimum is no longer a strict bound on "
                "the stream's SAA optimum")
        sw = _np64(state.scen_weights)
        ns = np.asarray(state.n_scen)
        live_w = np.concatenate(
            [sw[e, :int(ns[e])] for e in range(E)]) if ns.sum() else \
            np.ones(0)
        if live_w.size and not np.allclose(live_w, 1.0, atol=1e-9):
            warnings.warn(
                "non-unit scenario weights (importance sampling?): the "
                "SAA inequality E[min] <= min E needs unbiased sample "
                "averages; the certified-bound claim does not cover "
                "self-normalized IS streams")
        if not math.isclose(float(w.sum()), 1.0, rel_tol=1e-6):
            warnings.warn(
                f"epigraph weights sum to {float(w.sum()):.6g} != 1; the "
                "cut-model minimum bounds sum_e w_e E[Q], not E[Q]")

    cut_alpha = _np64(state.cut_alpha)          # [E, K]
    cut_beta = _np64(state.cut_beta)            # [E, K, n1]
    cut_mark = _np64(state.cut_mark)
    cut_live = np.asarray(state.cut_live)
    total_w = np.maximum(_np64(state.total_weight), 1e-30)
    inc_alpha = _np64(state.inc_alpha)
    inc_beta = _np64(state.inc_beta)
    inc_valid = np.asarray(state.inc_valid)

    # variables z = [x (n1); eta (E)]
    obj = np.concatenate([c, w])
    rows_ub, rhs_ub = [], []
    rows_eq, rhs_eq = [], []
    zpad = np.zeros(E)
    for i in range(A1.shape[0]):
        row = np.concatenate([A1[i], zpad])
        if senses1[i] == 0:                      # '=='
            rows_eq.append(row)
            rhs_eq.append(b1[i])
        elif senses1[i] == 1:                    # '>=' -> negate
            rows_ub.append(-row)
            rhs_ub.append(-b1[i])
        else:                                    # '<='
            rows_ub.append(row)
            rhs_ub.append(b1[i])
    for e in range(E if include_state_cuts else 0):
        d = cut_mark[e] / total_w[e]
        for k in range(cut_alpha.shape[1]):
            if not cut_live[e, k]:
                continue
            # eta_e >= d alpha + (1-d) lb + d beta@x
            row = np.concatenate([d[k] * cut_beta[e, k], zpad])
            row[n1 + e] = -1.0
            rows_ub.append(row)
            rhs_ub.append(-(d[k] * cut_alpha[e, k]
                            + (1.0 - d[k]) * lb_e[e]))
        if inc_valid[e]:
            row = np.concatenate([inc_beta[e], zpad])
            row[n1 + e] = -1.0
            rows_ub.append(row)
            rhs_ub.append(-inc_alpha[e])
    for (e, alpha, beta) in (extra_cuts or ()):
        row = np.concatenate([np.asarray(beta, np.float64), zpad])
        row[n1 + int(e)] = -1.0
        rows_ub.append(row)
        rhs_ub.append(-float(alpha))

    bounds = [(lo if np.isfinite(lo) else None,
               hi if np.isfinite(hi) else None)
              for lo, hi in zip(lb1, ub1)]
    bounds += [(float(lb_e[e]) if np.isfinite(lb_e[e]) else None, None)
               for e in range(E)]

    res = scipy.optimize.linprog(
        obj,
        A_ub=np.asarray(rows_ub) if rows_ub else None,
        b_ub=np.asarray(rhs_ub) if rhs_ub else None,
        A_eq=np.asarray(rows_eq) if rows_eq else None,
        b_eq=np.asarray(rhs_eq) if rows_eq else None,
        bounds=bounds, method="highs")
    if res.status != 0:
        raise RuntimeError(
            f"cut-model master LP failed ({res.message}); an unbounded "
            f"status usually means an epigraph has no live cuts and an "
            f"infinite lower bound")
    if return_x:
        return float(res.fun), res.x[:n1].copy(), res.x[n1:].copy()
    return float(res.fun) * obj_scale


def _certification_streams(states, scenario_model, R, E, N_sd,
                           extra_scenarios, fresh_scenarios, seed,
                           fresh_sampling, fresh_pairing=None,
                           r_offset=0):
    """Build the per-replication certification streams and decide whether
    the SD run's own cuts may enter the BOUND model.

    Shared by :func:`saa_polish` and :func:`saa_ef_bound` (the two copies
    had already drifted once: the reservoir-overflow guard existed only
    in one). SD cuts are admissible only when the certification stream
    IS the run's own full stream: no fresh replacement, no extension,
    and no reservoir overflow (past saturation the stored panel is a
    subsample, and cuts averaging the full stream can exceed the
    subsample's SAA optimum).
    """
    import jax
    from sqlp_tpu.models.scenario import sample_deltas

    # the admissibility decision below reads states[0] only; replications
    # are lockstep today, but states resumed from mixed checkpoints (or a
    # future per-replication stopping rule) could disagree — and silently
    # admitting invalid SD cuts for an overflowed replication would break
    # the bound. Fail loudly instead.
    drops = [int(np.asarray(s.scen_dropped)) for s in states]
    counts = [np.asarray(s.n_scen) for s in states]
    assert all((d == 0) == (drops[0] == 0) for d in drops), (
        f"replications disagree on reservoir overflow ({drops}); the "
        "SD-cut admissibility decision is shared — certify these states "
        "separately or use fresh_scenarios")
    assert all(np.array_equal(c, counts[0]) for c in counts), (
        "replications disagree on per-epigraph scenario counts; "
        "certify these states separately or use fresh_scenarios")

    if fresh_scenarios > 0:
        assert extra_scenarios == 0, \
            "fresh_scenarios replaces the stream; extra_scenarios extends it"
        key = jax.random.PRNGKey(seed)
        if fresh_pairing == "antithetic":
            # cross-replication antithetic pairing: replication 2k+1
            # certifies on the COMPLEMENT (u -> 1-u) of replication 2k's
            # stream. Each stream is identically distributed (so every
            # per-replication bound stays valid and E[pair mean] <= v*);
            # negative coupling shrinks the PAIR-MEAN spread the
            # Student-t aggregation sees. Aggregate over pair means —
            # replications within a pair are not independent.
            assert R % 2 == 0, \
                "antithetic replication pairing needs an even R"
            assert r_offset % 2 == 0, "group splits must preserve pairs"
            deltas_h = np.stack([
                np.stack([
                    np.asarray(sample_deltas(
                        jax.random.fold_in(
                            key, ((r_offset + r) // 2) * E + e),
                        scenario_model, fresh_scenarios,
                        method=fresh_sampling,
                        complement=bool((r_offset + r) % 2)), np.float64)
                    for e in range(E)])
                for r in range(R)])
        else:
            assert fresh_pairing is None, fresh_pairing
            deltas_h = np.stack([
                np.stack([
                    np.asarray(sample_deltas(
                        jax.random.fold_in(key, (r_offset + r) * E + e),
                        scenario_model,
                        fresh_scenarios, method=fresh_sampling), np.float64)
                    for e in range(E)])
                for r in range(R)])
        weights_h = np.ones(deltas_h.shape[:3])
        return deltas_h, weights_h, False
    deltas_h = np.stack([_np64(s.scen_deltas)[:, :N_sd] for s in states])
    weights_h = np.stack([_np64(s.scen_weights)[:, :N_sd] for s in states])
    include_state_cuts = (
        extra_scenarios <= 0
        and int(np.asarray(states[0].scen_dropped)) == 0)
    if extra_scenarios > 0:
        assert np.allclose(weights_h, 1.0, atol=1e-9), (
            "extended certification streams require unit scenario "
            "weights (plain i.i.d. sampling)")
        key = jax.random.PRNGKey(seed)
        extras = np.stack([
            np.stack([
                np.asarray(sample_deltas(
                    jax.random.fold_in(key, r * E + e), scenario_model,
                    extra_scenarios, method="iid"), np.float64)
                for e in range(E)])
            for r in range(R)])
        deltas_h = np.concatenate([deltas_h, extras], axis=2)
        weights_h = np.concatenate(
            [weights_h, np.ones(extras.shape[:3])], axis=2)
    return deltas_h, weights_h, include_state_cuts


def saa_polish(arrays, scenario_model, espec, prep_sub, states: Sequence,
               config, obj_scale: float = 1.0, max_rounds: int = 24,
               gap_tol: float = 1e-4, extra_scenarios: int = 0,
               seed: int = 9000, level_lambda: float = 0.3,
               qp_rows_cap: int = 64, fresh_scenarios: int = 0,
               fresh_sampling: str = "stratified",
               fresh_pairing=None) -> Dict:
    """Level-bundle polish: drive each replication's certified lower bound
    toward its SAA optimum v_N.

    The SD run's final cut model is only tight near its iterates — its
    exact minimum can sit far below v_N, and plain Kelley iteration
    (evaluate at the model argmin) stalls in high first-stage dimension:
    the argmin flies to uncovered corners of the polytope where the SAA
    value is terrible (measured on ssn, n1=89: relative gap ~0.95 after
    24 Kelley rounds). This routine is a stabilized bundle instead
    (level method, Lemarechal-Nemirovskii-Nesterov, with a Kelley
    companion point):

      round 1   evaluate at the replication's incumbent (strong first
                cut + finite upper bound);
      round k   lb_r = exact model minimum (host HiGHS f64 — the VALID
                bound, monotone); evaluate TWO points per replication:
                the projection of the previous point onto the level set
                {model <= lb + level_lambda*(ub - lb)} (an R-batched
                on-device ADMM QP whose model includes the SD run's own
                cut pool — projections are only evaluation points, so
                using the richer model is free) AND the model argmin
                itself (the Kelley point: cutting exactly where the
                bound is attained is what raises it);
      every round solves all replications' full recourse panels at all
      evaluation points in ONE batched device call and assembles the
      full-weight average cuts ON DEVICE in f64 (only the [R, P, E]
      alpha/beta/value panels come back to the host — pulling the raw
      [R*P*E*N, m2] dual panel dominated the round at large N).

    ``extra_scenarios > 0`` EXTENDS each replication's certification
    stream with that many fresh i.i.d. scenarios per epigraph (distinct
    seeds per replication). The SD run's own cuts are then dropped from
    the BOUND's model (they are valid only for the run's stream — they
    still inform the projection QP) and the bound certifies v_{N+extra}:
    larger sample, smaller SAA bias, smaller cross-replication spread
    for the Student-t aggregation. Requires unit scenario weights.

    Validity: each per-scenario dual is epsilon-feasible (elements the
    kernel could not certify fall back to the replication's best pool
    vertex — feasible by pool construction — or to ``seed_dual`` on
    random-cost instances), and the polish cuts average the FULL
    certification stream at full weight, so every reported model minimum
    under-estimates v_N. The projection QP needs no accuracy guarantees.

    Returns (bounds in unscaled objective units):
      lb_per_rep      final exact cut-model minima, one per replication
      saa_ub_per_rep  best SAA value ESTIMATE found per replication, from
                      the PDHG primal objectives at the visited points —
                      an estimate of (not a certified bound on) v_N, used
                      as the bundle's stopping signal; it is not a bound
                      on the true optimum either
      gap_per_rep     final relative bundle gap per replication
      rounds          rounds executed
      n_scenarios     certification-stream length per epigraph
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sqlp_tpu.models.routines import project_first_stage
    from sqlp_tpu.models.scenario import cost_panel, sample_deltas
    from sqlp_tpu.ops.pdhg import solve_batch
    from sqlp_tpu.ops.prox_qp import solve_qp
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    prec_hi = jax.lax.Precision.HIGHEST
    R = len(states)
    E, K = np.asarray(states[0].cut_alpha).shape
    n_scen = np.asarray(states[0].n_scen)
    for s in states:
        assert np.array_equal(np.asarray(s.n_scen), n_scen), \
            "replications must share scenario counts (same run length)"
    N_sd = int(n_scen.max())
    assert int(n_scen.min()) == N_sd, "per-epigraph scenario counts differ"

    r64 = _np64(arrays.r)
    T64 = _np64(arrays.T)
    w_e = _np64(espec.obj_weight)
    lb_e = _np64(espec.lower_bound)
    c64 = _np64(arrays.c)
    A1 = _np64(arrays.A1)
    b1 = _np64(arrays.b1)
    senses1 = np.asarray(arrays.senses1)
    lb1 = _np64(arrays.lb1)
    ub1 = _np64(arrays.ub1)
    rv_row = np.asarray(scenario_model.rv_row)
    rv_col = np.asarray(scenario_model.rv_col)
    rv_is_rhs = np.asarray(scenario_model.rv_is_rhs)
    rv_is_cost = (np.asarray(scenario_model.rv_is_cost)
                  if scenario_model.has_cost
                  else np.zeros_like(rv_is_rhs))
    n1 = c64.shape[0]
    m1 = b1.shape[0]
    m2 = r64.shape[0]

    deltas_h, weights_h, include_state_cuts = _certification_streams(
        states, scenario_model, R, E, N_sd, extra_scenarios,
        fresh_scenarios, seed, fresh_sampling, fresh_pairing)
    N = deltas_h.shape[2]
    p_h = weights_h / np.maximum(
        weights_h.sum(axis=2, keepdims=True), 1e-30)   # [R, E, N]
    dt = np.asarray(arrays.c).dtype
    deltas_d = jnp.asarray(deltas_h, dt)               # [R, E, N, Rv]
    p_d = jnp.asarray(p_h, jnp.float64)

    # per-replication live pools for the epsilon-feasible dual fallback
    pools_d = jnp.stack([jnp.asarray(np.asarray(s.duals)) for s in states])
    npool_d = jnp.asarray([max(int(np.asarray(s.n_duals)), 1)
                           for s in states])
    has_cost = scenario_model.has_cost
    seed_d = (jnp.asarray(scenario_model.seed_dual) if has_cost else None)

    rhs_fn = jax.jit(lambda d, x: _scenario_rhs(
        arrays, scenario_model, d, x))

    # ---- on-device f64 cut assembly (alpha/beta/value per point) -------
    rv_row_d = jnp.asarray(rv_row)
    rv_col_d = jnp.asarray(rv_col)
    rhs_mask = jnp.asarray(rv_is_rhs)
    tr_mask = jnp.asarray(~(rv_is_rhs | rv_is_cost.astype(bool)))
    r_d64 = jnp.asarray(r64)
    T_d64 = jnp.asarray(T64)
    fp = _feasproj_consts(arrays)
    lb2_64 = _np64(arrays.lb2)
    ub2_64 = _np64(arrays.ub2)
    lb_ok_d = jnp.asarray(np.isfinite(lb2_64))
    ub_ok_d = jnp.asarray(np.isfinite(ub2_64))
    lbf_d = jnp.asarray(np.where(np.isfinite(lb2_64), lb2_64, 0.0))
    ubf_d = jnp.asarray(np.where(np.isfinite(ub2_64), ub2_64, 0.0))
    qn_pol = float(1.0 + np.abs(_np64(arrays.q)).max())

    @jax.jit
    def assemble(Pi, valid, obj, H, deltas, p, pool, npool, Q_el, cap):
        """One replication, P evaluation points.

        Pi/H: [P*E*N, m2]; valid/obj: [P*E*N]; deltas: [E, N, Rv];
        p: [E, N] f64; Q_el: [P*E*N, n2] per-element objective (random-
        cost instances) or a [1, 1] dummy; cap: [n2] correction cap.
        Returns (alpha [P, E], beta [P, E, n1], vals [P, E], vmax scalar)
        in f64. The duals are feasibility-projected before assembly
        (:func:`_feasproj_run`) and the cut alphas carry the exact
        weak-duality correction for whatever epsilon remains — the same
        rigor treatment as the EF route (ADVICE r4 medium).
        """
        PEN = Pi.shape[0]
        P = PEN // (E * N)
        if has_cost:
            sub = jnp.broadcast_to(seed_d, (PEN, m2))
        else:
            live = jnp.arange(pool.shape[0])[:, None] < npool
            sc = jnp.where(live,
                           jnp.matmul(pool, H.T, precision=prec_hi),
                           -jnp.inf)
            sub = pool[jnp.argmax(sc, axis=0)]
        Pi_use = jnp.where(valid[:, None], Pi, sub).astype(jnp.float64)
        q_el = (Q_el.astype(jnp.float64) if has_cost
                else fp["q64"][None, :])
        Pi_use = _feasproj_run(fp, Pi_use, q_el, 400)
        red = q_el - jnp.matmul(Pi_use, fp["W64"], precision=prec_hi)
        viol = (jnp.where(fp["ub_inf"][None, :], jnp.maximum(-red, 0.0),
                          0.0)
                + jnp.where(fp["lb_inf"][None, :], jnp.maximum(red, 0.0),
                            0.0))
        vmax = jnp.max(viol) / qn_pol
        term = jnp.where(
            red >= 0.0,
            jnp.where(lb_ok_d[None, :], red * lbf_d[None, :],
                      -red * cap[None, :]),
            jnp.where(ub_ok_d[None, :], red * ubf_d[None, :],
                      red * cap[None, :]))
        corr_el = jnp.sum(term, axis=-1).reshape(P, E, N)
        PiR = Pi_use.reshape(P, E, N, m2)
        d64 = deltas.astype(jnp.float64)               # [E, N, Rv]
        pi_rows = PiR[..., rv_row_d]                   # [P, E, N, Rv]
        rhs_del = jnp.where(rhs_mask, d64, 0.0)        # [E, N, Rv]
        alpha = (jnp.einsum("en,penm,m->pe", p, PiR, r_d64)
                 + jnp.einsum("en,enr,penr->pe", p, rhs_del, pi_rows)
                 + jnp.einsum("en,pen->pe", p, corr_el))
        pibar = jnp.einsum("en,penm->pem", p, PiR)
        beta = -jnp.einsum("pem,mk->pek", pibar, T_d64)
        tr = jnp.einsum("en,enr,penr->per", p,
                        jnp.where(tr_mask, d64, 0.0), pi_rows)
        beta = beta.at[..., rv_col_d].add(-jnp.where(tr_mask, tr, 0.0))
        vals = jnp.einsum("en,pen->pe", p,
                          obj.reshape(P, E, N).astype(jnp.float64))
        return alpha, beta, vals, vmax

    assemble_all = jax.jit(jax.vmap(
        assemble, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None)))

    # ---- R-batched level-projection QP ---------------------------------
    # Static row layout: stage-1 | x bounds | eta >= lb_e | the SD run's
    # own cut pool + incumbent cuts (frozen during the polish — richer
    # projections for free) | a qp_rows_cap ring of polish cuts | level.
    nz = n1 + E
    sd_rows = E * K + E
    n_rows = m1 + n1 + E + sd_rows + qp_rows_cap + 1
    p_diag = jnp.asarray(
        np.concatenate([np.ones(n1), np.zeros(E)]), dt)
    is_eq = jnp.asarray(
        np.concatenate([senses1 == 0, np.zeros(n_rows - m1, bool)]))
    A_base = np.zeros((n_rows, nz))
    l_base = np.full(n_rows, -np.inf)
    u_base = np.full(n_rows, np.inf)
    A_base[:m1, :n1] = A1
    l_base[:m1] = np.where(senses1 == -1, -np.inf, b1)   # '<=' rows
    u_base[:m1] = np.where(senses1 == 1, np.inf, b1)     # '>=' rows
    A_base[m1:m1 + n1, :n1] = np.eye(n1)
    l_base[m1:m1 + n1] = lb1
    u_base[m1:m1 + n1] = ub1
    A_base[m1 + n1:m1 + n1 + E, n1:] = np.eye(E)
    l_base[m1 + n1:m1 + n1 + E] = lb_e
    A_base[-1] = np.concatenate([c64, w_e])              # level row
    A_b = np.broadcast_to(A_base, (R,) + A_base.shape).copy()
    l_b = np.broadcast_to(l_base, (R, n_rows)).copy()
    u_b = np.broadcast_to(u_base, (R, n_rows)).copy()
    off_sd = m1 + n1 + E
    for r in range(R):
        st = states[r]
        d = _np64(st.cut_mark) / np.maximum(
            _np64(st.total_weight)[:, None], 1e-30)
        livec = np.asarray(st.cut_live)
        a_c = _np64(st.cut_alpha)
        b_c = _np64(st.cut_beta)
        for e in range(E):
            for k in range(K):
                if not livec[e, k]:
                    continue
                row = off_sd + e * K + k
                A_b[r, row, :n1] = -d[e, k] * b_c[e, k]
                A_b[r, row, n1 + e] = 1.0
                l_b[r, row] = d[e, k] * a_c[e, k] + (1 - d[e, k]) * lb_e[e]
        inc_v = np.asarray(st.inc_valid)
        a_i = _np64(st.inc_alpha)
        b_i = _np64(st.inc_beta)
        for e in range(E):
            if not inc_v[e]:
                continue
            row = off_sd + E * K + e
            A_b[r, row, :n1] = -b_i[e]
            A_b[r, row, n1 + e] = 1.0
            l_b[r, row] = a_i[e]

    assert qp_rows_cap >= 2 * E, "qp_rows_cap must hold one round of cuts"
    qp_cfg = dataclasses.replace(config.qp, warm_retry=False)
    proj_qp = jax.jit(jax.vmap(
        lambda g, A, l, u, z0, mu0: solve_qp(
            p_diag, g, A, l, u, is_eq, qp_cfg, z0=z0, mu0=mu0)))
    z0 = jnp.zeros((R, nz), dt)
    mu0 = jnp.zeros((R, n_rows), dt)

    cuts: list = [[] for _ in range(R)]
    ring = 0                                           # next QP cut slot
    off_ring = off_sd + sd_rows
    centers = np.stack([_np64(s.x_incumbent) for s in states])
    lb = np.full(R, -np.inf)
    ub = np.full(R, np.inf)
    gap = np.full(R, np.inf)
    dual_infeas = np.zeros(R)
    x_kelley = centers.copy()
    prev_YL = None
    rounds = 0

    lb_rich = np.full(R, -np.inf)

    def model_min(r, with_state_cuts):
        return cut_model_min(
            arrays, espec, states[r], check_validity=False,
            extra_cuts=cuts[r], include_state_cuts=with_state_cuts,
            return_x=True)

    for rounds in range(1, max_rounds + 1):
        if include_state_cuts or cuts[0]:
            # the Kelley companion chases the BOUND model's argmin: cuts
            # land exactly where the reported bound is attained, which is
            # what raises it (with only the rich argmin evaluated, a
            # fresh-stream newsvendor replication sat at the lb_e floor
            # forever — no cut ever visited the corner attaining it)
            for r in range(R):
                lb[r], x_kelley[r], _ = model_min(r, include_state_cuts)
        if include_state_cuts:
            # one model: the bound model IS the projection model
            lb_rich = lb
        else:
            # the RICH model (SD cuts + polish cuts) drives the LEVEL:
            # it matches the projection QP's rows, so the level set is
            # never empty and projections stay in sane territory while
            # the Kelley companion handles the bound model's weak spots
            for r in range(R):
                lb_rich[r], _, _ = model_min(r, True)
        if rounds > 1:
            gap = (ub - lb) / (1.0 + np.abs(ub))
            if gap.max() <= gap_tol:
                rounds -= 1
                break
        if rounds == 1:
            X = centers[:, None, :]                    # [R, 1, n1]
        else:
            # level projection of the previous point (batched ADMM QP)
            level = lb_rich + level_lambda * (ub - lb_rich)
            g_b = np.concatenate([-centers, np.zeros((R, E))], axis=1)
            u_b[:, -1] = level
            z, mu, _ = proj_qp(
                jnp.asarray(g_b, dt), jnp.asarray(A_b, dt),
                jnp.asarray(l_b, dt), jnp.asarray(u_b, dt), z0, mu0)
            z0, mu0 = z, mu
            Xq = np.asarray(z, np.float64)[:, :n1]
            X = np.zeros((R, 2, n1))
            for r in range(R):
                xr = Xq[r]
                if not np.all(np.isfinite(xr)):
                    # degenerate projection: fall back to a stabilized
                    # Kelley step along the segment toward the argmin
                    xr = 0.7 * centers[r] + 0.3 * x_kelley[r]
                xr = np.clip(xr, lb1, ub1)
                X[r, 0], _ = project_first_stage(arrays, xr)
                X[r, 1] = x_kelley[r]                  # the Kelley point
        P = X.shape[1]
        H = jnp.concatenate([
            rhs_fn(deltas_d[r].reshape(E * N, -1),
                   jnp.asarray(X[r, pp], dt))
            for r in range(R) for pp in range(P)])     # [R*P*E*N, m2]
        if has_cost:
            Q = cost_panel(
                scenario_model,
                jnp.broadcast_to(
                    deltas_d[:, None], (R, P, E, N, deltas_d.shape[-1])
                ).reshape(R * P * E * N, -1), arrays.q)
        else:
            Q = None
        if prev_YL is not None and prev_YL[0].shape[0] == R * P * E * N:
            Y0, L0 = prev_YL
        elif prev_YL is not None:
            # P changed (round 1 -> 2): tile the previous solution over
            # the new per-replication point axis
            Yp, Lp = prev_YL
            Pp = Yp.shape[0] // (R * E * N)

            def tile(a):
                return jnp.broadcast_to(
                    a.reshape(R, Pp, E * N, -1)[:, :1],
                    (R, P, E * N, a.shape[-1])).reshape(R * P * E * N, -1)

            Y0, L0 = tile(Yp), tile(Lp)
        else:
            Y0 = L0 = None
        obj, Y, Pi, stats = solve_batch(prep_sub, H, config.pdhg,
                                        Y0=Y0, L0=L0, Q=Q)
        prev_YL = (Y, Pi)
        cap_d = 10.0 * (1.0 + jnp.max(jnp.abs(Y.astype(jnp.float64)),
                                      axis=0))
        n2 = int(np.asarray(arrays.q).shape[0])
        Q_el = (Q.reshape(R, P * E * N, n2) if has_cost
                else jnp.zeros((R, 1, 1)))
        alpha_all, beta_all, vals_all, vmax_all = assemble_all(
            Pi.reshape(R, P * E * N, m2),
            stats["pdhg_valid"].reshape(R, P * E * N),
            obj.reshape(R, P * E * N),
            H.reshape(R, P * E * N, m2),
            deltas_d, p_d, pools_d, npool_d, Q_el, cap_d)
        dual_infeas = np.maximum(dual_infeas,
                                 np.asarray(vmax_all, np.float64))
        alpha_all = np.asarray(alpha_all)              # [R, P, E]
        beta_all = np.asarray(beta_all)                # [R, P, E, n1]
        vals_all = np.asarray(vals_all)                # [R, P, E]

        for r in range(R):
            for pp in range(P):
                for e in range(E):
                    alpha, beta = alpha_all[r, pp, e], beta_all[r, pp, e]
                    cuts[r].append((e, alpha, beta))
                    row = off_ring + ((ring + pp * E + e) % qp_rows_cap)
                    A_b[r, row, :n1] = -beta
                    A_b[r, row, n1:] = 0.0
                    A_b[r, row, n1 + e] = 1.0
                    l_b[r, row] = alpha
                    u_b[r, row] = np.inf
                # exact-sample SAA value at each point (the bundle upper
                # bound; small PDHG objective error only moves the
                # STOPPING signal)
                ub[r] = min(ub[r],
                            float(c64 @ X[r, pp] + w_e @ vals_all[r, pp]))
        ring += P * E
        centers = X[:, 0]

    for r in range(R):
        lb[r], _, _ = cut_model_min(
            arrays, espec, states[r],
            check_validity=(r == 0 and include_state_cuts),
            extra_cuts=cuts[r], include_state_cuts=include_state_cuts,
            return_x=True)
    gap = (ub - lb) / (1.0 + np.abs(ub))
    return {
        "lb_per_rep": lb * obj_scale,
        "saa_ub_per_rep": ub * obj_scale,
        "gap_per_rep": gap,
        "rounds": rounds,
        # per-replication (e, alpha, beta) bundle cuts in SCALED
        # objective units — valid for the same certification stream, so
        # callers can merge them into saa_ef_bound's model via
        # extra_cuts (same seed => identical streams by construction)
        "cuts_per_rep": cuts,
        # worst residual relative dual infeasibility of any cut's duals
        # AFTER the feasibility projection (the exact corrections for it
        # are already folded into the cut alphas)
        "dual_infeas_per_rep": dual_infeas,
        "n_scenarios": N,
    }


def _feasproj_consts(arrays) -> Dict:
    """Device constants for the batched dual-feasibility projection:
    f64 W, sign-cone masks, infinite-direction masks, and the gradient
    step 1/||W||_2^2 (host power iteration)."""
    import jax.numpy as jnp

    from sqlp_tpu.models.stage import SENSE_G, SENSE_L

    senses2 = np.asarray(arrays.senses2)
    Wh = _np64(arrays.W)
    v = np.cos(np.arange(Wh.shape[1]) * 0.37 + 0.2)
    for _ in range(30):
        v = Wh.T @ (Wh @ v)
        v /= max(np.linalg.norm(v), 1e-30)
    L_w = float(v @ (Wh.T @ (Wh @ v)))                     # ||W||_2^2
    return {
        "W64": jnp.asarray(Wh),
        "q64": jnp.asarray(_np64(arrays.q)),
        "pos": jnp.asarray(senses2 == SENSE_G),            # pi >= 0 rows
        "neg": jnp.asarray(senses2 == SENSE_L),            # pi <= 0 rows
        "ub_inf": jnp.asarray(~np.isfinite(_np64(arrays.ub2))),
        "lb_inf": jnp.asarray(~np.isfinite(_np64(arrays.lb2))),
        "step": 1.0 / max(L_w, 1e-30),
    }


def _feasproj_run(c: Dict, Pi, q_s, iters: int):
    """Projected gradient descent on the squared infinite-direction dual
    violation f(pi) = 0.5*||masked relu(W'pi - q_s)||^2 with sign-cone
    projection each step — drives a batch of epsilon-feasible duals to
    the dual-feasible set with movement on the violation scale (pure f64
    matmuls; TPU-safe, traceable inside jit). Pi: [B, m2]; q_s: [B, n2]
    or [1, n2]."""
    import jax
    import jax.numpy as jnp

    prec = jax.lax.Precision.HIGHEST

    def body(_, Pi):
        red = jnp.matmul(Pi, c["W64"], precision=prec) - q_s
        g = (jnp.where(c["ub_inf"][None, :], jnp.maximum(red, 0.0), 0.0)
             - jnp.where(c["lb_inf"][None, :], jnp.maximum(-red, 0.0),
                         0.0))
        Pi = Pi - c["step"] * jnp.matmul(g, c["W64"].T, precision=prec)
        Pi = jnp.where(c["pos"][None, :], jnp.maximum(Pi, 0.0), Pi)
        Pi = jnp.where(c["neg"][None, :], jnp.minimum(Pi, 0.0), Pi)
        return Pi

    return jax.lax.fori_loop(0, iters, body, Pi)


def _refine_recourse_duals(arrays, scenario_model, config, deltas_u,
                           x_ef, Y_ef, pt, tol: float = 1e-7,
                           chunk: int = 8192, pg_iters: int = 2500):
    """Minimal-movement f64 feasibility polish of the EF dual panel.

    The f32 EF duals carry ~1e-2 relative reduced-cost violations. Two
    repair strategies were measured:

      * independently RE-SOLVING each recourse LP at x_ef (batched f64
        PDHG) reaches 1e-13 feasibility but picks a DIFFERENT optimal
        dual on degenerate recourse — the aggregate cut loses the EF
        duals' joint stationarity at x_ef and its model minimum drops
        ~10% below v_N on newsvendor (measured);
      * this routine instead walks the EF duals to the feasible set by
        projected gradient descent on the squared infinite-direction
        violation (f(pi) = 0.5 * ||masked relu(W'pi - q_s)||^2, step
        1/||W||_2^2, sign-cone projection each step) — pure f64 matmuls
        batched over the panel, TPU-safe (no f64 EF program, no f64
        linalg), and the movement is on the violation scale (~1e-2), so
        the cut stays tight where the EF left it.

    Any sign-feasible movement preserves cut validity (the Lagrangian
    correction covers whatever epsilon remains); tightness is why
    minimal movement matters.

    Args:
      deltas_u: [R, EN, Rv] certification deltas; x_ef: [R, n1];
      Y_ef: [R, EN, n2] EF second-stage blocks; pt: [R, EN, m2] recourse
      duals (all original units).

    Returns (pt_polished [R,EN,m2] np.f64, H [R,EN,m2] np.f64 recourse
    rhs panels, Ymax [n2] max |y| observed, n_unrefined=0).
    """
    import jax
    import jax.numpy as jnp

    from sqlp_tpu.models.scenario import cost_panel
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    def to64(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    arrays64 = to64(arrays)
    model64 = to64(scenario_model)
    q64 = arrays64.q
    consts = _feasproj_consts(arrays)

    polish = jax.jit(lambda Pi, q_s: _feasproj_run(consts, Pi, q_s,
                                                   pg_iters))

    R, EN, m2 = pt.shape
    pt_out = np.empty((R, EN, m2), np.float64)
    H_out = np.empty((R, EN, m2), np.float64)
    Ymax = np.abs(np.asarray(Y_ef, np.float64)).max(axis=(0, 1))
    bucket = min(chunk, 1 << (EN - 1).bit_length())
    for r in range(R):
        d64 = jnp.asarray(np.asarray(deltas_u[r], np.float64))
        H_r = _scenario_rhs(arrays64, model64, d64,
                            jnp.asarray(np.asarray(x_ef[r], np.float64)))
        H_out[r] = np.asarray(H_r, np.float64)
        Q_r = (cost_panel(model64, d64, q64)
               if scenario_model.has_cost else None)
        for lo in range(0, EN, bucket):
            hi = min(lo + bucket, EN)
            pad = bucket - (hi - lo)
            Pi_c = jnp.asarray(np.asarray(pt[r, lo:hi], np.float64))
            q_c = (q64[None, :] if Q_r is None else Q_r[lo:hi])
            if pad:
                Pi_c = jnp.concatenate(
                    [Pi_c, jnp.broadcast_to(Pi_c[:1], (pad, m2))])
                if Q_r is not None:
                    q_c = jnp.concatenate(
                        [q_c, jnp.broadcast_to(q_c[:1],
                                               (pad, q_c.shape[1]))])
            pt_out[r, lo:hi] = np.asarray(polish(Pi_c, q_c),
                                          np.float64)[:hi - lo]
    return pt_out, H_out, Ymax, 0


def _resolve_recourse_duals(arrays, scenario_model, config, deltas_u,
                            x_ef, Y_ef, pt, chunk: int = 4096):
    """Warm-started f64 re-solve of the EF dual panel on device.

    With x fixed at the EF argmin the extensive form decouples into
    independent recourse LPs; re-solving each with the batched f64 PDHG
    kernel WARM-STARTED at its EF dual (and second-stage block) yields
    duals that are BOTH feasible (no f32 floor) and per-scenario
    optimal at x_ef — so the aggregate cut's value at x_ef equals the
    decoupled objective there, unlike the minimal-movement feasibility
    projection (:func:`_feasproj_run`), whose movement costs cut value
    wherever it lands. From a near-optimal warm start the solve
    converges in few rounds and tends to stay on the same optimal
    face, limiting the degeneracy slope-drift that made COLD
    independent re-solves lose bound tightness (measured, module
    history). Returns (pt [R,EN,m2] np.f64, H [R,EN,m2], Ymax [n2],
    n_unconverged).
    """
    import dataclasses as _dcl

    import jax
    import jax.numpy as jnp

    from sqlp_tpu.models.scenario import cost_panel
    from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    def to64(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    arrays64 = to64(arrays)
    model64 = to64(scenario_model)
    prep64 = prepare_lp(arrays64.W, arrays64.senses2, arrays64.q,
                        arrays64.lb2, arrays64.ub2,
                        ruiz_iters=config.pdhg.ruiz_iters)
    # capped budget, like the MC evaluator's f64 rung: emulated-f64
    # iterations are ~10x slower and a warm start needs few of them;
    # Pallas is f32-only so the XLA path is taken automatically
    cfg64 = _dcl.replace(config.pdhg,
                         max_iters=min(config.pdhg.max_iters, 20_000))
    R, EN, m2 = pt.shape
    pt_out = np.empty((R, EN, m2), np.float64)
    H_out = np.empty((R, EN, m2), np.float64)
    Ymax = np.zeros(arrays64.W.shape[1], np.float64)
    n_unconv = 0
    bucket = min(chunk, 1 << (EN - 1).bit_length())
    for r in range(R):
        d64 = jnp.asarray(np.asarray(deltas_u[r], np.float64))
        H_r = _scenario_rhs(arrays64, model64, d64,
                            jnp.asarray(np.asarray(x_ef[r], np.float64)))
        H_out[r] = np.asarray(H_r, np.float64)
        Q_r = (cost_panel(model64, d64, arrays64.q)
               if scenario_model.has_cost else None)
        for lo in range(0, EN, bucket):
            hi = min(lo + bucket, EN)
            pad = bucket - (hi - lo)
            idx = np.arange(lo, hi)
            if pad:
                idx = np.pad(idx, (0, pad), mode="edge")
            Hb = H_r[idx]
            Yb = jnp.asarray(np.asarray(Y_ef, np.float64)[r][idx])
            Lb = jnp.asarray(np.asarray(pt, np.float64)[r][idx])
            Qb = None if Q_r is None else Q_r[idx]
            obj, Y, Pi, stats = solve_batch(prep64, Hb, cfg64,
                                            Y0=Yb, L0=Lb, Q=Qb)
            ok = np.asarray(stats["pdhg_valid"])[:hi - lo]
            Pi_h = np.asarray(Pi, np.float64)[:hi - lo]
            # an unconverged element keeps its refined iterate — the
            # corrections cover whatever feasibility epsilon remains
            pt_out[r, lo:hi] = Pi_h
            n_unconv += int((~ok).sum())
            Ymax = np.maximum(
                Ymax, np.abs(np.asarray(Y, np.float64)[:hi - lo]).max(0))
    return pt_out, H_out, Ymax, n_unconv


def _lagrangian_corrections(arrays, scenario_model, deltas_re, pt_re,
                            Ymax, qn):
    """Exact weak-duality correction terms for epsilon-feasible duals.

    For ANY row-sign-feasible pi, Q(x, xi_s) >= pi'(r_s - T_s x) +
    sum_j min over y_j in [lb_j, ub_j] of red_j y_j with red = q_s -
    W'pi. The sum is the per-scenario correction: exactly zero for
    dual-feasible pi on lb=0 columns, an exact (computable) term where
    the active bound is finite, and a capped estimate 10*(1+max|y|)
    where it is not (reported; after the f64 refinement the residual
    red-negativity is ~1e-7 relative, so the capped term is ~1e-4
    absolute at worst). Making the cut alpha include this term turns
    "epsilon-feasible duals can overshoot the SAA optimum by
    O(residual*scale)" into a deducted, measured quantity (ADVICE r4).

    Args: deltas_re/pt_re [N, Rv]/[N, m2] one replication's panel.
    Returns (corr [N], relv [N] max relative violation per scenario).
    """
    W64 = _np64(arrays.W)
    q64 = _np64(arrays.q)
    lb64 = _np64(arrays.lb2)
    ub64 = _np64(arrays.ub2)
    if scenario_model.has_cost:
        import jax.numpy as jnp

        from sqlp_tpu.models.scenario import cost_panel
        q_s = np.asarray(cost_panel(
            scenario_model, jnp.asarray(deltas_re, jnp.float64),
            jnp.asarray(q64)), np.float64)
    else:
        q_s = q64[None, :]
    red = q_s - pt_re @ W64                               # [N, n2]
    viol = np.maximum(-red, 0.0)
    relv = viol.max(axis=1) / qn
    cap = 10.0 * (1.0 + Ymax)
    lb_ok = np.isfinite(lb64)
    ub_ok = np.isfinite(ub64)
    term_pos = np.where(lb_ok[None, :], red * np.where(lb_ok, lb64, 0.0),
                        -red * cap[None, :])
    term_neg = np.where(ub_ok[None, :], red * np.where(ub_ok, ub64, 0.0),
                        red * cap[None, :])
    term = np.where(red >= 0.0, term_pos, term_neg)
    return term.sum(axis=1), relv


def saa_ef_bound(arrays, scenario_model, espec, states: Sequence,
                 config, obj_scale: float = 1.0,
                 extra_scenarios: int = 0, seed: int = 9000,
                 ef_config=None, extra_cuts: Optional[Sequence] = None,
                 refine_f64: Optional[bool] = None,
                 refine_tol: float = 1e-6,
                 refine_iters: int = 4000,
                 fresh_scenarios: int = 0,
                 fresh_sampling: str = "stratified",
                 fresh_pairing=None,
                 ef_chunk_iters: Optional[int] = None,
                 refine_duals: bool = True,
                 refine_mode: str = "project",
                 refine_duals_tol: float = 1e-7,
                 host_exact_cap: int = 1024,
                 vmap_group: int = 8,
                 _r_offset: int = 0) -> Dict:
    """SAA lower bound from extensive-form dual certificates.

    For each replication, solve the sample-average EXTENSIVE FORM over
    its certification stream with the structured batched PDHG solver
    (models/crash.py — the [S*m2, n1 + S*n2] system is never
    materialized) and turn the per-scenario duals into ONE aggregate cut
    per epigraph: alpha_e = sum_s p_s pi_s' r_s, beta_e = -sum_s p_s
    (T_s)' pi_s with pi_s the EF dual of scenario block s (divided by
    its objective weight). By LP duality, the exact minimum of
    c'x + sum_e w_e max(cut_e, lb_e) over the first-stage polytope (host
    HiGHS f64, :func:`cut_model_min`) equals the EF optimum v_N minus
    the solve's duality gap — a bundle method needs O(100) outer rounds
    for the same tightness (measured on ssn: level bundle reaches
    v_N - 10% in 30 rounds; one joint EF solve at tol 1e-4 leaves ~0.1%).

    ``extra_scenarios`` extends the certification streams exactly as in
    :func:`saa_polish` (fresh i.i.d. draws per replication; the SD cuts
    are then excluded from the bound model). ``extra_cuts`` (per-rep
    lists of (e, alpha, beta)) lets callers merge polish cuts in.

    Validity (three layers, ADVICE r4 medium; recipe re-measured r5):
      1. ``refine_duals`` (default, ``refine_mode="project"``): walk the
         EF duals to the feasible set by the minimal-movement projection
         (:func:`_refine_recourse_duals`) — on tol-1e-5 EF duals the
         movement is on the ~1e-4 violation scale, residual violations
         drop to ~1e-11 relative, and the cut loses only ~0.005 of
         tightness (RESULTS.md r5 table: every alternative — cold host
         repair, warm f64 per-scenario re-solve — destroys the EF
         duals' joint slope structure on degenerate recourse and
         crashes the bound). Any dual-feasible pi is a valid cut
         coefficient for all x, so the movement preserves validity.
      2. scenarios still violating above 1e-3 relative are re-solved
         EXACTLY on the host (HiGHS f64; budget ``host_exact_cap`` per
         replication) — a gross-failure backstop only: at normal
         scales a cold exact vertex HARMS the cut (point 1), so the
         threshold is deliberately loose.
      3. the remaining measured epsilon is DEDUCTED from each aggregate
         cut via the exact weak-duality correction
         (:func:`_lagrangian_corrections`) — reported as
         ``cut_correction_per_rep``; exactly 0 after a healthy
         projection.

    Returns: lb_per_rep, ef_obj_per_rep, ef_err_per_rep,
    dual_infeas_per_rep, cut_correction_per_rep, host_exact_count,
    n_scenarios (all bounds unscaled).
    """
    import jax
    import jax.numpy as jnp

    from sqlp_tpu.models.crash import solve_extensive_form
    from sqlp_tpu.models.scenario import sample_deltas

    R = len(states)
    if R > vmap_group:
        # the remote XLA compiler wedges on wide R-vmapped EF programs
        # (observed at R=16 on ssn flagship sizes — the same failure
        # class as the r4 replicated-refresh wedge); split into groups
        # of <= vmap_group replications. Stream keys are indexed by the
        # GLOBAL replication index (r_offset), so the split is
        # bit-transparent: same streams, same bounds, merged outputs.
        assert _r_offset == 0
        g = vmap_group
        if fresh_pairing == "antithetic" and g % 2:
            g -= 1                               # keep pairs together
        outs = []
        for lo in range(0, R, g):
            outs.append(saa_ef_bound(
                arrays, scenario_model, espec, states[lo:lo + g], config,
                obj_scale=obj_scale, extra_scenarios=extra_scenarios,
                seed=seed, ef_config=ef_config,
                extra_cuts=None if extra_cuts is None
                else extra_cuts[lo:lo + g],
                refine_f64=refine_f64, refine_tol=refine_tol,
                refine_iters=refine_iters,
                fresh_scenarios=fresh_scenarios,
                fresh_sampling=fresh_sampling,
                fresh_pairing=fresh_pairing,
                ef_chunk_iters=ef_chunk_iters,
                refine_duals=refine_duals, refine_mode=refine_mode,
                refine_duals_tol=refine_duals_tol,
                host_exact_cap=host_exact_cap, vmap_group=vmap_group,
                _r_offset=lo))
        merged = {}
        for k in outs[0]:
            if k == "n_scenarios":
                merged[k] = outs[0][k]
            elif k in ("host_exact_count", "n_unrefined"):
                merged[k] = sum(o[k] for o in outs)
            else:
                merged[k] = np.concatenate([np.asarray(o[k])
                                            for o in outs])
        return merged
    E = int(np.asarray(states[0].cut_alpha).shape[0])
    n_scen = np.asarray(states[0].n_scen)
    N_sd = int(n_scen.max())
    assert int(n_scen.min()) == N_sd, "per-epigraph scenario counts differ"

    deltas_h, weights_h, include_state_cuts = _certification_streams(
        states, scenario_model, R, E, N_sd, extra_scenarios,
        fresh_scenarios, seed, fresh_sampling, fresh_pairing,
        r_offset=_r_offset)
    N = deltas_h.shape[2]
    p_h = weights_h / np.maximum(
        weights_h.sum(axis=2, keepdims=True), 1e-30)     # [R, E, N]
    w_e = _np64(espec.obj_weight)

    dt = np.asarray(arrays.c).dtype
    deltas_u = jnp.asarray(deltas_h.reshape(R, E * N, -1), dt)
    probs_u = jnp.asarray((w_e[:, None] * p_h[0]).reshape(E * N), dt)
    # probability layout is identical across replications (same lengths,
    # same weights by construction); assert rather than assume
    assert np.allclose(w_e[:, None] * p_h, (w_e[:, None] * p_h[0])[None]), \
        "replications disagree on scenario weights"

    if ef_config is None:
        # The aggregate cut's model minimum equals v_N only when the EF
        # duals carry the JOINT KKT slope structure; at the production
        # subproblem tolerance (1e-4) the slopes are noisy enough that
        # the cut's minimum dips ~0.45 below v_N on ssn, while one more
        # decade of EF convergence restores it to within 0.01-0.05
        # (RESULTS.md r5 A/B). The chunked driver bounds per-program
        # length, so the larger iteration ceiling is tunnel-safe.
        import dataclasses as _dcl
        if config.pdhg.tol > 1e-5:
            ef_config = _dcl.replace(config.pdhg, tol=1e-5,
                                     max_iters=max(config.pdhg.max_iters,
                                                   400_000))
        else:
            ef_config = config.pdhg
    if refine_f64 is None:
        # default: refine everywhere EXCEPT the TPU backend. Emulated-f64
        # EF programs kill the axon TPU worker even when chained in
        # 2048-iteration chunks (so it is not a program-length issue like
        # the f32 cases the chunked driver fixes — some f64 kernel in
        # this program faults outright). On TPU the f32 certificates'
        # feasibility residuals are measured and reported instead
        # (dual_infeas_per_rep).
        refine_f64 = jax.default_backend() != "tpu"
    if ef_chunk_iters is None:
        # per-chunk device time scales with the vmapped block count;
        # single programs past ~2 minutes kill the tunneled TPU worker.
        # Budget relative to the proven (R=8 x 24k-block, 16384-iter)
        # program, clamped to a useful range.
        blocks = R * E * N
        ef_chunk_iters = int(min(16_384, max(
            2048, 16_384 * (4 * 3000) // max(blocks, 1))))
    # chunked host loop: long single XLA programs kill the tunneled TPU
    # worker (models/crash.py:solve_extensive_form_chunked)
    from sqlp_tpu.models.crash import solve_extensive_form_chunked
    x_ef, obj_ef, stats, duals, Y_ef, u0_ef = solve_extensive_form_chunked(
        arrays, scenario_model, deltas_u, probs_u, ef_config,
        chunk_iters=ef_chunk_iters, vmapped=True)
    ef_err = np.asarray(stats["ef_err"], np.float64)

    if refine_f64:
        # f64 polish pass, warm-started at the f32 solution: the f32
        # duals' per-scenario feasibility floors near the f32 roundoff
        # of the EF's p_s-scaled objective (violations amplify by 1/p_s
        # when converting block duals to recourse duals); a short f64
        # continuation has no such floor. Costs ~1 emulated-f64 round
        # per f32 restart round retired.
        import dataclasses as _dcl
        arrays64 = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                      jnp.floating) else a,
            arrays)
        model64 = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                      jnp.floating) else a,
            scenario_model)
        cfg64 = _dcl.replace(ef_config, tol=refine_tol,
                             max_iters=refine_iters)
        # short f64 chunks: emulated-f64 iterations are ~10x slower, so
        # the per-program budget shrinks accordingly
        x_ef, obj_ef, stats64, duals, Y_ef, u0_ef = \
            solve_extensive_form_chunked(
                arrays64, model64, deltas_u.astype(jnp.float64),
                probs_u.astype(jnp.float64), cfg64,
                chunk_iters=max(512, ef_chunk_iters // 8), vmapped=True,
                x0=x_ef.astype(jnp.float64),
                Y0=Y_ef.astype(jnp.float64),
                U0=duals.astype(jnp.float64),
                u00=u0_ef.astype(jnp.float64))
        ef_err = np.asarray(stats64["ef_err"], np.float64)

    # per-scenario recourse duals: EF block duals divided by their
    # objective weights
    pt = duals / jnp.maximum(jnp.asarray(
        (w_e[:, None] * p_h).reshape(R, E * N), jnp.float64)[..., None],
        1e-30)

    qn = float(1.0 + np.max(np.abs(_np64(arrays.q))))
    if refine_duals and refine_mode == "resolve":
        # warm-started f64 per-scenario re-solve. MEASURED NEGATIVE on
        # ssn (RESULTS.md r5): per-scenario re-optimization — however
        # warm-started — lands on different optimal vertices of the
        # degenerate recourse, and the aggregate cut built from them
        # loses the EF duals' joint slope structure entirely (model
        # minima crash to the epigraph floor). Kept as an option for
        # instances with non-degenerate recourse; the default is the
        # minimal-movement projection, which preserves tightness once
        # the EF is solved to the tighter default tolerance above.
        pt_h, H_h, Ymax, n_unrefined = _resolve_recourse_duals(
            arrays, scenario_model, config, deltas_u, x_ef, Y_ef, pt)
    elif refine_duals:
        pt_h, H_h, Ymax, n_unrefined = _refine_recourse_duals(
            arrays, scenario_model, config, deltas_u, x_ef, Y_ef, pt,
            tol=refine_duals_tol)
    else:
        # np.array (copy): asarray returns a READ-ONLY zero-copy view of
        # the device buffer and the host-exact repair writes into pt_h
        pt_h = np.array(pt, np.float64)
        from sqlp_tpu.sd.algorithm import _scenario_rhs as _srhs
        H_h = np.stack([
            np.asarray(_srhs(arrays, scenario_model, deltas_u[r],
                             jnp.asarray(x_ef[r])), np.float64)
            for r in range(R)])
        Ymax = np.abs(np.asarray(Y_ef, np.float64)).max(axis=(0, 1))
        n_unrefined = R * E * N

    # host-exact repair of the worst residual offenders, then the exact
    # weak-duality correction on whatever epsilon remains
    from sqlp_tpu.models.routines import solve_lp_host
    W64h = _np64(arrays.W)
    q64h = _np64(arrays.q)
    lb64h = _np64(arrays.lb2)
    ub64h = _np64(arrays.ub2)
    senses2_h = np.asarray(arrays.senses2)
    corr = np.zeros((R, E * N), np.float64)
    dual_infeas = np.zeros(R, np.float64)
    host_exact_count = 0
    for r in range(R):
        corr_r, relv = _lagrangian_corrections(
            arrays, scenario_model, np.asarray(deltas_u[r], np.float64),
            pt_h[r], Ymax, qn)
        # 1e-3, not smaller: a cold host re-solve returns a DIFFERENT
        # optimal vertex on degenerate recourse, and swapping even ~1/3
        # of a panel's duals for exact-but-unrelated vertices destroys
        # the aggregate cut's joint slope structure (measured on ssn:
        # model minima crashed from ~9.4 to the epigraph floor). Repair
        # only gross offenders; mild epsilon goes through the exact
        # corrections instead.
        fix = np.flatnonzero(relv > 1e-3)
        if fix.size > host_exact_cap:
            warnings.warn(
                f"replication {r}: {fix.size} certification scenarios "
                f"still violate dual feasibility > 1e-5 after the f64 "
                f"refinement; repairing only the worst {host_exact_cap} "
                f"on the host (the rest carry exact corrections)")
            fix = fix[np.argsort(relv[fix])[::-1][:host_exact_cap]]
        for s in fix:
            if scenario_model.has_cost:
                from sqlp_tpu.models.scenario import cost_panel
                qs = np.asarray(cost_panel(
                    scenario_model, deltas_u[r, s:s + 1],
                    jnp.asarray(q64h)), np.float64)[0]
            else:
                qs = q64h
            try:
                _, _, pi_exact = solve_lp_host(
                    qs, W64h, H_h[r, s], senses2_h, lb64h, ub64h)
            except RuntimeError:
                continue                     # keep the corrected epsilon
            pt_h[r, s] = pi_exact
            host_exact_count += 1
        if fix.size:
            corr_r, relv = _lagrangian_corrections(
                arrays, scenario_model,
                np.asarray(deltas_u[r], np.float64), pt_h[r], Ymax, qn)
        corr[r] = corr_r
        dual_infeas[r] = float(relv.max())
    if dual_infeas.max() > 1e-3:
        warnings.warn(
            f"EF dual certificates remain poorly feasible after repair "
            f"(max relative reduced-cost violation {dual_infeas.max():.2e},"
            f" ef_err {ef_err.max():.2e}); the weak-duality corrections "
            f"keep the bound valid but it may be far below the SAA "
            f"optimum — raise ef_config.max_iters / host_exact_cap")
    # A grossly unconverged certificate yields a valid-but-useless
    # corrected bound; past 5e-2 relative violation (an order of
    # magnitude above any healthy run) report -inf so callers see the
    # failure rather than a meaningless number.
    cert_bad = dual_infeas > 5e-2

    # aggregate cuts, exact f64 on host
    rv_row = np.asarray(scenario_model.rv_row)
    rv_col = np.asarray(scenario_model.rv_col)
    rv_is_rhs = np.asarray(scenario_model.rv_is_rhs)
    rv_is_cost = (np.asarray(scenario_model.rv_is_cost)
                  if scenario_model.has_cost
                  else np.zeros_like(rv_is_rhs))
    r64 = _np64(arrays.r)
    T64 = _np64(arrays.T)
    pt_h = pt_h.reshape(R, E, N, -1)
    corr = corr.reshape(R, E, N)
    lb = np.zeros(R)
    for r in range(R):
        cuts_r = list(extra_cuts[r]) if extra_cuts is not None else []
        for e in range(E):
            p = p_h[r, e]
            Pi_re = pt_h[r, e]
            pi_rows = Pi_re[:, rv_row]
            rhs_d = np.where(rv_is_rhs[None, :], deltas_h[r, e], 0.0)
            alpha = (p @ (Pi_re @ r64)
                     + np.sum(p[:, None] * rhs_d * pi_rows)
                     + p @ corr[r, e])
            beta = -(T64.T @ (p @ Pi_re))
            not_tr = rv_is_rhs | rv_is_cost.astype(bool)
            tr = np.where(not_tr[None, :], 0.0,
                          p[:, None] * deltas_h[r, e] * pi_rows)
            np.subtract.at(beta, rv_col, tr.sum(axis=0))
            cuts_r.append((e, alpha, beta))
        lb[r], _, _ = cut_model_min(
            arrays, espec, states[r], check_validity=(r == 0),
            extra_cuts=cuts_r, include_state_cuts=include_state_cuts,
            return_x=True)
    if cert_bad.any():
        warnings.warn(
            f"{int(cert_bad.sum())}/{R} EF certificates rejected "
            f"(dual infeasibility > 5e-2); their bounds are reported as "
            f"-inf — this instance needs a larger EF iteration budget")
        lb = np.where(cert_bad, -np.inf, lb)
    return {
        "lb_per_rep": lb * obj_scale,
        # the EF argmin decisions are free byproducts and typically
        # BETTER first-stage candidates than the SD compromise (each
        # minimizes a large fresh-stream SAA exactly, not a decayed cut
        # model); callers may evaluate them on independent panels for
        # the upper-bound side (x is never objective-scaled)
        "x_ef_per_rep": np.asarray(x_ef, np.float64),
        "ef_obj_per_rep": np.asarray(obj_ef, np.float64) * obj_scale,
        "ef_err_per_rep": ef_err,
        "dual_infeas_per_rep": dual_infeas,
        # objective-weighted total correction folded into each
        # replication's cuts, unscaled objective units (negative =
        # deduction for residual dual infeasibility)
        "cut_correction_per_rep": np.einsum(
            "e,ren,ren->r", w_e, p_h, corr) * obj_scale,
        "host_exact_count": host_exact_count,
        "n_unrefined": n_unrefined,
        "n_scenarios": N,
    }


def t_lower_bound(per_rep: np.ndarray, confidence: float = 0.95,
                  pair_means: bool = False) -> Dict:
    """Student-t aggregation of i.i.d. per-replication bounds (module
    docstring): mean - t_{R-1,conf} * std / sqrt(R).

    ``pair_means=True``: consecutive replications are antithetic pairs
    (``fresh_pairing="antithetic"`` certification streams) — members of
    a pair are NOT independent, so the t-interval is taken over the R/2
    i.i.d. pair means instead (each still satisfies E <= v*); the
    negative within-pair coupling is exactly what shrinks their spread.
    """
    import scipy.stats

    per_rep = np.asarray(per_rep, np.float64)
    if pair_means:
        assert per_rep.shape[0] % 2 == 0, "pairing needs an even R"
        per_rep = 0.5 * (per_rep[0::2] + per_rep[1::2])
    R = per_rep.shape[0]
    if not np.all(np.isfinite(per_rep)):
        # rejected certificates arrive as -inf (saa_ef_bound); without this
        # the mean/std arithmetic turns them into nan and the CLI prints
        # "lb_cert=nan" instead of a visible failure
        bad = np.flatnonzero(~np.isfinite(per_rep)).tolist()
        warnings.warn(
            f"replications {bad} carry non-finite lower bounds (rejected "
            f"or failed certificates); lb_cert is -inf — re-run those "
            f"replications with a larger certification budget")
        return {
            "lb_cert": -math.inf,
            "lb_mean": -math.inf,
            "lb_half_width": math.inf,
            "lb_per_rep": per_rep,
            "confidence": confidence,
            "n_replications": R,
        }
    mean = float(per_rep.mean())
    if R > 1:
        t = float(scipy.stats.t.ppf(0.5 * (1.0 + confidence), R - 1))
        hw = t * float(per_rep.std(ddof=1)) / math.sqrt(R)
    else:
        hw = math.inf
        warnings.warn("one replication gives no variance estimate; "
                      "lb_cert is -inf — run R >= 2 replications")
    return {
        "lb_cert": mean - hw,
        "lb_mean": mean,
        "lb_half_width": hw,
        "lb_per_rep": per_rep,
        "confidence": confidence,
        "n_replications": R,
    }


def certified_lower_bound(arrays, espec, states: Sequence,
                          obj_scale: float = 1.0,
                          confidence: float = 0.95) -> Dict:
    """Replication-based confidence lower bound on the true optimum.

    Args:
      arrays/espec: the (scaled) instance arrays and epigraph spec shared
        by the replications.
      states: final per-replication SDState (e.g. SDReplications.states).
      obj_scale: the solver's objective normalization factor.
      confidence: two-sided Student-t confidence level for the half-width
        (the one-sided coverage of ``lb_cert`` is then (1+conf)/2).

    Returns a dict with:
      lb_cert       mean - half_width: the certified statistical bound
      lb_mean       mean of the per-replication exact cut-model minima
      lb_half_width t_{R-1} * std / sqrt(R)
      lb_per_rep    the R deterministic per-replication bounds
    """
    R = len(states)
    assert R >= 1
    per_rep = np.array([
        cut_model_min(arrays, espec, s, obj_scale=obj_scale,
                      check_validity=(r == 0))
        for r, s in enumerate(states)])
    out = t_lower_bound(per_rep, confidence)
    # Diagnostic (reported, not deducted): the SD cuts inherit the dual
    # pool's PDHG valid_tol feasibility — the same epsilon the reference
    # inherits from its LP solver's tolerance, but ours is f32-sized, so
    # it is measured and surfaced here (ADVICE r4). Worst relative
    # infinite-direction reduced-cost violation over each live pool.
    Wh = _np64(arrays.W)
    q = _np64(arrays.q)
    qn = 1.0 + np.abs(q).max()
    ub_inf = ~np.isfinite(_np64(arrays.ub2))
    lb_inf = ~np.isfinite(_np64(arrays.lb2))
    infeas = np.zeros(R)
    for r, s in enumerate(states):
        nd = int(np.asarray(s.n_duals))
        if nd == 0:
            continue
        red = q[None, :] - _np64(s.duals)[:nd] @ Wh
        viol = (np.where(ub_inf[None, :], np.maximum(-red, 0.0), 0.0)
                + np.where(lb_inf[None, :], np.maximum(red, 0.0), 0.0))
        infeas[r] = viol.max() / qn
    out["dual_infeas_per_rep"] = infeas
    return out
