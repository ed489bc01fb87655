"""On-device proximal master QP solver (OSQP-style ADMM).

The reference re-solves the regularized master

    min  c@x + sum_e w_e eta_e + rho/2 ||x - x_inc||^2
    s.t. A1 x {senses} b1,  lb1 <= x <= ub1,
         eta_e >= alpha~_ek + beta~_ek @ x    (discounted cuts + incumbent cut)

through JuMP -> CPLEX every iteration (``add_regularization!``
src/sd_algorithm/cell.jl:130-134, ``optimize!(cell.master)``
src/sd_algorithm/algorithm.jl:105) and reads back both x and the cut duals
used for pruning (algorithm.jl:58-69). Here the master is a small dense QP
in z = [x; eta] solved fully on device by ADMM with a direct (Cholesky)
z-update — the problem stays tiny (nz = n1 + E <= a few hundred), so one
factorization per SD iteration is cheap and every ADMM step is two matvecs.

The QP is expressed in the OSQP canonical form

    min 1/2 z' diag(p) z + g' z   s.t.  l <= A z <= u

so the SD layer can express stage-1 rows, variable bounds, and cut rows
uniformly; dead cut slots pass a zero row with (-inf, +inf) bounds and their
multipliers converge to exactly 0.

Dual convention: the returned ``mu`` is the OSQP dual of l <= Az <= u
(mu <= 0 when the lower bound is active for a MIN problem). The JuMP dual
the reference's prune rule sees for a cut row (a '>=' constraint) is -mu;
pruning uses |mu| so the sign never matters (algorithm.jl:63).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sqlp_tpu.config import QPConfig

_PREC = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _pcg(M: jax.Array, b: jax.Array, x0: jax.Array, iters: int) -> jax.Array:
    """Jacobi-preconditioned CG for SPD M (dense, small).

    Factor-free on purpose: emulated-f64 Cholesky/triangular-solve inside a
    fori_loop crashes the TPU worker (observed on storm-size masters);
    CG uses only matvecs, which lower everywhere. Warm starts make the
    fixed iteration count cheap in the ADMM setting.
    """
    dinv = 1.0 / jnp.diag(M)

    def body(_, carry):
        x, r, p, rz = carry
        Mp = _dot(M, p)
        denom = jnp.dot(p, Mp)
        # Guard BOTH exact convergence and tiny denominators: at rz == 0
        # (an exactly-warm-started solve) the unguarded beta = rz_new/rz
        # is NaN, and x + 0*NaN = NaN — this poisoned a whole SD state on
        # ssn. 1e-30 is a normal f32, so the guard works in both dtypes.
        ok = jnp.logical_and(denom > 1e-30, rz > 1e-30)
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Mp
        z = dinv * r
        rz_new = jnp.dot(r, z)
        beta = jnp.where(rz > 1e-30, rz_new / jnp.where(rz > 1e-30, rz, 1.0),
                         0.0)
        return x, r, z + beta * p, rz_new

    r0 = b - _dot(M, x0)
    z0 = dinv * r0
    x, r, p, rz = jax.lax.fori_loop(
        0, iters, body, (x0, r0, z0, jnp.dot(r0, z0)))
    return x


@partial(jax.jit, static_argnames=("config",))
def solve_qp(p_diag: jax.Array, g: jax.Array, A: jax.Array,
             l: jax.Array, u: jax.Array, is_eq: jax.Array,
             config: QPConfig = QPConfig(),
             z0: Optional[jax.Array] = None,
             mu0: Optional[jax.Array] = None,
             rho_init: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array, dict]:
    """Solve min 1/2 z'diag(p)z + g'z s.t. l <= Az <= u by ADMM.

    Args:
      p_diag: [nz] diagonal of P (>= 0).
      g: [nz] linear term.
      A: [mA, nz] constraint matrix (zero rows allowed).
      l, u: [mA] row bounds (+-inf allowed).
      is_eq: [mA] bool marking equality rows (gets a stiffer ADMM penalty).
      config: static parameters.
      z0, mu0: optional warm start.
      rho_init: optional starting ADMM penalty (scalar) — pass the
        previous solve's adapted value (stats["qp_rho"]) when solving a
        sequence of closely related QPs (the SD master gains one cut row
        per iteration): adaptation otherwise re-walks the penalty scale
        from config.rho in sqrt(residual-ratio) steps every solve.

    Returns:
      (z, mu, stats).
    """
    mA, nz = A.shape
    out_dtype = A.dtype
    # The master is tiny but can be badly scale-mixed (storm: cut rows ~1e7
    # vs x bounds ~1e2) — f32 ADMM cannot reach per-row feasibility there.
    # Compute in f64 whenever the runtime allows it (TPU f64 emulation is
    # cheap at these sizes); inputs/outputs stay in the caller's dtype.
    # NOT on TPU by default: emulated-f64 in the chunked SD loop faults the
    # TPU worker at storm-size masters (kernel bug; reproduced with both
    # Cholesky and CG z-updates). SQLP_QP_F64=1 forces it on anyway.
    import os as _os
    _f64_default = "0" if jax.default_backend() == "tpu" else "1"
    if (jax.config.jax_enable_x64 and out_dtype != jnp.float64
            and _os.environ.get("SQLP_QP_F64", _f64_default) != "0"):
        dtype = jnp.dtype(jnp.float64)
        f = lambda a: jnp.asarray(a, dtype)
        p_diag, g, A, l, u = map(f, (p_diag, g, A, l, u))
        z0 = None if z0 is None else f(z0)
        mu0 = None if mu0 is None else f(mu0)
    else:
        dtype = out_dtype
    # f32 Cholesky round-off floors the achievable residual near 5e-5; an
    # unreachable tolerance would silently mark every master solve failed,
    # which disables the reference's cut pruning (algorithm.jl:57) and lets
    # pools grow to eviction. Clamp to a dtype-achievable tolerance.
    eff_tol = max(config.tol, 512.0 * float(jnp.finfo(dtype).eps))
    sig = jnp.asarray(config.sigma, dtype)
    alpha = jnp.asarray(config.over_relax, dtype)
    rho_vec = jnp.where(is_eq, config.rho * config.rho_eq_scale,
                        config.rho).astype(dtype)

    # --- OSQP-style problem scaling. SASA cut coefficients reach ~1e6 on
    # the shipped instances (baa99-20); unscaled, the f32 Cholesky of
    # A'A ~ 1e12 breaks down and ADMM emits NaNs. Ruiz-equilibrate A and
    # normalize the cost; solve scaled, report/terminate unscaled.
    def ruiz_body(_, carry):
        As, dr, dc = carry
        rn = jnp.sqrt(jnp.max(jnp.abs(As), axis=1))
        rn = jnp.where(rn > 0, rn, 1.0)
        As = As / rn[:, None]
        cn = jnp.sqrt(jnp.max(jnp.abs(As), axis=0))
        cn = jnp.where(cn > 0, cn, 1.0)
        As = As / cn[None, :]
        return As, dr / rn, dc / cn

    As, dr, dc = jax.lax.fori_loop(
        0, 10, ruiz_body,
        (A, jnp.ones((mA,), dtype), jnp.ones((nz,), dtype)))
    g_s = dc * g
    cost_s = 1.0 / jnp.maximum(1.0, jnp.max(jnp.abs(g_s)))
    p_s = cost_s * dc * dc * p_diag
    g_s = cost_s * g_s
    l_s = dr * l
    u_s = dr * u

    lc = jnp.where(jnp.isfinite(l_s), l_s, -1e30)
    uc = jnp.where(jnp.isfinite(u_s), u_s, 1e30)

    # warm starts arrive in original units
    z_w = jnp.zeros((nz,), dtype) if z0 is None else z0 / dc
    mu_w = jnp.zeros((mA,), dtype) if mu0 is None else cost_s * mu0 / dr

    n_rounds = max(1, config.max_iters // config.check_every)

    # Direct z-update via an explicit inverse computed once per refactor
    # (LU lowers fine on TPU in f32, ~0.7ms at master sizes); one iterative
    # -refinement step wipes the f32 inversion error. This replaces a
    # 25-iteration PCG per ADMM step — a per-step sequential chain of tiny
    # matvecs that made the master solve latency-bound on TPU (75 of the
    # 117 ms/iter ssn SD step). The PCG path remains only for emulated-f64
    # on TPU, where LU/Cholesky lowering faults the worker (see _pcg).
    use_inv = not (dtype == jnp.float64 and jax.default_backend() == "tpu")

    def _solve_spd(M, Minv, b, x0, pcg_iters=25):
        if Minv is None:
            return _pcg(M, b, x0, pcg_iters)
        x = _dot(Minv, b)
        return x + _dot(Minv, b - _dot(M, x))

    def factor(rho_s):
        """Build (M, Mi) for the z-update at penalty rho_s. Mi is the
        explicit inverse on the direct path; on the PCG path it is a dummy
        copy of M (kept so the while-loop carry has one fixed structure)."""
        rho_vec = jnp.where(is_eq, rho_s * config.rho_eq_scale, rho_s)
        M = jnp.diag(p_s + sig) + _dot(As.T * rho_vec[None, :], As)
        Mi = jnp.linalg.inv(M) if use_inv else M
        return M, Mi

    def one_step(carry, rho_vec, M, Minv):
        z, zeta, mu = carry
        rhs = sig * z - g_s + _dot(As.T, rho_vec * zeta - mu)
        z1 = _solve_spd(M, Minv, rhs, z)
        Az = _dot(As, z1)
        v = alpha * Az + (1.0 - alpha) * zeta
        zeta1 = jnp.clip(v + mu / rho_vec, lc, uc)
        mu1 = mu + rho_vec * (v - zeta1)
        return z1, zeta1, mu1

    def residuals(z, zeta, mu):
        """PER-ROW relative primal / per-component dual residuals in the
        ORIGINAL problem. A single global scale lets the dominant rows
        (storm cut rows ~1e7) mask multi-unit violations of small-scale
        rows (x bounds ~1e2), which poisoned the SD candidate."""
        zo = dc * z
        muo = (dr / cost_s) * mu
        Az = _dot(A, zo)
        zetao = zeta / dr
        pscale = 1.0 + jnp.maximum(jnp.abs(Az), jnp.abs(zetao))
        pres = jnp.max(jnp.abs(Az - zetao) / pscale)
        grad = p_diag * zo + g
        Atmu = _dot(A.T, muo)
        dscale = 1.0 + jnp.maximum(jnp.abs(grad), jnp.abs(Atmu))
        dres = jnp.max(jnp.abs(grad + Atmu) / dscale)
        return pres, dres

    def cond(carry):
        it, err, stalled = carry[3], carry[4], carry[9]
        return jnp.logical_and(
            jnp.logical_and(it < n_rounds, err > eff_tol),
            jnp.logical_not(stalled))

    # Fused VMEM-resident check interval (ops/pallas/admm_kernel.py): one
    # kernel launch replaces the ~10-op-per-iteration XLA chain whose
    # per-op launch latency dominates the master solve on TPU. f32 +
    # direct-inverse path only; the XLA loop remains for CPU and the
    # emulated-f64 escape hatch.
    use_pallas_round = (config.use_pallas and use_inv
                        and dtype == jnp.float32
                        and jax.default_backend() == "tpu")

    def round_step(carry):
        (z, zeta, mu, it, _, rho_s, err_best, winct, err_mark, _stalled,
         z_best, mu_best, restarts, M, Mi, hard_ct) = carry
        # (M, Mi) travel in the carry and are refactored at the END of a
        # round only when rho actually changed — most check intervals keep
        # rho (the adaptation deadband), and the [nz, nz] inverse was a
        # fixed ~25us tax per interval.
        rho_vec = jnp.where(is_eq, rho_s * config.rho_eq_scale, rho_s)
        if use_pallas_round:
            from sqlp_tpu.ops.pallas.admm_kernel import admm_round_pallas
            z, zeta, mu = admm_round_pallas(
                As, M, Mi, g_s, lc, uc, rho_vec, z, zeta, mu,
                config.check_every, config.over_relax, config.sigma)
        else:
            z, zeta, mu = jax.lax.fori_loop(
                0, config.check_every,
                lambda _, c: one_step(c, rho_vec, M,
                                      Mi if use_inv else None),
                (z, zeta, mu))
        pres, dres = residuals(z, zeta, mu)
        err = jnp.maximum(pres, dres)
        # Track the best iterate seen at a check point: under rho
        # adaptation the error oscillates around its (dtype) numeric
        # floor, so the LAST iterate can be far worse than the best.
        better = err < err_best
        z_best = jnp.where(better, z, z_best)
        mu_best = jnp.where(better, mu, mu_best)
        err_best = jnp.minimum(err, err_best)
        # Windowed stagnation test: every stall_rounds check intervals,
        # require >=3% cumulative improvement of the best error seen, else
        # give up — the iterate is at its numeric floor and further ADMM
        # rounds only burn max_iters. A consecutive-interval counter does
        # NOT work here: oscillation under rho adaptation produces a lucky
        # >=3% dip often enough to reset it (observed on ssn, where every
        # master solve ran the full budget at an err floor ~2e-4).
        winct = winct + 1
        window_done = winct >= config.stall_rounds
        improved = err_best < err_mark * 0.97
        stalled_win = jnp.logical_and(window_done, jnp.logical_not(improved))
        err_mark = jnp.where(window_done, err_best, err_mark)
        winct = jnp.where(window_done, 0, winct)
        # A stalled window first triggers a rho restart (below), because a
        # plateau is usually rho sitting inside the adaptation deadband —
        # observed on the lands compromise QP, which creeps at 1.6x tol for
        # ~4000 iterations until a late rebalance unlocks it. Only after
        # `stall_restarts` fruitless restarts do we declare a numeric floor
        # and give up (ssn f32 masters, whose floor sits above the clamped
        # tolerance). Best-iterate tracking makes restarts free.
        # The whole stall apparatus (forced kicks AND the give-up) only
        # engages when the plateau sits near the tolerance (a dtype floor);
        # a stall orders of magnitude out runs the full budget under the
        # plain deadband adaptation — forced decade-kicks there destroy
        # the gentle rebalance path that eventually unlocks such solves,
        # and returning a barely-feasible x breaks induced feasibility
        # downstream (see QPConfig.stall_tol_factor).
        # Hard cap: consecutive non-improving windows, counted regardless
        # of near_tol (see QPConfig.stall_hard_windows) — a solve floored
        # FAR from tolerance never passes near_tol and would otherwise
        # burn its whole budget returning the same iterate.
        hard_ct = jnp.where(window_done,
                            jnp.where(improved, 0, hard_ct + 1), hard_ct)
        hard_stalled = (jnp.asarray(config.stall_hard_windows > 0)
                        & (hard_ct >= config.stall_hard_windows))
        near_tol = err_best <= config.stall_tol_factor * eff_tol
        stalled_win = jnp.logical_and(stalled_win, near_tol)
        restarts = jnp.where(stalled_win, restarts + 1, restarts)
        stalled = jnp.logical_or(
            jnp.logical_and(stalled_win, restarts > config.stall_restarts),
            hard_stalled)
        # OSQP rho adaptation: rebalance the penalty toward the lagging
        # residual (refactorization is O(nz^3) on a tiny matrix, once per
        # check interval). Fixed rho stalls on badly conditioned masters.
        ratio = jnp.sqrt((pres + 1e-20) / (dres + 1e-20))
        adapt = jnp.logical_or(ratio > 2.0, ratio < 0.5)
        # forced rebalance on a stalled window: jump AT LEAST a decade
        # toward the lagging residual — the gentle `ratio` scaling is what
        # was already creeping (the lands compromise QP sits at ratio~1.3,
        # pres lagging, moving ~0.5%/check; nudging rho by 1.3x per window
        # never escapes). If the residuals are balanced (ratio ~ 1), the
        # decade direction alternates to probe both ADMM regimes.
        alt = jnp.where(restarts % 2 == 0, 10.0, 0.1).astype(dtype)
        big = jnp.where(ratio >= 1.0, jnp.maximum(ratio, 10.0),
                        jnp.minimum(ratio, 0.1))
        forced = jnp.where(jnp.abs(jnp.log(ratio)) > 0.2, big, alt)
        scale = jnp.where(stalled_win, forced, jnp.where(adapt, ratio, 1.0))
        rho_s = jnp.clip(rho_s * scale, 1e-6, 1e6)
        # Self-healing: if any iterate went non-finite (overflow in a badly
        # warm-started round), restart this solve from zeros instead of
        # carrying NaN out of the while_loop into the SD state.
        finite = jnp.logical_and(
            jnp.all(jnp.isfinite(z)),
            jnp.logical_and(jnp.all(jnp.isfinite(zeta)),
                            jnp.all(jnp.isfinite(mu))))
        z = jnp.where(finite, z, jnp.zeros_like(z))
        zeta = jnp.where(finite, zeta, jnp.zeros_like(zeta))
        mu = jnp.where(finite, mu, jnp.zeros_like(mu))
        err = jnp.where(finite, err, jnp.asarray(jnp.inf, err.dtype))
        # keep the pre-blow-up best; only the window bookkeeping restarts
        winct = jnp.where(finite, winct, 0)
        err_mark = jnp.where(finite, err_mark, jnp.asarray(jnp.inf, dtype))
        stalled = jnp.where(finite, stalled, False)
        rho_s = jnp.where(finite, rho_s, jnp.asarray(config.rho, dtype))
        hard_ct = jnp.where(finite, hard_ct, 0)
        changed = jnp.logical_or(scale != 1.0, jnp.logical_not(finite))
        M, Mi = jax.lax.cond(changed, factor, lambda _: (M, Mi), rho_s)
        return (z, zeta, mu, it + 1, err, rho_s, err_best, winct, err_mark,
                stalled, z_best, mu_best, restarts, M, Mi, hard_ct)

    rho0 = jnp.asarray(config.rho, dtype)
    rho_w = rho0 if rho_init is None else jnp.clip(
        jnp.asarray(rho_init, dtype), 1e-6, 1e6)

    def _run(z_init, mu_init, rho_start):
        """Full ADMM loop from one starting point; returns the best
        check-point iterate (not the last one — they differ when the loop
        stops on stall or budget mid-oscillation) plus the adapted rho."""
        zeta0 = jnp.clip(_dot(As, z_init), lc, uc)
        M0, Mi0 = factor(rho_start)
        init = (z_init, zeta0, mu_init, jnp.zeros((), jnp.int32),
                jnp.asarray(jnp.inf, dtype), rho_start,
                jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
                jnp.asarray(jnp.inf, dtype), jnp.asarray(False),
                z_init, mu_init, jnp.zeros((), jnp.int32), M0, Mi0,
                jnp.zeros((), jnp.int32))
        (z_last, _, mu_last, rounds, err_last, rho_last, err_best, _, _, _,
         z_best, mu_best, _, _, _, _) = jax.lax.while_loop(
            cond, round_step, init)
        use_best = err_best < err_last
        zr = jnp.where(use_best, z_best, z_last)
        mur = jnp.where(use_best, mu_best, mu_last)
        return zr, mur, jnp.minimum(err_best, err_last), rounds, rho_last

    z, mu, err, rounds, rho_out = _run(z_w, mu_w, rho_w)
    if (z0 is not None or mu0 is not None) and config.warm_retry:
        # A STALE warm start can trap ADMM for the whole budget: after the
        # cut pool changes (insert/evict + incumbent-cut refresh) the
        # previous master's (z, mu) pins the iterate in a basin where the
        # rho-adaptation deadband never rebalances, and the solve exits at
        # err ~1e-2 — a first-stage violation of whole units that, once
        # accepted as incumbent, makes the MC evaluator's recourse LPs
        # infeasible (observed on lands, seed 5, iteration 85: cold start
        # converges to 3e-16, the warm start stalls at 1.7e-2 for 4000
        # iterations). When a warm-started solve misses tolerance, re-run
        # cold and keep the better iterate; warm starts stay the fast path.
        def _retry(_):
            # cold retry also resets rho: a carried penalty can be part of
            # the same trap as the stale (z, mu)
            zc, muc, errc, rc, rhoc = _run(jnp.zeros((nz,), dtype),
                                           jnp.zeros((mA,), dtype), rho0)
            better = errc < err
            return (jnp.where(better, zc, z), jnp.where(better, muc, mu),
                    jnp.minimum(errc, err), rounds + rc,
                    jnp.where(better, rhoc, rho_out))

        # Retry only a solve that is FAR from tolerance (the stale-trap
        # regime, err ~1e-2) — a warm solve at its dtype floor (a few
        # times eff_tol) gets the same floor from a cold start, and on
        # instances whose f32 masters always floor (storm) the
        # unconditional retry doubled every master solve.
        retry_at = jnp.asarray(config.warm_retry_factor * eff_tol, dtype)
        z, mu, err, rounds, rho_out = jax.lax.cond(
            err <= retry_at, lambda _: (z, mu, err, rounds, rho_out),
            _retry, None)

    # ---- OSQP-style polish: the ADMM termination test is relative to the
    # largest row scale, so on mixed-scale masters (storm: cut rows ~1e7,
    # x-bound rows ~1e2) "converged" can hide multi-unit bound violations.
    # Solve the active-set KKT system exactly (dense Schur solve; inactive
    # rows decouple through a masked regularized saddle system) and keep
    # the polished point if its true KKT error is smaller.
    #
    # The active set is REFINED over a few passes (drop wrong-sign
    # multipliers, add violated rows) rather than read once from mu: after
    # a stall-cutoff exit the best ADMM iterate can carry a mid-rho-kick mu
    # whose magnitudes misclassify near-active rows (observed on the lands
    # compromise QP, where the one-shot polish failed from the stalled
    # iterate but succeeds from the settled full-budget one).
    def kkt_err(zs, mus):
        zo = dc * zs
        muo = (dr / cost_s) * mus
        Az = _dot(A, zo)
        pviol = jnp.maximum(jnp.maximum(
            jnp.where(jnp.isfinite(l), l - Az, 0.0),
            jnp.where(jnp.isfinite(u), Az - u, 0.0)), 0.0)
        pres = jnp.max(pviol / (1.0 + jnp.abs(Az)))
        grad = p_diag * zo + g
        dres = jnp.max(jnp.abs(grad + _dot(A.T, muo))
                       / (1.0 + jnp.abs(grad)))
        e = jnp.maximum(pres, dres)
        # NaN-safe: a blown-up candidate (e.g. a singular dual-repair
        # solve producing NaN multipliers) must rank as worthless, not
        # poison the running best via jnp.minimum's NaN propagation —
        # observed as qp_err = NaN in storm run stats while the kept
        # iterate itself was guarded and fine.
        return jnp.where(jnp.isfinite(e), e, jnp.asarray(jnp.inf, dtype))

    delta = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-5, dtype)
    pt_inv = 1.0 / (p_s + delta)
    eye = jnp.eye(mA, dtype=dtype)
    fin_l = l_s > -1e29
    fin_u = u_s < 1e29

    # Active-set seeds. Dual magnitude (relative threshold only: mu lives
    # in scaled units where any absolute floor swamps the signal) is exact
    # when the ADMM iterate has settled; primal proximity additionally
    # captures rows whose multiplier is still noisy after a stall-cutoff
    # exit. Neither dominates: proximity can over-constrain a degenerate
    # QP (weakly-active rows forced as equalities push the primal off),
    # dual-only can miss rows a mid-kick mu underestimates — so BOTH seeds
    # are refined below and the best KKT iterate wins.
    act_eps = 1e-4 * jnp.max(jnp.abs(mu)) + 1e-30
    Az_s = _dot(As, z)
    near_l = jnp.logical_and(fin_l, Az_s - lc < 1e-5 * (1.0 + jnp.abs(lc)))
    near_u = jnp.logical_and(fin_u, uc - Az_s < 1e-5 * (1.0 + jnp.abs(uc)))
    strong = jnp.abs(mu) > act_eps
    active_union = jnp.logical_or(strong, jnp.logical_or(near_l, near_u))
    # per-row side: the sign of mu where it speaks, else the nearer bound
    side_l = jnp.where(strong, mu < 0, near_l)

    def polish_pass(carry):
        side_l, active, nu0 = carry
        b_act = jnp.where(side_l, lc, uc)
        usable = jnp.logical_and(active, jnp.abs(b_act) < 1e29)
        w = usable.astype(dtype)
        # SPD Schur-complement solve of the masked saddle system (avoids
        # LU, which the TPU f64 path does not lower): Pt = diag(p_s)+delta,
        #   (A_w Pt^-1 A_w' + delta I) nu = A_w Pt^-1 (-g_s) - w b_act
        #   z = Pt^-1 (-g_s - A_w' nu);  inactive rows decouple to nu=0.
        Aw = As * w[:, None]
        S = _dot(Aw * pt_inv[None, :], Aw.T) + delta * eye
        Sinv = jnp.linalg.inv(S) if use_inv else None
        rhs = _dot(Aw, pt_inv * (-g_s)) - w * b_act
        nu = _solve_spd(S, Sinv, rhs, nu0 * w, pcg_iters=200) * w
        z_pol = pt_inv * (-g_s - _dot(Aw.T, nu))
        # iterative refinement against the UNregularized KKT system: the
        # delta-regularized solve is only delta-accurate, which leaves the
        # polished KKT error ~1.6x above a 1e-7 tolerance on the lands
        # compromise QP. Two correction solves push it to machine level.
        for _ in range(2):
            r_z = -g_s - p_s * z_pol - _dot(Aw.T, nu)
            r_nu = w * b_act - _dot(Aw, z_pol)
            dnu = _solve_spd(S, Sinv, _dot(Aw, pt_inv * r_z) - r_nu,
                             jnp.zeros_like(nu), pcg_iters=200) * w
            z_pol = z_pol + pt_inv * (r_z - _dot(Aw.T, dnu))
            nu = nu + dnu
        # refinement: drop rows whose multiplier has the wrong sign for
        # their side (lower-active needs nu <= 0), re-add rows the polished
        # point violates, on the violated side.
        Az = _dot(As, z_pol)
        wrong = jnp.where(side_l, nu > act_eps, nu < -act_eps)
        viol_l = jnp.logical_and(fin_l,
                                 Az < lc - 1e-9 * (1.0 + jnp.abs(lc)))
        viol_u = jnp.logical_and(fin_u,
                                 Az > uc + 1e-9 * (1.0 + jnp.abs(uc)))
        active1 = jnp.logical_or(jnp.logical_and(usable, ~wrong),
                                 jnp.logical_or(viol_l, viol_u))
        side_l1 = jnp.where(viol_l, True, jnp.where(viol_u, False, side_l))
        return (side_l1, active1, nu), (z_pol, nu)

    err_admm = kkt_err(z, mu)
    best_z, best_mu, best_err = z, mu, err_admm
    for seed in (strong, active_union):
        carry = (side_l, seed, mu)
        for _ in range(3):
            carry, (z_pol, nu) = polish_pass(carry)
            finite = jnp.logical_and(jnp.all(jnp.isfinite(z_pol)),
                                     jnp.all(jnp.isfinite(nu)))
            err_pol = jnp.where(finite, kkt_err(z_pol, nu),
                                jnp.asarray(jnp.inf, dtype))
            take = err_pol < best_err
            best_z = jnp.where(take, z_pol, best_z)
            best_mu = jnp.where(take, nu, best_mu)
            best_err = jnp.minimum(err_pol, best_err)
    # Final candidate: primal repair of the best iterate. An ADMM exit is
    # often primal-lagging (dres 1e-9, pres 2e-7 on the lands compromise
    # QP) at a weakly-separated vertex where no active-set seed
    # discriminates the spurious row; relaxed hyperplane-projection sweeps
    # on the violated rows close the primal gap with an O(violation) move
    # that leaves dual stationarity intact (the gradient shifts by
    # p_diag * dz ~ p * pres).
    rown2 = jnp.maximum(jnp.sum(As * As, axis=1), 1e-30)

    def _repair(_, zc):
        Az = _dot(As, zc)
        viol = (jnp.maximum(Az - uc, 0.0) + jnp.minimum(Az - lc, 0.0))
        return zc - _dot(As.T, viol / rown2)

    z_rep = jax.lax.fori_loop(0, 4, _repair, best_z)
    err_rep = kkt_err(z_rep, best_mu)
    take_rep = jnp.logical_and(jnp.all(jnp.isfinite(z_rep)),
                               err_rep < best_err)
    best_z = jnp.where(take_rep, z_rep, best_z)
    best_err = jnp.minimum(err_rep, best_err)

    # ... and the dual analog for dual-lagging exits (pres 2e-8, dres
    # 1.4e-7 seen on a batched-replication compromise QP): one regularized
    # least-squares multiplier correction against the stationarity
    # residual over the rows tight at (or dual-supported by) the kept
    # iterate, leaving the primal untouched.
    Azb = _dot(As, best_z)
    tight = jnp.logical_or(
        jnp.logical_and(fin_l, Azb - lc < 1e-6 * (1.0 + jnp.abs(lc))),
        jnp.logical_and(fin_u, uc - Azb < 1e-6 * (1.0 + jnp.abs(uc))))
    wd = jnp.logical_or(jnp.abs(best_mu) > act_eps, tight).astype(dtype)
    r_s = p_s * best_z + g_s + _dot(As.T, best_mu)
    Awd = As * wd[:, None]
    Sd = _dot(Awd, Awd.T) + delta * eye
    Sdinv = jnp.linalg.inv(Sd) if use_inv else None
    dmu = _solve_spd(Sd, Sdinv, -_dot(Awd, r_s),
                     jnp.zeros_like(best_mu), pcg_iters=200) * wd
    mu_rep = best_mu + dmu
    err_drep = kkt_err(best_z, mu_rep)
    take_drep = jnp.logical_and(jnp.all(jnp.isfinite(mu_rep)),
                                err_drep < best_err)
    best_mu = jnp.where(take_drep, mu_rep, best_mu)
    best_err = jnp.minimum(err_drep, best_err)

    z, mu, err_final = best_z, best_mu, best_err
    take = err_final < err_admm

    stats = {
        "qp_iters": rounds * config.check_every,
        # stats stay in the caller's dtype: an f64 scalar leaking into the
        # sd_run accumulator creates f64 scatters inside the outer loop
        "qp_err": err_final.astype(out_dtype),
        "qp_polished": take,
        "qp_converged": jnp.logical_or(err <= eff_tol, err_final <= eff_tol),
        # adapted penalty, for warm-starting the next related solve
        "qp_rho": rho_out.astype(out_dtype),
    }
    return ((dc * z).astype(out_dtype),
            ((dr / cost_s) * mu).astype(out_dtype), stats)
