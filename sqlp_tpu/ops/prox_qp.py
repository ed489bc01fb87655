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
             mu0: Optional[jax.Array] = None
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
    z = jnp.zeros((nz,), dtype) if z0 is None else z0 / dc
    mu = jnp.zeros((mA,), dtype) if mu0 is None else cost_s * mu0 / dr

    n_rounds = max(1, config.max_iters // config.check_every)

    def factor(rho_s):
        rho_vec = jnp.where(is_eq, rho_s * config.rho_eq_scale, rho_s)
        M = jnp.diag(p_s + sig) + _dot(As.T * rho_vec[None, :], As)
        return rho_vec, M

    def one_step(carry, rho_vec, M):
        z, zeta, mu = carry
        rhs = sig * z - g_s + _dot(As.T, rho_vec * zeta - mu)
        z1 = _pcg(M, rhs, z, 25)
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
        it, err = carry[3], carry[4]
        return jnp.logical_and(it < n_rounds, err > eff_tol)

    def round_step(carry):
        z, zeta, mu, it, _, rho_s = carry
        rho_vec, M = factor(rho_s)
        z, zeta, mu = jax.lax.fori_loop(
            0, config.check_every,
            lambda _, c: one_step(c, rho_vec, M), (z, zeta, mu))
        pres, dres = residuals(z, zeta, mu)
        err = jnp.maximum(pres, dres)
        # OSQP rho adaptation: rebalance the penalty toward the lagging
        # residual (refactorization is O(nz^3) on a tiny matrix, once per
        # check interval). Fixed rho stalls on badly conditioned masters.
        ratio = jnp.sqrt((pres + 1e-20) / (dres + 1e-20))
        adapt = jnp.logical_or(ratio > 2.0, ratio < 0.5)
        rho_s = jnp.where(adapt, jnp.clip(rho_s * ratio, 1e-6, 1e6), rho_s)
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
        rho_s = jnp.where(finite, rho_s, jnp.asarray(config.rho, dtype))
        return z, zeta, mu, it + 1, err, rho_s

    rho0 = jnp.asarray(config.rho, dtype)
    rho_vec0, _ = factor(rho0)
    zeta = jnp.clip(_dot(As, z), lc, uc)
    init = (z, zeta, mu, jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, dtype), rho0)
    z, zeta, mu, rounds, err, rho_s = jax.lax.while_loop(
        cond, round_step, init)

    # ---- OSQP-style polish: the ADMM termination test is relative to the
    # largest row scale, so on mixed-scale masters (storm: cut rows ~1e7,
    # x-bound rows ~1e2) "converged" can hide multi-unit bound violations.
    # Solve the active-set KKT system exactly (one dense solve; inactive
    # rows decouple through a masked regularized saddle system) and keep
    # the polished point if its true KKT error is smaller.
    # relative threshold only: mu lives in scaled units (cost scaling can
    # put max|mu| near 1e-2, where any absolute floor swamps the signal)
    act_eps = 1e-4 * jnp.max(jnp.abs(mu)) + 1e-30
    active = jnp.abs(mu) > act_eps
    b_act = jnp.where(mu < 0, lc, uc)
    usable = jnp.logical_and(active, jnp.abs(b_act) < 1e29)
    w = usable.astype(dtype)
    delta = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-5, dtype)
    # SPD Schur-complement solve of the masked saddle system (avoids LU,
    # which the TPU f64 path does not lower): with Pt = diag(p_s) + delta,
    #   (A_w Pt^-1 A_w' + delta I) nu = A_w Pt^-1 (-g_s) - w b_act
    #   z = Pt^-1 (-g_s - A_w' nu)
    # inactive rows decouple to nu_i = 0.
    pt_inv = 1.0 / (p_s + delta)
    Aw = As * w[:, None]
    S = _dot(Aw * pt_inv[None, :], Aw.T) + delta * jnp.eye(mA, dtype=dtype)
    rhs = _dot(Aw, pt_inv * (-g_s)) - w * b_act
    nu = _pcg(S, rhs, mu, 200)
    nu = nu * w
    z_pol = pt_inv * (-g_s - _dot(Aw.T, nu))
    mu_pol = nu

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
        return jnp.maximum(pres, dres)

    err_admm = kkt_err(z, mu)
    err_pol = kkt_err(z_pol, mu_pol)
    finite = jnp.logical_and(jnp.all(jnp.isfinite(z_pol)),
                             jnp.all(jnp.isfinite(nu)))
    take = jnp.logical_and(finite, err_pol < err_admm)
    z = jnp.where(take, z_pol, z)
    mu = jnp.where(take, mu_pol, mu)
    err_final = jnp.minimum(err_pol, err_admm)

    stats = {
        "qp_iters": rounds * config.check_every,
        # stats stay in the caller's dtype: an f64 scalar leaking into the
        # sd_run accumulator creates f64 scatters inside the outer loop
        "qp_err": err_final.astype(out_dtype),
        "qp_polished": take,
        "qp_converged": jnp.logical_or(err <= eff_tol, err_final <= eff_tol),
    }
    return ((dc * z).astype(out_dtype),
            ((dr / cost_s) * mu).astype(out_dtype), stats)
