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
    dtype = A.dtype
    # f32 Cholesky round-off floors the achievable residual near 5e-5; an
    # unreachable tolerance would silently mark every master solve failed,
    # which disables the reference's cut pruning (algorithm.jl:57) and lets
    # pools grow to eviction. Clamp to a dtype-achievable tolerance.
    eff_tol = max(config.tol, 512.0 * float(jnp.finfo(dtype).eps))
    sig = jnp.asarray(config.sigma, dtype)
    alpha = jnp.asarray(config.over_relax, dtype)
    rho_vec = jnp.where(is_eq, config.rho * config.rho_eq_scale,
                        config.rho).astype(dtype)

    M = jnp.diag(p_diag + sig) + _dot(A.T * rho_vec[None, :], A)
    chol = jnp.linalg.cholesky(M)

    lc = jnp.where(jnp.isfinite(l), l, -1e30)
    uc = jnp.where(jnp.isfinite(u), u, 1e30)

    z = jnp.zeros((nz,), dtype) if z0 is None else z0
    mu = jnp.zeros((mA,), dtype) if mu0 is None else mu0
    zeta = jnp.clip(_dot(A, z), lc, uc)

    n_rounds = max(1, config.max_iters // config.check_every)

    def one_step(carry):
        z, zeta, mu = carry
        rhs = sig * z - g + _dot(A.T, rho_vec * zeta - mu)
        z1 = jax.scipy.linalg.cho_solve((chol, True), rhs)
        Az = _dot(A, z1)
        v = alpha * Az + (1.0 - alpha) * zeta
        zeta1 = jnp.clip(v + mu / rho_vec, lc, uc)
        mu1 = mu + rho_vec * (v - zeta1)
        return z1, zeta1, mu1

    def residuals(z, zeta, mu):
        Az = _dot(A, z)
        pres = jnp.max(jnp.abs(Az - zeta))
        pscale = 1.0 + jnp.maximum(jnp.max(jnp.abs(Az)), jnp.max(jnp.abs(zeta)))
        dres = jnp.max(jnp.abs(p_diag * z + g + _dot(A.T, mu)))
        dscale = 1.0 + jnp.maximum(jnp.max(jnp.abs(p_diag * z + g)),
                                   jnp.max(jnp.abs(_dot(A.T, mu))))
        return jnp.maximum(pres / pscale, dres / dscale)

    def cond(carry):
        _, _, _, it, err = carry
        return jnp.logical_and(it < n_rounds, err > eff_tol)

    def round_step(carry):
        z, zeta, mu, it, _ = carry
        z, zeta, mu = jax.lax.fori_loop(
            0, config.check_every, lambda _, c: one_step(c), (z, zeta, mu))
        err = residuals(z, zeta, mu)
        return z, zeta, mu, it + 1, err

    init = (z, zeta, mu, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, dtype))
    z, zeta, mu, rounds, err = jax.lax.while_loop(cond, round_step, init)

    stats = {
        "qp_iters": rounds * config.check_every,
        "qp_err": err,
        "qp_converged": err <= eff_tol,
    }
    return z, mu, stats
