"""Pallas TPU kernel: fused ADMM check interval for the master prox-QP.

The master QP (ops/prox_qp.py) is tiny — nz = n1+E (~100) variables,
mA = m1+n1+E*K+E (~200-900) rows — but its OSQP-style ADMM runs thousands
of strictly sequential iterations per SD step, each a chain of ~10
vector-size XLA ops paying per-op launch latency (~6us/iteration measured
on ssn masters; ~2700 iterations per mid-run SD step makes the master the
single largest slice of the iteration). This kernel runs one whole check
interval (QPConfig.check_every iterations, typically 25) with the
constraint matrix, the factorized z-update inverse, and all iterate
vectors VMEM-resident, so one launch replaces ~250 op dispatches.

Everything is exact f32 (HIGHEST dots): the master is the
precision-critical solve in the pipeline (storm-scale masters already sit
at the f32 residual floor) and at [1, nz] x [nz, nz] sizes the extra MXU
passes are latency-noise.

M and Minv are symmetric (M = diag(p)+sigma + As' diag(rho) As, SPD), so
the row-vector iterates multiply them without explicit transposes;
As-products contract the matching axis via dot_general dimension numbers.

Used by solve_qp on the f32 TPU path only; the XLA loop remains for CPU
and the emulated-f64 escape hatch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _rowdot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               precision=_PREC,
                               preferred_element_type=jnp.float32)


def _kernel(n_inner: int, alpha: float, sigma: float,
            As_ref, M_ref, Minv_ref, g_ref, lc_ref, uc_ref, rho_ref,
            z_ref, zeta_ref, mu_ref,
            zout_ref, zetaout_ref, muout_ref):
    As = As_ref[:]                    # [mA, nz]
    M = M_ref[:]                      # [nz, nz] (symmetric)
    Minv = Minv_ref[:]                # [nz, nz] (symmetric)
    g = g_ref[:]                      # [1, nz]
    lc = lc_ref[:]                    # [1, mA]
    uc = uc_ref[:]                    # [1, mA]
    rho = rho_ref[:]                  # [1, mA]
    rho_inv = 1.0 / rho

    def body(_, carry):
        z, zeta, mu = carry           # [1, nz], [1, mA], [1, mA]
        # rhs = sigma z - g + As' (rho zeta - mu)       [1, nz]
        rhs = sigma * z - g + _rowdot(rho * zeta - mu, As, ((1,), (0,)))
        # z-update: explicit inverse + one iterative-refinement step
        # (matches _solve_spd in ops/prox_qp.py)
        x = _rowdot(rhs, Minv, ((1,), (0,)))
        x = x + _rowdot(rhs - _rowdot(x, M, ((1,), (0,))), Minv,
                        ((1,), (0,)))
        Az = _rowdot(x, As, ((1,), (1,)))               # [1, mA]
        v = alpha * Az + (1.0 - alpha) * zeta
        zeta1 = jnp.clip(v + mu * rho_inv, lc, uc)
        mu1 = mu + rho * (v - zeta1)
        return x, zeta1, mu1

    z, zeta, mu = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_inner), body,
        (z_ref[:], zeta_ref[:], mu_ref[:]))
    zout_ref[:] = z
    zetaout_ref[:] = zeta
    muout_ref[:] = mu


@partial(jax.jit, static_argnames=("n_inner", "alpha", "sigma"))
def admm_round_pallas(As, M, Minv, g_s, lc, uc, rho_vec, z, zeta, mu,
                      n_inner: int, alpha: float, sigma: float):
    """Run n_inner ADMM steps on the SCALED problem; returns (z, zeta, mu).

    As: [mA, nz]; M, Minv: [nz, nz] symmetric; g_s: [nz]; lc, uc, rho_vec:
    [mA] (finite bound sentinels substituted); z: [nz]; zeta, mu: [mA].
    """
    mA, nz = As.shape
    dt = As.dtype
    assert dt == jnp.float32, dt
    row = lambda a: a.reshape(1, -1)

    full = lambda a, b: pl.BlockSpec((a, b), lambda: (0, 0),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, n_inner, float(alpha), float(sigma)),
        in_specs=[
            full(mA, nz),            # As
            full(nz, nz),            # M
            full(nz, nz),            # Minv
            full(1, nz),             # g_s
            full(1, mA),             # lc
            full(1, mA),             # uc
            full(1, mA),             # rho_vec
            full(1, nz),             # z
            full(1, mA),             # zeta
            full(1, mA),             # mu
        ],
        out_specs=[full(1, nz), full(1, mA), full(1, mA)],
        out_shape=[
            jax.ShapeDtypeStruct((1, nz), dt),
            jax.ShapeDtypeStruct((1, mA), dt),
            jax.ShapeDtypeStruct((1, mA), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_inner * (2 * mA * nz + 3 * nz * nz),
            bytes_accessed=(mA * nz + 2 * nz * nz + 4 * mA + 2 * nz) * 4,
            transcendentals=0,
        ),
    )
    # 32-bit index types regardless of the surrounding x64 mode (Mosaic
    # cannot legalize i64 index computations)
    with jax.enable_x64(False):
        zo, zetao, muo = call(As, M, Minv, row(g_s), row(lc), row(uc),
                              row(rho_vec), row(z), row(zeta), row(mu))
    return zo[0], zetao[0], muo[0]
