"""Pallas TPU kernel: fused PDHG round (many iterations, VMEM-resident).

The XLA while_loop formulation of the PDHG recursion streams the [B, n]
primal and [B, m] dual panels through HBM on every iteration (~90 MB per
iteration on ssn at B=4096 — memory-bound, ~110us/iter). This kernel runs a
whole round of ``n_inner`` iterations per batch block with K, the block's
iterates, and the running averages all resident in VMEM, so iterations cost
only MXU time.

Grid: one program per batch block of ``BLK`` scenarios (TPU grid programs
run sequentially per core; locality, not parallelism, is the point — K and
the block state load once per block instead of once per iteration).

Shapes are padded by the caller: B to a multiple of BLK. m and n may be
unaligned; Mosaic pads tiles internally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128  # batch rows per grid step (large-panel default)


# VMEM residency budget for a single-step mid-size block (see pick_blk);
# conservative against the ~16 MB/core capacity because Mosaic also keeps
# loop temporaries (G, S, the reflected iterate) live across the fused round.
_VMEM_BUDGET = 10 * 1024 * 1024


def pick_blk(batch: int, m: int = 0, n: int = 0) -> int:
    """Batch block for a given panel size.

    Large panels (>= 4*BLK) tile at 128 rows (best MXU row utilization).
    Small panels — the SD step solves 2EB elements, usually 2 — round up
    to the f32 sublane multiple (8) instead: padding 2 -> 128 wastes 64x
    the compute and was measured SLOWER than the XLA loop, while 2 -> 8
    keeps the VMEM-resident round's latency advantage (the XLA loop
    pays ~3us of kernel dispatch per PDHG iteration at this size).

    Mid-size panels (128 < batch < 512) run as ONE grid step sized to the
    batch (rounded to the sublane multiple) when the kernel's VMEM
    residency fits the budget, so B=136 pads to 136 rather than to 256;
    pass (m, n) to enable the check. When m/n are unknown or the block
    would not fit, fall back to 128-row tiling (pad to the next multiple
    of 128 — at most 2x compute, and only on panels large enough that the
    per-iteration dispatch saving still dominates).
    """
    if batch >= 4 * BLK:
        return BLK
    blk = max(8, -(-batch // 8) * 8)
    if blk <= BLK:
        return blk
    if m and n:
        # K plus ~6 live row-panels each of [blk, m] and [blk, n], f32.
        vmem = 4 * (m * n + 6 * blk * (m + n))
        if vmem <= _VMEM_BUDGET:
            return blk
    return BLK


def _split_bf16(x):
    """Split f32 into (hi, lo) bfloat16 parts: x ~ hi + lo to ~16 mantissa
    bits; three bf16 MXU passes then give ~bf16x3 (f32-grade) dot accuracy
    at half the cost of Mosaic's 6-pass HIGHEST."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(ahi, alo, bhi, blo, dims):
    """bf16x3 dot_general: hi*hi + hi*lo + lo*hi, f32 accumulation."""
    d = lambda a, b: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


def _make_dots(exact: bool):
    """Dot strategy for the fused round.

    bf16x3 (~f32-grade, half the MXU cost of full f32 emulation) is the
    default everywhere: a fixed-state A/B on ssn/storm B=2 solves showed
    iteration counts matching the exact-f32 XLA loop while exact f32
    (HIGHEST) in-kernel ran ~50% slower per iteration with no iteration
    advantage. The exact path is kept behind PDHGConfig.pallas_exact_small
    for instances where the bf16x3 rounding might bite.
    """
    if exact:
        split = lambda x: (x, None)

        def dot(ahi, alo, bhi, blo, dims):
            return jax.lax.dot_general(
                ahi, bhi, (dims, ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        return split, dot
    return _split_bf16, _dot3


def _kernel(n_inner: int, exact: bool,
            K_ref, q_ref, lb_ref, ub_ref, eqmask_ref, ht_ref,
            tau_ref, sig_ref, Y_ref, L_ref,
            Yout_ref, Lout_ref, Ysum_ref, Lsum_ref):
    K = K_ref[:]                      # [m, n]
    q = q_ref[:]                      # [1, n] shared or [BLK, n] per-element
    lb = lb_ref[:]                    # [1, n]
    ub = ub_ref[:]                    # [1, n]
    eq = eqmask_ref[:]                # [1, m]  (1.0 where '==')
    ht = ht_ref[:]                    # [BLK, m]
    tau = tau_ref[:]                  # [BLK, 1]
    sig = sig_ref[:]                  # [BLK, 1]

    split, dot = _make_dots(exact)
    Khi, Klo = split(K)               # constant across the round

    def body(_, carry):
        Y, L, Ys, Ls = carry
        Lhi, Llo = split(L)
        # G = q - L K           [BLK, n]
        G = q - dot(Lhi, Llo, Khi, Klo, ((1,), (0,)))
        Y1 = jnp.clip(Y - tau * G, lb, ub)
        Yb = 2.0 * Y1 - Y
        Ybhi, Yblo = split(Yb)
        # S = ht - (2 Y1 - Y) K'   [BLK, m]
        S = ht - dot(Ybhi, Yblo, Khi, Klo, ((1,), (1,)))
        Lr = L + sig * S
        L1 = eq * Lr + (1.0 - eq) * jnp.maximum(Lr, 0.0)
        return Y1, L1, Ys + Y1, Ls + L1

    Y0 = Y_ref[:]
    L0 = L_ref[:]
    # int32 bounds: under an x64-enabled runtime python ints trace as i64,
    # which Mosaic cannot legalize ("failed to legalize func.return (i64)")
    Y, L, Ys, Ls = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_inner), body,
        (Y0, L0, jnp.zeros_like(Y0), jnp.zeros_like(L0)))
    Yout_ref[:] = Y
    Lout_ref[:] = L
    inv = 1.0 / n_inner
    Ysum_ref[:] = Ys * inv
    Lsum_ref[:] = Ls * inv


def _kernel_halpern(n_inner: int, exact: bool,
                    K_ref, q_ref, lb_ref, ub_ref, eqmask_ref, ht_ref,
                    tau_ref, sig_ref, Y_ref, L_ref, kh_ref,
                    Yanc_ref, Lanc_ref,
                    Yout_ref, Lout_ref, Ycand_ref, Lcand_ref):
    """Reflected-Halpern round (r2HPDHG / cuPDLP+ scheme):

        z_{k+1} = (k+1)/(k+2) * (2 T(z_k) - z_k) + 1/(k+2) * z_anchor

    with T one PDHG step. The raw carry z may leave the dual cone /
    primal box (the reflection is unprojected); the FEASIBLE candidate is
    T(z), returned separately for residual checks and restarts.
    """
    K = K_ref[:]
    q = q_ref[:]
    lb = lb_ref[:]
    ub = ub_ref[:]
    eq = eqmask_ref[:]
    ht = ht_ref[:]
    tau = tau_ref[:]
    sig = sig_ref[:]
    kh = kh_ref[:]                    # [BLK, 1] steps since anchor reset
    Yanc = Yanc_ref[:]
    Lanc = Lanc_ref[:]

    split, dot = _make_dots(exact)
    Khi, Klo = split(K)

    def body(t, carry):
        Y, L, _, _ = carry
        Lhi, Llo = split(L)
        G = q - dot(Lhi, Llo, Khi, Klo, ((1,), (0,)))
        Y1 = jnp.clip(Y - tau * G, lb, ub)
        Yb = 2.0 * Y1 - Y
        Ybhi, Yblo = split(Yb)
        S = ht - dot(Ybhi, Yblo, Khi, Klo, ((1,), (1,)))
        Lr = L + sig * S
        L1 = eq * Lr + (1.0 - eq) * jnp.maximum(Lr, 0.0)
        k = kh + t.astype(jnp.float32)
        w = (k + 1.0) / (k + 2.0)
        Y2 = w * Yb + (1.0 - w) * Yanc          # Yb == 2 Y1 - Y
        L2 = w * (2.0 * L1 - L) + (1.0 - w) * Lanc
        return Y2, L2, Y1, L1

    Y0 = Y_ref[:]
    L0 = L_ref[:]
    Y, L, Yc, Lc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_inner), body, (Y0, L0, Y0, L0))
    Yout_ref[:] = Y
    Lout_ref[:] = L
    Ycand_ref[:] = Yc
    Lcand_ref[:] = Lc


@partial(jax.jit, static_argnames=("n_inner", "blk", "exact"))
def pdhg_round_pallas_halpern(K, q, lb, ub, is_eq, ht, tau, sig, Y, L,
                              kh, Yanc, Lanc, n_inner: int, blk: int = BLK,
                              exact: bool = False):
    """Halpern round; returns (Ycarry, Lcarry, Ycand, Lcand)."""
    B, m = ht.shape
    n = K.shape[1]
    assert B % blk == 0, (B, blk)
    dt = K.dtype

    # q: [n] shared across the batch, or [B, n] per-element (random-cost
    # instances) — the kernel body broadcasts either shape identically
    per_el_q = q.ndim == 2
    q2 = q if per_el_q else q.reshape(1, n)
    lb2 = lb.reshape(1, n)
    ub2 = ub.reshape(1, n)
    eq2 = is_eq.astype(dt).reshape(1, m)
    tau2 = tau.reshape(B, 1)
    sig2 = sig.reshape(B, 1)
    kh2 = kh.astype(jnp.float32).reshape(B, 1)

    grid = (B // blk,)
    row_spec = pl.BlockSpec((blk, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scl_spec = pl.BlockSpec((blk, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    q_spec = col_spec if per_el_q else full(1, n)

    call = pl.pallas_call(
        partial(_kernel_halpern, n_inner, exact),
        grid=grid,
        in_specs=[
            full(m, n), q_spec, full(1, n), full(1, n), full(1, m),
            row_spec, scl_spec, scl_spec, col_spec, row_spec,
            scl_spec,            # kh
            col_spec,            # Y anchor
            row_spec,            # L anchor
        ],
        out_specs=[col_spec, row_spec, col_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dt),
            jax.ShapeDtypeStruct((B, m), dt),
            jax.ShapeDtypeStruct((B, n), dt),
            jax.ShapeDtypeStruct((B, m), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_inner * B * m * n,
            bytes_accessed=(m * n + 3 * B * (m + n)) * 4,
            transcendentals=0,
        ),
    )
    with jax.enable_x64(False):
        out = call(K, q2, lb2, ub2, eq2, ht, tau2, sig2, Y, L,
                   kh2, Yanc, Lanc)
    return tuple(out)


@partial(jax.jit, static_argnames=("n_inner", "blk", "exact"))
def pdhg_round_pallas(K, q, lb, ub, is_eq, ht, tau, sig, Y, L,
                      n_inner: int, blk: int = BLK, exact: bool = False):
    """Run n_inner PDHG steps; returns (Y, L, Yavg, Lavg).

    Args are the SCALED problem (as in PreparedLP) with finite bound
    sentinels already substituted. B must be a multiple of blk.
    """
    B, m = ht.shape
    n = K.shape[1]
    assert B % blk == 0, (B, blk)
    dt = K.dtype

    per_el_q = q.ndim == 2
    q2 = q if per_el_q else q.reshape(1, n)
    lb2 = lb.reshape(1, n)
    ub2 = ub.reshape(1, n)
    eq2 = is_eq.astype(dt).reshape(1, m)
    tau2 = tau.reshape(B, 1)
    sig2 = sig.reshape(B, 1)

    grid = (B // blk,)
    row_spec = pl.BlockSpec((blk, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scl_spec = pl.BlockSpec((blk, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    q_spec = col_spec if per_el_q else full(1, n)

    call = pl.pallas_call(
        partial(_kernel, n_inner, exact),
        grid=grid,
        in_specs=[
            full(m, n),          # K
            q_spec,              # q ([1,n] shared / [blk,n] per-element)
            full(1, n),          # lb
            full(1, n),          # ub
            full(1, m),          # eq mask
            row_spec,            # ht
            scl_spec,            # tau
            scl_spec,            # sig
            col_spec,            # Y
            row_spec,            # L
        ],
        out_specs=[col_spec, row_spec, col_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dt),
            jax.ShapeDtypeStruct((B, m), dt),
            jax.ShapeDtypeStruct((B, n), dt),
            jax.ShapeDtypeStruct((B, m), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_inner * B * m * n,
            bytes_accessed=(m * n + 2 * B * (m + n)) * 4,
            transcendentals=0,
        ),
    )
    # Trace with 32-bit index types even when the surrounding program has
    # x64 enabled (the f64 master path): Mosaic cannot legalize i64 index
    # computations ("failed to legalize func.return (i64, i64)").
    with jax.enable_x64(False):
        out = call(K, q2, lb2, ub2, eq2, ht, tau2, sig2, Y, L)
    return tuple(out)
