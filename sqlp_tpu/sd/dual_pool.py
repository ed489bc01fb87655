"""On-device dual-vertex pool with approximate dedup.

Port of record: ``sdDualVertexSet`` (src/sd_algorithm/dual_set.jl). The
reference dedups dual extreme points by rounding every component to 16
significant binary digits and linearly scanning the pool (dual_set.jl:4,
24-53, 84-93). Here the pool is a fixed-capacity [D, m2] array; a push is
one vectorized rounded-compare of the candidate against all live rows —
O(D·m2) on the VPU instead of a Julia loop — and an insert via
dynamic_update_slice. A batch of candidates is folded with lax.scan so
within-batch duplicates dedup exactly like the reference's sequential
pushes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def round_sig_bits(x: jax.Array, bits: int = 16) -> jax.Array:
    """Round to ``bits`` significant binary digits.

    Matches Julia's ``round(x; base=2, sigdigits=bits)`` used for approximate
    dual equality (dual_set.jl:24-53): write x = m * 2^e with |m| in [0.5,1),
    keep ``bits`` bits of mantissa.
    """
    m, e = jnp.frexp(x)
    del m  # only the exponent is needed
    # ldexp gives an exact power of two; exp2(float) is off by an ulp on
    # some backends, which would corrupt the exact-compare dedup.
    scale = jnp.ldexp(jnp.ones_like(x), bits - e)
    rounded = jnp.round(x * scale) / scale
    return jnp.where(x == 0, jnp.zeros_like(x), rounded)


def push_duals(duals: jax.Array, rounded: jax.Array, n: jax.Array,
               new_pis: jax.Array, dropped: jax.Array, sig_bits: int = 16,
               valid=None
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Push a batch of dual vectors into the pool with dedup.

    Args:
      duals: [D, m2] pool; rounded: [D, m2] rounded copy; n: int32 count.
      new_pis: [P, m2] candidates, pushed in order (order matters for parity
        with the reference's sequential push!, algorithm.jl:50-54).
      dropped: int32 counter of capacity drops.
      valid: optional [P] bool — False entries are skipped (unconverged
        subproblem duals must not enter the pool; an invalid dual breaks
        cut validity).

    Returns: (duals, rounded, n, dropped).
    """
    D = duals.shape[0]
    if valid is None:
        valid = jnp.ones((new_pis.shape[0],), bool)

    def push_one(carry, x):
        pi, ok = x
        duals, rounded, n, dropped = carry
        pr = round_sig_bits(pi, sig_bits)
        live = jnp.arange(D) < n
        dup = jnp.logical_or(
            ~ok,
            jnp.any(jnp.logical_and(live,
                                    jnp.all(rounded == pr[None, :], axis=1))))
        append = jnp.logical_and(~dup, n < D)
        # At capacity, ring-replace the oldest slot: duals found near the
        # current iterates stay in the pool, stale vertices rotate out
        # (the reference's pool is unbounded, dual_set.jl:84-93; plain
        # dropping was observed to stall cut quality on ssn).
        ring = jnp.logical_and(~dup, n >= D)
        idx = jnp.where(append, jnp.minimum(n, D - 1),
                        dropped % jnp.asarray(D, dropped.dtype))
        write = jnp.logical_or(append, ring)
        old_d = jax.lax.dynamic_slice_in_dim(duals, idx, 1)
        old_r = jax.lax.dynamic_slice_in_dim(rounded, idx, 1)
        duals = jax.lax.dynamic_update_slice_in_dim(
            duals, jnp.where(write, pi[None, :], old_d), idx, 0)
        rounded = jax.lax.dynamic_update_slice_in_dim(
            rounded, jnp.where(write, pr[None, :], old_r), idx, 0)
        return (duals, rounded, n + append.astype(n.dtype),
                dropped + ring.astype(dropped.dtype)), None

    (duals, rounded, n, dropped), _ = jax.lax.scan(
        push_one, (duals, rounded, n, dropped), (new_pis, valid))
    return duals, rounded, n, dropped
