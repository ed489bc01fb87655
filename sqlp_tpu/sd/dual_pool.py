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
               valid=None, score=None):
    """Push a batch of dual vectors into the pool with dedup.

    Args:
      duals: [D, m2] pool; rounded: [D, m2] rounded copy; n: int32 count.
      new_pis: [P, m2] candidates, pushed in order (order matters for parity
        with the reference's sequential push!, algorithm.jl:50-54).
      dropped: int32 counter of capacity drops.
      valid: optional [P] bool — False entries are skipped (unconverged
        subproblem duals must not enter the pool; an invalid dual breaks
        cut validity).
      score: optional [D] per-vertex usage score (EMA of argmax win mass,
        sd/algorithm.py). When given, a push at capacity evicts the
        lowest-score live vertex — the one the SASA argmax has stopped
        selecting — instead of ring-replacing the oldest; the fresh vertex
        starts at the live-score mean so it is not immediately re-evicted.
        (The reference's pool is unbounded, dual_set.jl:84-93.)

    Returns: (duals, rounded, n, dropped), plus the updated score as a
    fifth element when ``score`` was given.
    """
    D = duals.shape[0]
    if valid is None:
        valid = jnp.ones((new_pis.shape[0],), bool)
    with_score = score is not None
    if not with_score:
        score = jnp.zeros((D,), duals.dtype)

    def push_one(carry, x):
        pi, ok = x
        duals, rounded, n, dropped, score = carry
        pr = round_sig_bits(pi, sig_bits)
        live = jnp.arange(D) < n
        dup = jnp.logical_or(
            ~ok,
            jnp.any(jnp.logical_and(live,
                                    jnp.all(rounded == pr[None, :], axis=1))))
        append = jnp.logical_and(~dup, n < D)
        evict = jnp.logical_and(~dup, n >= D)
        if with_score:
            evict_idx = jnp.argmin(jnp.where(live, score, jnp.inf)
                                   ).astype(dropped.dtype)
        else:
            evict_idx = dropped % jnp.asarray(D, dropped.dtype)
        idx = jnp.where(append, jnp.minimum(n, D - 1), evict_idx)
        write = jnp.logical_or(append, evict)
        old_d = jax.lax.dynamic_slice_in_dim(duals, idx, 1)
        old_r = jax.lax.dynamic_slice_in_dim(rounded, idx, 1)
        duals = jax.lax.dynamic_update_slice_in_dim(
            duals, jnp.where(write, pi[None, :], old_d), idx, 0)
        rounded = jax.lax.dynamic_update_slice_in_dim(
            rounded, jnp.where(write, pr[None, :], old_r), idx, 0)
        if with_score:
            grace = jnp.sum(jnp.where(live, score, 0.0)) \
                / jnp.maximum(n, 1).astype(score.dtype)
            score = jnp.where(write, score.at[idx].set(grace), score)
        return (duals, rounded, n + append.astype(n.dtype),
                dropped + evict.astype(dropped.dtype), score), None

    (duals, rounded, n, dropped, score), _ = jax.lax.scan(
        push_one, (duals, rounded, n, dropped, score), (new_pis, valid))
    if with_score:
        return duals, rounded, n, dropped, score
    return duals, rounded, n, dropped
