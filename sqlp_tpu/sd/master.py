"""Master problem assembly: state -> canonical QP (l <= Az <= u).

Replaces the reference's JuMP-model master mutation (``sync_cuts!`` deletes
and re-adds every cut constraint each iteration, src/sd_algorithm/cell.jl:
139-202; ``add_regularization!`` rewrites the objective, cell.jl:130-134).
Here the master is assembled functionally from the state's cut arrays each
iteration — no incremental model surgery, just array math — and handed to
the on-device ADMM QP solver (sqlp_tpu/ops/prox_qp.py).

Variables z = [x (n1); eta (E)]. Row layout (must agree with
``state.master_rows``):

    [0, m1)               stage-1 rows  A1 x {senses1} b1
    [m1, m1+n1)           variable bounds  lb1 <= x <= ub1
    [m1+n1, m1+n1+E*K)    cut rows  eta_e - d beta@x >= d alpha + (1-d) lb_e
                          (discount d = weight_mark / total_weight applied at
                          assembly time, epigraph.jl:101-117; dead slots are
                          zero rows with free bounds)
    [m1+n1+E*K, ... +E)   incumbent-cut rows at discount 1.0 (cell.jl:185-188)

The epigraph variables deliberately carry no explicit lower bound, matching
the commented-out set_lower_bound in the reference (cell.jl:107).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sqlp_tpu.models.instance import InstanceArrays
from sqlp_tpu.models.stage import SENSE_E, SENSE_G, SENSE_L


def assemble_master(arrays: InstanceArrays, espec, state, rho: jax.Array
                    ) -> Tuple[jax.Array, ...]:
    """Build (p_diag, g, A, l, u, is_eq) for the regularized master QP

        min c@x + sum_e w_e eta_e + rho/2 ||x - x_incumbent||^2.
    """
    E, K = state.cut_alpha.shape
    n1 = arrays.c.shape[0]
    m1 = arrays.b1.shape[0]
    dt = arrays.c.dtype
    nz = n1 + E
    inf = jnp.asarray(jnp.inf, dt)

    # objective
    p_diag = jnp.concatenate([jnp.full((n1,), rho, dt), jnp.zeros((E,), dt)])
    g = jnp.concatenate([arrays.c - rho * state.x_incumbent, espec.obj_weight])

    # stage-1 rows
    A1 = jnp.concatenate([arrays.A1, jnp.zeros((m1, E), dt)], axis=1)
    s1 = arrays.senses1
    l1 = jnp.where(s1 == SENSE_L, -inf, arrays.b1)
    u1 = jnp.where(s1 == SENSE_G, inf, arrays.b1)

    # bound rows
    Ab = jnp.concatenate([jnp.eye(n1, dtype=dt), jnp.zeros((n1, E), dt)], axis=1)

    # cut rows
    d = state.cut_mark / jnp.maximum(state.total_weight[:, None], 1e-30)  # [E,K]
    alpha_t = d * state.cut_alpha + (1.0 - d) * espec.lower_bound[:, None]
    beta_t = d[:, :, None] * state.cut_beta                               # [E,K,n1]
    live = state.cut_live.reshape(E * K)
    eta_block = jnp.repeat(jnp.eye(E, dtype=dt), K, axis=0)               # [E*K, E]
    Ac = jnp.concatenate([-beta_t.reshape(E * K, n1), eta_block], axis=1)
    Ac = jnp.where(live[:, None], Ac, 0.0)
    lc = jnp.where(live, alpha_t.reshape(E * K), -inf)
    uc = jnp.full((E * K,), inf, dt)

    # incumbent-cut rows (discount 1.0)
    Ai = jnp.concatenate([-state.inc_beta, jnp.eye(E, dtype=dt)], axis=1)
    Ai = jnp.where(state.inc_valid[:, None], Ai, 0.0)
    li = jnp.where(state.inc_valid, state.inc_alpha, -inf)
    ui = jnp.full((E,), inf, dt)

    A = jnp.concatenate([A1, Ab, Ac, Ai], axis=0)
    l = jnp.concatenate([l1, arrays.lb1, lc, li])
    u = jnp.concatenate([u1, arrays.ub1, uc, ui])
    is_eq = jnp.concatenate([
        s1 == SENSE_E,
        jnp.zeros((n1 + E * K + E,), bool),
    ])
    return p_diag, g, A, l, u, is_eq


def cut_dual_slice(mu: jax.Array, m1: int, n1: int, E: int, K: int) -> jax.Array:
    """Extract the [E, K] cut-row multipliers (the prune signal the
    reference reads from the master, algorithm.jl:58-69)."""
    return mu[m1 + n1: m1 + n1 + E * K].reshape(E, K)
