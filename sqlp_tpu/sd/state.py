"""SD solver state: one pytree of fixed-capacity arrays.

The reference scatters mutable state across ``sdCell`` (master model, x's,
dual set, improvement info, ext dict — src/sd_algorithm/cell.jl:4-39) and
per-epigraph ``sdEpigraph`` objects (scenario lists, cut pools, incumbent
cut — src/sd_algorithm/epigraph.jl:17-45), growing Julia vectors unboundedly.
Under XLA everything lives in one immutable pytree of pre-allocated arrays
with live counts/masks, so the whole iteration jits, checkpoints, and shards.

Capacity semantics:
  * scenario stores and the dual pool grow until their static capacity and
    then saturate (new entries dropped; counted in stats);
  * cut pools recycle slots — a new cut takes the first dead slot, else
    evicts the live cut with the smallest |master dual| (the reference
    prunes near-zero-dual cuts anyway, algorithm.jl:58-69).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqlp_tpu.config import SDConfig
from sqlp_tpu.models.instance import Instance


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EpigraphSpec:
    """Static per-epigraph weights/bounds (sdEpigraph objective_weight /
    lower_bound, src/sd_algorithm/epigraph.jl:26-31)."""

    obj_weight: jax.Array   # [E]
    lower_bound: jax.Array  # [E]

    @property
    def n_epi(self) -> int:
        return int(self.obj_weight.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDState:
    """Full algorithm state carried between iterations (one pytree)."""

    key: jax.Array            # PRNG key
    it: jax.Array             # int32 iteration counter

    # scenario stores (per epigraph; add_scenario!, epigraph.jl:81-96)
    scen_deltas: jax.Array    # [E, S, R] raw value - template value
    scen_weights: jax.Array   # [E, S] (0 beyond n_scen)
    n_scen: jax.Array         # [E] int32 stored (live) count, <= S
    n_stream: jax.Array       # [E] int32 total scenarios ever added (the
    #                           reservoir's stream position; == total_weight
    #                           for unit-weight streams)
    total_weight: jax.Array   # [E] sum of all weights ever added
    scen_dropped: jax.Array   # int32, overflow counter

    # shared dual-vertex pool (sdDualVertexSet, dual_set.jl:69-104)
    duals: jax.Array          # [D, m2]
    duals_rounded: jax.Array  # [D, m2] 16-sig-binary-digit rounded copy
    n_duals: jax.Array        # int32
    duals_dropped: jax.Array  # int32
    duals_score: jax.Array    # [D] EMA of argmax win mass (eviction signal)

    # cut pools (sdCut / sdEpigraph.cuts, epigraph.jl:5-12)
    cut_alpha: jax.Array      # [E, K]
    cut_beta: jax.Array       # [E, K, n1]
    cut_mark: jax.Array       # [E, K] weight_mark at build time
    cut_live: jax.Array       # [E, K] bool
    cut_dual: jax.Array       # [E, K] last master dual (prune signal)
    cut_x: jax.Array          # [E, K, n1] generating point (for refresh)

    # incumbent cuts (epigraph.jl:44, applied undiscounted)
    inc_alpha: jax.Array      # [E]
    inc_beta: jax.Array       # [E, n1]
    inc_valid: jax.Array      # [E] bool

    # solutions
    x_candidate: jax.Array    # [n1]
    x_incumbent: jax.Array    # [n1]

    # improvement info (sdImprovementInfo, improvement.jl:6-11)
    cand_est: jax.Array
    inc_est: jax.Array
    req_improvement: jax.Array
    is_improved: jax.Array    # bool

    # prox-weight schedule registers (cell.ext, quad_scalar.jl:15-76)
    quad_scalar: jax.Array
    normDk_1: jax.Array
    normDk_init: jax.Array    # bool

    # crossover adaptive gate: consecutive iterations with zero accepted
    # vertex roundings (config.crossover_dry_limit turns the solve off)
    xover_dry: jax.Array      # int32

    # master solve bookkeeping
    master_solved: jax.Array  # bool (gates cut pruning, algorithm.jl:57)
    master_z: jax.Array       # [n1+E] warm start
    master_mu: jax.Array      # [mA] warm start
    # previous solve's adapted ADMM penalty: successive masters differ by
    # one cut row, so the adapted rho transfers; restarting adaptation
    # from config.qp.rho every solve re-walks the scale in sqrt(ratio)
    # steps
    master_rho: jax.Array     # scalar

    # subproblem warm starts: previous iteration's PDHG solutions for the
    # [E*(cand,inc)*B] panel (x moves slowly under the prox term, so these
    # cut PDHG iteration counts dramatically at small B)
    sub_warm_Y: jax.Array     # [2*E*B, n2]
    sub_warm_L: jax.Array     # [2*E*B, m2]

    @property
    def n_epi(self) -> int:
        return int(self.cut_alpha.shape[0])


def master_rows(n1: int, m1: int, E: int, K: int) -> int:
    """Row count of the assembled master QP: stage-1 rows, x bounds, the
    E*K cut rows, then E incumbent-cut rows (layout in sd/master.py)."""
    return m1 + n1 + E * K + E


def init_state(inst: Instance, espec: EpigraphSpec, config: SDConfig,
               x0, key) -> SDState:
    """Fresh state at x_candidate = x_incumbent = x0 (reference drivers set
    both to the crash/zero start, test/instance_test/sd_single_cut_test.jl:54-55)."""
    E = espec.n_epi
    S, D, K = config.max_scenarios, config.max_dual_vertices, config.max_cuts
    n1, m1, m2 = inst.n1, inst.m1, inst.m2
    R = inst.n_rv
    dt = config.jdtype
    f = lambda shape: jnp.zeros(shape, dt)
    x0 = jnp.asarray(x0, dt)
    return SDState(
        key=key,
        it=jnp.zeros((), jnp.int32),
        scen_deltas=f((E, S, R)),
        scen_weights=f((E, S)),
        n_scen=jnp.zeros((E,), jnp.int32),
        n_stream=jnp.zeros((E,), jnp.int32),
        total_weight=f((E,)),
        scen_dropped=jnp.zeros((), jnp.int32),
        duals=f((D, m2)),
        duals_rounded=f((D, m2)),
        n_duals=jnp.zeros((), jnp.int32),
        duals_dropped=jnp.zeros((), jnp.int32),
        duals_score=f((D,)),
        cut_alpha=f((E, K)),
        cut_beta=f((E, K, n1)),
        cut_mark=f((E, K)),
        cut_live=jnp.zeros((E, K), bool),
        cut_dual=f((E, K)),
        cut_x=jnp.broadcast_to(x0, (E, K) + x0.shape),
        inc_alpha=f((E,)),
        inc_beta=f((E, n1)),
        inc_valid=jnp.zeros((E,), bool),
        x_candidate=x0,
        x_incumbent=x0,
        cand_est=jnp.asarray(jnp.nan, dt),
        inc_est=jnp.asarray(jnp.nan, dt),
        req_improvement=jnp.asarray(0.0, dt),
        is_improved=jnp.asarray(False),
        quad_scalar=jnp.asarray(config.quad_scalar_init, dt),
        normDk_1=jnp.asarray(0.0, dt),
        normDk_init=jnp.asarray(False),
        xover_dry=jnp.zeros((), jnp.int32),
        master_solved=jnp.asarray(False),
        master_z=f((n1 + E,)),
        master_mu=f((master_rows(n1, m1, E, K),)),
        master_rho=jnp.asarray(config.qp.rho, dt),
        sub_warm_Y=f((2 * E * config.scenarios_per_iter, inst.n2)),
        sub_warm_L=f((2 * E * config.scenarios_per_iter, m2)),
    )


def default_epigraph_spec(n_epi: int = 1, obj_weight=1.0,
                          lower_bound=0.0, dtype=jnp.float32) -> EpigraphSpec:
    """Uniform epigraph spec (single weighted epigraph is the common case;
    the reference instance drivers use one epigraph of weight 1.0)."""
    w = np.full(n_epi, obj_weight, np.float64) if np.isscalar(obj_weight) \
        else np.asarray(obj_weight, np.float64)
    lb = np.full(n_epi, lower_bound, np.float64) if np.isscalar(lower_bound) \
        else np.asarray(lower_bound, np.float64)
    assert w.shape == lb.shape == (n_epi,)
    return EpigraphSpec(obj_weight=jnp.asarray(w, dtype),
                        lower_bound=jnp.asarray(lb, dtype))
