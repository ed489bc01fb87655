"""On-device scenario model: padded marginal tables + batched sampler.

TPU-native replacement for the reference's per-iteration host sampling
(``rand(sto)``, src/smps/smps_sto.jl:117-149) and per-scenario sparse delta
extraction (``delta_coefficients``, src/sd_algorithm/subprob.jl:104-121).

Every independent random position k (order of first appearance in the sto
file) carries:
  * an index into the stage-2 constraint rows (``rv_row[k]``),
  * whether it patches the RHS or a transfer-matrix entry (``rv_is_rhs[k]``),
  * for transfer positions, the last-stage column index (``rv_col[k]``),
  * the template value at that position (``base[k]``), so that a sampled
    value v yields the delta v - base[k] directly (the reference stores
    sparse delta vectors per scenario; we store one [S, R] dense delta
    panel — R is the number of random positions, <= 117 on all shipped
    instances).

Sampling is inverse-CDF over padded discrete tables, or affine transforms of
normal/uniform draws, fully vmapped: one ``sample_deltas`` call produces a
[B, R] batch.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sqlp_tpu.models.smps_sto import (DiscreteDistribution,
                                      NormalDistribution, StoData,
                                      UniformDistribution)
from sqlp_tpu.models.smps_tim import Position
from sqlp_tpu.models.stage import StageLP

DIST_DISCRETE, DIST_NORMAL, DIST_UNIFORM = 0, 1, 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScenarioModel:
    """Padded per-position marginals, ready for batched device sampling."""

    # static index metadata
    rv_row: jax.Array        # [R] int32, stage-2 constraint row index
    rv_is_rhs: jax.Array     # [R] bool
    rv_col: jax.Array        # [R] int32 (0 where is_rhs)
    base: jax.Array          # [R] template value at the position
    dist_type: jax.Array     # [R] int32 in {DISCRETE, NORMAL, UNIFORM}
    # discrete tables, padded to the max outcome count
    values: jax.Array        # [R, V] outcome values (padded with last value)
    cdf: jax.Array           # [R, V] normalized inclusive CDF (padded with 1)
    # normal / uniform parameters
    mean: jax.Array          # [R]
    std: jax.Array           # [R]
    left: jax.Array          # [R]
    width: jax.Array         # [R]

    @property
    def n_rv(self) -> int:
        return int(self.rv_row.shape[0])


def build_scenario_model(sto: StoData, sp2: StageLP,
                         dtype=jnp.float32) -> ScenarioModel:
    """Compile a parsed sto file against the stage-2 template."""
    positions: List[Position] = list(sto.indep.keys())
    R = len(positions)
    row_lookup = sp2.row_lookup
    col_lookup = sp2.col_lookup

    v_max = 1
    for d in sto.indep.values():
        if isinstance(d, DiscreteDistribution):
            v_max = max(v_max, len(d.value))

    rv_row = np.zeros(R, np.int32)
    rv_is_rhs = np.zeros(R, bool)
    rv_col = np.zeros(R, np.int32)
    base = np.zeros(R, np.float64)
    dist_type = np.zeros(R, np.int32)
    values = np.zeros((R, v_max), np.float64)
    cdf = np.ones((R, v_max), np.float64)
    mean = np.zeros(R, np.float64)
    std = np.zeros(R, np.float64)
    left = np.zeros(R, np.float64)
    width = np.zeros(R, np.float64)

    for k, pos in enumerate(positions):
        assert pos.row_name in row_lookup, (
            f"Random position row {pos.row_name} not in stage-2 template")
        i = row_lookup[pos.row_name]
        rv_row[k] = i
        if pos.col_name in ("RHS", "rhs"):
            rv_is_rhs[k] = True
            base[k] = sp2.rhs[i]
        else:
            assert pos.col_name in col_lookup, (
                f"Random position col {pos.col_name} not a last-stage var")
            j = col_lookup[pos.col_name]
            rv_col[k] = j
            base[k] = sp2.T[i, j]

        d = sto.indep[pos]
        if isinstance(d, DiscreteDistribution):
            dist_type[k] = DIST_DISCRETE
            vals = np.asarray(d.value, np.float64)
            probs = np.asarray(d.probability, np.float64)
            n = len(vals)
            values[k, :n] = vals
            values[k, n:] = vals[-1]
            c = np.cumsum(probs) / probs.sum()
            cdf[k, :n] = c
            cdf[k, n:] = 1.0
        elif isinstance(d, NormalDistribution):
            dist_type[k] = DIST_NORMAL
            mean[k] = d.mean
            std[k] = np.sqrt(d.variance)
        elif isinstance(d, UniformDistribution):
            dist_type[k] = DIST_UNIFORM
            left[k] = d.left
            width[k] = d.right - d.left
        else:
            raise TypeError(f"Unknown distribution {type(d)}")

    f = lambda a: jnp.asarray(a, dtype=dtype)
    return ScenarioModel(
        rv_row=jnp.asarray(rv_row), rv_is_rhs=jnp.asarray(rv_is_rhs),
        rv_col=jnp.asarray(rv_col), base=f(base),
        dist_type=jnp.asarray(dist_type),
        values=f(values), cdf=f(cdf), mean=f(mean), std=f(std),
        left=f(left), width=f(width),
    )


def sample_values(key: jax.Array, model: ScenarioModel, batch: int) -> jax.Array:
    """Draw a [batch, R] panel of raw scenario values.

    Discrete positions use inverse-CDF lookup on the padded table; normal
    and uniform are affine transforms of standard draws. All positions are
    sampled with a single pair of [batch, R] uniform/normal draws.
    """
    k_u, k_z = jax.random.split(key)
    R = model.n_rv
    dt = model.values.dtype
    u = jax.random.uniform(k_u, (batch, R), dtype=dt)
    z = jax.random.normal(k_z, (batch, R), dtype=dt)

    # inverse CDF: index = #{j : cdf[j] <= u}; u < cdf[0] -> 0
    idx = jnp.sum(u[:, :, None] >= model.cdf[None, :, :], axis=-1)
    idx = jnp.clip(idx, 0, model.values.shape[1] - 1)
    discrete = jnp.take_along_axis(
        jnp.broadcast_to(model.values, (batch, R, model.values.shape[1])),
        idx[:, :, None], axis=-1)[..., 0]
    normal = model.mean + model.std * z
    uniform = model.left + model.width * u

    vals = jnp.where(model.dist_type == DIST_DISCRETE, discrete,
                     jnp.where(model.dist_type == DIST_NORMAL, normal,
                               uniform))
    return vals


def sample_deltas(key: jax.Array, model: ScenarioModel, batch: int) -> jax.Array:
    """Draw a [batch, R] panel of deltas vs the template (value - base).

    This is the device analog of ``delta_coefficients``
    (src/sd_algorithm/subprob.jl:104-121) fused with sampling.
    """
    return sample_values(key, model, batch) - model.base


def deltas_to_rhs(model: ScenarioModel, deltas: jax.Array, m2: int) -> jax.Array:
    """Scatter an RHS-position delta panel [..., R] to dense [..., m2].

    Transfer-matrix positions contribute 0 here; use ``effective_rhs_deltas``
    to fold them in against a fixed x.
    """
    d = jnp.where(model.rv_is_rhs, deltas, 0.0)
    out = jnp.zeros(deltas.shape[:-1] + (m2,), deltas.dtype)
    return out.at[..., model.rv_row].add(d)


def effective_rhs_deltas(model: ScenarioModel, deltas: jax.Array,
                         x: jax.Array) -> jax.Array:
    """Per-position effective RHS contribution at a fixed first-stage x.

    For RHS positions the contribution is the delta itself; for transfer
    positions T[i,j] += d means the row-i RHS of (r - T x) changes by
    -d * x[j]. Returns [..., R]; scattering by ``rv_row`` then gives the
    dense change of h = r - T x. This is how scenario randomness enters the
    argmax scores and the subproblem RHS uniformly (cf. ``eval_dual``,
    src/sd_algorithm/subprob.jl:128-131).
    """
    return jnp.where(model.rv_is_rhs, deltas, -deltas * x[..., model.rv_col])
