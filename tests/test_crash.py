"""Extensive-form (crash) solver vs the reference's golden optimum.

test/crash_test.jl:37 pins the lands 3-scenario deterministic equivalent at
381.8533333 (GLPK); we assert the structured PDHG reproduces it."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig
from sqlp_tpu.models.crash import crash_x0, solve_extensive_form
from sqlp_tpu.models.instance import load_instance

from conftest import require_instance


def test_lands_extensive_form_golden():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    base = float(inst.scenario_model.base[0])
    deltas = jnp.asarray([[3.0 - base], [5.0 - base], [7.0 - base]],
                         jnp.float64)
    probs = jnp.asarray([0.3, 0.4, 0.3], jnp.float64)
    x, obj, stats = solve_extensive_form(
        inst.arrays, inst.scenario_model, deltas, probs,
        PDHGConfig(tol=1e-6, max_iters=100_000))
    assert bool(stats["ef_converged"]), stats
    assert float(obj) == pytest.approx(381.8533333, abs=2e-3)
    # x must be stage-1 feasible
    x = np.asarray(x)
    A1 = np.asarray(inst.arrays.A1)
    b1 = np.asarray(inst.arrays.b1)
    s1 = np.asarray(inst.arrays.senses1)
    lhs = A1 @ x
    assert np.all(lhs[s1 == 1] >= b1[s1 == 1] - 1e-4)
    assert np.all(lhs[s1 == -1] <= b1[s1 == -1] + 1e-4)


def test_crash_x0_feasible_start():
    """crash_x0 mirrors the driver pattern: sampled EF -> starting point
    (sd_single_cut_test.jl:42-46)."""
    require_instance("transship")
    inst = load_instance("transship", dtype=jnp.float64)
    x, obj, stats = crash_x0(inst, n_scenarios=8, seed=1)
    assert bool(stats["ef_converged"]), stats
    assert np.all(np.isfinite(np.asarray(x)))
    lb = np.asarray(inst.arrays.lb1)
    ub = np.asarray(inst.arrays.ub1)
    assert np.all(np.asarray(x) >= lb - 1e-6)
    assert np.all(np.asarray(x) <= ub + 1e-6)
