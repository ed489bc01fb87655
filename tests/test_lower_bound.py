"""Valid epigraph lower bound: computed, not guessed.

The reference trusts the user's lower-bound constant (sdEpigraph ctor,
src/sd_algorithm/epigraph.jl:52-61) and blends it into every stored cut as
(1-d)*lb (epigraph.jl:101-117). Its own baa99-20 driver passes lb=-500000
(test/instance_test/sd_single_cut_test.jl:22) while the instance's recourse
dips below -860000 near the optimum — every decayed cut then OVERESTIMATES
the recourse and SD converges to the wrong point (verified against a HiGHS
extensive-form solve: EF-50 optimum ~ -317k, SD-with-invalid-lb ~ -130k).

sqlp_tpu computes a provably valid bound by one exact host LP over the
scenario support box (models/routines.py:recourse_lower_bound) and warns
when a user bound exceeds it.
"""

import warnings

import numpy as np
import pytest

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import recourse_lower_bound, solve_lp_host

from conftest import require_instance


@pytest.fixture(scope="module")
def lands():
    require_instance("lands")
    return load_instance("lands", dtype="float64")


@pytest.fixture(scope="module")
def baa():
    require_instance("baa99-20")
    return load_instance("baa99-20", dtype="float64")


def test_lands_bound_tight_and_valid(lands):
    lb = recourse_lower_bound(lands.arrays, lands.scenario_model)
    # tighter than the naive 0 guess, and must not exceed the recourse at
    # the known-optimal region: Q(x, d) for lands is minimized over the
    # support box by the LP itself, so just pin the golden value.
    assert lb == pytest.approx(173.8, abs=0.2)


def test_bound_below_sampled_recourse(baa):
    """lb <= Q(x, xi) for any feasible x and sampled scenario."""
    import jax
    import jax.numpy as jnp
    from sqlp_tpu.models.scenario import sample_deltas
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    lb = recourse_lower_bound(baa.arrays, baa.scenario_model)
    a = baa.arrays
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 200.0, baa.n1)  # baa99-20 has no A1 rows; x >= 0
    H = np.asarray(_scenario_rhs(
        a, baa.scenario_model,
        sample_deltas(jax.random.PRNGKey(5), baa.scenario_model, 20),
        jnp.asarray(x)), np.float64)
    q = np.asarray(a.q, np.float64)
    W = np.asarray(a.W, np.float64)
    senses = np.asarray(a.senses2)
    lo = np.asarray(a.lb2, np.float64)
    hi = np.asarray(a.ub2, np.float64)
    for i in range(H.shape[0]):
        obj, _, _ = solve_lp_host(q, W, H[i], senses, lo, hi)
        assert lb <= obj + 1e-6 * (1 + abs(obj))


def test_driver_auto_bound_and_invalid_user_warning(baa):
    from sqlp_tpu.sd.driver import SDSolver
    from sqlp_tpu.sd.state import default_epigraph_spec

    cfg = SDConfig(dtype="float64", max_scenarios=16, max_dual_vertices=16,
                   max_cuts=8,
                   pdhg=PDHGConfig(tol=1e-6, max_iters=2000),
                   qp=QPConfig(tol=1e-7, max_iters=2000))
    s = SDSolver(baa, cfg, seed=0)
    # auto espec uses the computed bound (scaled by the objective norm)
    assert np.isfinite(s.recourse_lb) and s.recourse_lb < -860_000
    assert np.asarray(s.espec.lower_bound)[0] * s.obj_scale == pytest.approx(
        s.recourse_lb, rel=1e-6)

    # the reference driver's constant is above the valid bound -> warn
    espec = default_epigraph_spec(1, 1.0, -500000.0, dtype=cfg.jdtype)
    with pytest.warns(UserWarning, match="exceeds the valid recourse"):
        SDSolver(baa, cfg, espec=espec, seed=0)
