"""End-to-end SD solve on lands: objective parity with the reference.

The reference only eyeballs instance convergence (its instance drivers print
lb/ub without asserting, test/instance_test/*.jl); we assert against the
known lands optimum 381.8533 (test/crash_test.jl:37 — exact here because
lands' single random demand takes exactly the 3 modelled values)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDSolver

from conftest import require_instance

LANDS_OPT = 381.8533333

_CFG = SDConfig(
    dtype="float64",
    max_scenarios=512, max_dual_vertices=256, max_cuts=32,
    quad_schedule="constant", quad_scalar_init=0.1,
    pdhg=PDHGConfig(tol=1e-8, max_iters=20_000),
    qp=QPConfig(tol=1e-9, max_iters=8_000),
)


@pytest.fixture(scope="module")
def lands_solver():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    solver = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=7)
    solver.run(300)
    return solver


def test_lands_bounds_sandwich(lands_solver):
    """lb estimate and MC upper bound must bracket the true optimum."""
    lb = lands_solver.lower_estimate
    ub = lands_solver.evaluate(n_samples=4000)
    assert lb < LANDS_OPT + 0.5, f"lb {lb} above optimum"
    assert ub > LANDS_OPT - 0.5, f"ub {ub} below optimum"
    assert abs(lb - LANDS_OPT) < 6.0
    assert abs(ub - LANDS_OPT) < 6.0


def test_lands_incumbent_near_optimal(lands_solver):
    """The incumbent's true objective (exact 3-scenario expectation) is near
    the optimum."""
    inst = lands_solver.inst
    x = lands_solver.x_incumbent
    from sqlp_tpu.models.routines import solve_problem
    from sqlp_tpu.models.smps_tim import Position
    vals, probs = [3.0, 5.0, 7.0], [0.3, 0.4, 0.3]
    exp_cost = float(np.asarray(inst.arrays.c) @ x)
    for v, p in zip(vals, probs):
        obj, _, _ = solve_problem(inst.sp2, x, [(Position("RHS", "S2C5"), v)])
        exp_cost += p * obj
    assert exp_cost == pytest.approx(LANDS_OPT, abs=3.0)


def test_determinism_same_seed():
    """Same seed => bitwise-identical trajectory (SURVEY.md §5.2: pure
    functional step dissolves the reference's planned-mutex concerns)."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    runs = []
    for _ in range(2):
        s = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=11)
        s.run(25)
        runs.append((s.x_candidate.copy(), s.x_incumbent.copy(),
                     int(s.state.n_duals)))
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    assert runs[0][2] == runs[1][2]


@pytest.mark.slow
def test_chunked_run_equivalence():
    """Chunk boundaries are invisible: run(30) in one call equals
    run(12)+run(18) bitwise. Exercises sd_run's dynamic trip count (a
    partial chunk reuses the full-chunk executable; stats past n are
    dropped by the driver)."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    a = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=13)
    a.run(30, chunk=64)
    b = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=13)
    b.run(12, chunk=64)
    b.run(18, chunk=64)
    np.testing.assert_array_equal(a.x_candidate, b.x_candidate)
    np.testing.assert_array_equal(a.x_incumbent, b.x_incumbent)
    assert int(a.state.it) == int(b.state.it) == 30
    # per-iteration stats cover exactly the requested iterations
    a2 = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=13)
    a2.run(30, chunk=64, log_every=1)
    assert [h["it"] for h in a2.history] == list(range(1, 31))


@pytest.mark.slow
def test_infeasible_x0_projected():
    """An infeasible start must be projected onto the first-stage polytope:
    the SD incumbent test ignores first-stage feasibility, so an infeasible
    incumbent's fictitiously low estimate can never be beaten (observed on
    storm with x0=0, pinned for 1500 iterations). lands at x0=0 violates its
    minimum-capacity row (x1+..+x4 >= 12)."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    with pytest.warns(UserWarning, match="projected onto"):
        s = SDSolver(inst, _CFG, x0=np.zeros(4), seed=3)
    x0 = s.x_incumbent
    a = inst.arrays
    from sqlp_tpu.models.stage import SENSE_G, SENSE_L
    r = np.asarray(a.A1) @ x0
    b1 = np.asarray(a.b1)
    senses = np.asarray(a.senses1)
    assert np.all(r[senses == SENSE_G] >= b1[senses == SENSE_G] - 1e-7)
    assert np.all(r[senses == SENSE_L] <= b1[senses == SENSE_L] + 1e-7)
    s.run(150)
    ub = s.evaluate(n_samples=2000)
    assert abs(ub - LANDS_OPT) < 8.0


def test_feasible_x0_untouched():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])
    s = SDSolver(inst, _CFG, x0=x0, seed=3)
    np.testing.assert_array_equal(s.x_incumbent, x0)


def test_sharpen_duals_host_valid_and_usable():
    """Host-exact dual sharpening (sd/driver.py:sharpen_duals_host):
    injected duals must be exactly dual-feasible (they are HiGHS basic
    optima — the reference's simplex-vertex semantics,
    smps_routines.jl:58-61), the pool must stay dedup-consistent, and
    the solver must keep running with a finite valid bound afterwards.
    At f64 subproblem tolerance the measured argmax slack must be ~0
    (tight pool duals): |slack| bounded by the pool's own feasibility
    epsilon scale."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    s = SDSolver(inst, _CFG, x0=np.array([5.0, 5.0, 5.0, 5.0]), seed=11)
    s.run(60)
    out = s.sharpen_duals_host(k=8)
    assert out["n_solved"] > 0
    # slack can be slightly negative only by the pool duals' own
    # eps-infeasible optimism (valid_tol-bounded); at tol 1e-8 it is ~0
    assert out["max_slack"] > -1e-6
    # every live pool dual must satisfy the infinite-direction dual
    # feasibility the cut validity argument rests on
    a = inst.arrays
    q = np.asarray(a.q, np.float64)
    W = np.asarray(a.W, np.float64)
    nd = int(s.state.n_duals)
    red = q[None, :] - np.asarray(s.state.duals, np.float64)[:nd] @ W
    ub_inf = ~np.isfinite(np.asarray(a.ub2, np.float64))
    lb_inf = ~np.isfinite(np.asarray(a.lb2, np.float64))
    viol = (np.where(ub_inf[None, :], np.maximum(-red, 0.0), 0.0)
            + np.where(lb_inf[None, :], np.maximum(red, 0.0), 0.0))
    assert viol.max() < 1e-5
    # rounded copy stays consistent with the pool (dedup invariant)
    from sqlp_tpu.sd.dual_pool import round_sig_bits
    np.testing.assert_array_equal(
        np.asarray(s.state.duals_rounded)[:nd],
        np.asarray(round_sig_bits(s.state.duals,
                                  _CFG.dual_sig_bits))[:nd])
    s.run(30)
    assert np.isfinite(s.cut_model_lower_bound())


def test_evaluate_ci_batch_mean_estimator():
    """Stratified evaluate_ci reports its CI from iid batch means once
    >= 8 full batches completed: the width must (a) capture the
    stratification gain (tighter than the per-element iid estimator on
    the same panel) and (b) still cover the exact value. newsvendor's
    recourse at fixed x is exactly computable over its 3-outcome
    support."""
    require_instance("newsvendor")
    from sqlp_tpu.models.routines import solve_lp_host

    inst = load_instance("newsvendor", dtype=jnp.float64)
    s = SDSolver(inst, _CFG.replace(max_scenarios=128), seed=0)
    x = np.array([6.0])
    # exact E[cost at x] over the discrete support
    sm = inst.scenario_model
    a = inst.arrays
    vals = np.asarray(sm.values[0], np.float64)
    cdf = np.asarray(sm.cdf[0], np.float64)
    probs = np.diff(cdf, prepend=0.0)
    live = probs > 1e-12
    exact = float(np.dot(a.c, x))
    from sqlp_tpu.sd.algorithm import _scenario_rhs
    for v, p in zip(vals[live], probs[live]):
        d = v - float(np.asarray(sm.base)[0])
        H = np.asarray(_scenario_rhs(
            a, sm, jnp.asarray([[d]], jnp.float64), jnp.asarray(x)),
            np.float64)
        obj, _, _ = solve_lp_host(
            np.asarray(a.q, np.float64), np.asarray(a.W, np.float64),
            H[0], np.asarray(a.senses2), np.asarray(a.lb2, np.float64),
            np.asarray(a.ub2, np.float64))
        exact += p * obj
    m_s, hw_s, n_s = s.evaluate_ci(x=x, min_samples=4096,
                                   max_samples=4096, batch=256,
                                   seed=3, sampling="stratified")
    m_i, hw_i, n_i = s.evaluate_ci(x=x, min_samples=4096,
                                   max_samples=4096, batch=256,
                                   seed=3, sampling="iid")
    assert n_s == n_i == 4096
    # the batch-mean CI must see the stratification gain
    assert hw_s < 0.7 * hw_i, (hw_s, hw_i)
    # and still cover the exact value (95% CI; fixed seed)
    assert abs(m_s - exact) <= hw_s * 1.5, (m_s, exact, hw_s)
    assert abs(m_i - exact) <= hw_i * 1.5, (m_i, exact, hw_i)
