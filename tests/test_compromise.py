"""Compromise decision across SD replications (sd/compromise.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.compromise import compromise_decision
from sqlp_tpu.sd.driver import SDSolver

from conftest import require_instance

_CFG = SDConfig(
    dtype="float64",
    max_scenarios=256, max_dual_vertices=64, max_cuts=16,
    pdhg=PDHGConfig(tol=1e-8, max_iters=10_000),
    qp=QPConfig(tol=1e-9, max_iters=4_000),
)


@pytest.mark.slow
def test_lands_compromise():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    solvers = []
    for seed in (1, 2, 3):
        s = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]),
                     seed=seed)
        s.run(150)
        solvers.append(s)
    x, info = compromise_decision(
        inst, [s.state for s in solvers], [s.espec for s in solvers],
        rho=1.0, qp_config=QPConfig(tol=1e-7, max_iters=8_000),
        obj_scale=solvers[0].obj_scale)
    assert bool(info["qp_converged"])
    # compromise x is stage-1 feasible and near-optimal under the exact
    # 3-scenario expectation
    from sqlp_tpu.models.routines import solve_problem
    from sqlp_tpu.models.smps_tim import Position
    cost = float(np.asarray(inst.arrays.c) @ x)
    for v, p in zip([3.0, 5.0, 7.0], [0.3, 0.4, 0.3]):
        obj, _, _ = solve_problem(inst.sp2, x, [(Position("RHS", "S2C5"), v)])
        cost += p * obj
    assert abs(cost - 381.8533333) < 3.0
    # the compromise x is EXACTLY box-feasible (clipped) and row-feasible
    # to the projection tolerance — an epsilon-infeasible x makes recourse
    # LPs infeasible at exact-solver tolerances (regression: ssn x_comp
    # with a -3e-6 entry crashed the MC evaluator's host fallback)
    from sqlp_tpu.models.routines import project_first_stage
    assert np.all(x >= np.asarray(inst.arrays.lb1))
    assert np.all(x <= np.asarray(inst.arrays.ub1))
    _, dist = project_first_stage(inst.arrays, x)
    assert dist == 0.0
    assert "projection_distance" in info


@pytest.mark.slow
def test_replications_batched_matches_sequential():
    """SDReplications (one vmapped device program) produces per-replication
    trajectories statistically equivalent to sequential SDSolver runs with
    the same seeds, and its states feed compromise_decision."""
    require_instance("lands")
    from sqlp_tpu.sd.driver import SDReplications
    inst = load_instance("lands", dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])

    batched = SDReplications(inst, _CFG, n_replications=3, x0=x0, seed=1)
    batched.run(150)

    # every replication's incumbent is near-optimal under the exact
    # 3-scenario expectation (same bar the sequential e2e test uses)
    from sqlp_tpu.models.routines import solve_problem
    from sqlp_tpu.models.smps_tim import Position
    for r in range(3):
        x = batched.x_incumbents[r]
        cost = float(np.asarray(inst.arrays.c) @ x)
        for v, p in zip([3.0, 5.0, 7.0], [0.3, 0.4, 0.3]):
            obj, _, _ = solve_problem(inst.sp2, x,
                                      [(Position("RHS", "S2C5"), v)])
            cost += p * obj
        assert abs(cost - 381.8533333) < 3.0, (r, cost)

    # the batched states drive the compromise decision
    x_comp, info = compromise_decision(
        inst, batched.states, batched.especs,
        rho=1.0, qp_config=QPConfig(tol=1e-7, max_iters=8_000),
        obj_scale=batched.obj_scale)
    assert bool(info["qp_converged"])
    cost = float(np.asarray(inst.arrays.c) @ x_comp)
    for v, p in zip([3.0, 5.0, 7.0], [0.3, 0.4, 0.3]):
        obj, _, _ = solve_problem(inst.sp2, x_comp,
                                  [(Position("RHS", "S2C5"), v)])
        cost += p * obj
    assert abs(cost - 381.8533333) < 3.0


@pytest.mark.slow
def test_replications_evaluate_retry_path():
    """SDReplications.evaluate with uncertifiable batch elements: the MC
    retry's dual warm start must read the REPLICATED state ([R]-shaped
    n_duals / [R, D, m2] pool) — it crashed with `int(state.n_duals)` on
    the batched pytree (regression)."""
    import pytest
    require_instance("lands")
    from sqlp_tpu.models.routines import solve_problem
    from sqlp_tpu.models.smps_tim import Position
    from sqlp_tpu.sd.driver import SDReplications
    inst = load_instance("lands", dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])

    reps = SDReplications(inst, _CFG, n_replications=2, x0=x0, seed=1)
    reps.run(20)
    assert reps._warmstart_pool() is not None
    # now tighten valid_tol below the solver's numeric floor: every
    # evaluation element fails certification, forcing the device retry
    # (pool warm start off the REPLICATED state) and then the exact host
    # fallback for the whole panel
    reps.config = _CFG.replace(pdhg=PDHGConfig(tol=1e-8, max_iters=10_000,
                                               valid_tol=1e-30))
    x = reps.x_incumbents[0]
    with pytest.warns(UserWarning, match="re-solved exactly on host"):
        ub = reps.evaluate(x=x, n_samples=64, seed=3, batch=64)
    # the fallback solves exactly on host, so the estimate must match the
    # closed-form expectation at the SAME x up to MC sampling error over
    # the 3-outcome rv (64 draws)
    cost = float(np.asarray(inst.arrays.c) @ x)
    recourse = []
    for v, p in zip([3.0, 5.0, 7.0], [0.3, 0.4, 0.3]):
        obj, _, _ = solve_problem(inst.sp2, x, [(Position("RHS", "S2C5"), v)])
        recourse.append((obj, p))
    exact = cost + sum(o * p for o, p in recourse)
    spread = max(o for o, _ in recourse) - min(o for o, _ in recourse)
    assert abs(ub - exact) < 0.5 * spread + 1e-6, (ub, exact)


def test_polish_decision_descends_lands():
    """Proximal-bundle decision polish: from a mid-quality start the
    certified panel values must descend monotonically on serious steps
    and beat the start (sd/compromise.py:polish_decision)."""
    import jax.numpy as jnp
    from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.sd.driver import SDSolver

    cfg = SDConfig(dtype="float64",
                   max_scenarios=64, max_dual_vertices=64, max_cuts=16,
                   pdhg=PDHGConfig(tol=1e-7, max_iters=20_000),
                   qp=QPConfig(tol=1e-9, max_iters=4_000))
    inst = load_instance("lands", dtype=jnp.float64)
    solver = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]),
                      seed=0)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])
    x_pol, info = solver.polish_decision(x0, n_scenarios=512, rounds=8,
                                         rho=5.0)
    vals = np.asarray(info["values"])
    assert info["f_best"] <= vals[0] - 0.5, info
    # serious steps never increase the best value
    assert info["f_best"] == vals[info["serious_steps"]].min()
    # the polished decision is first-stage feasible
    a = inst.arrays
    assert np.all(x_pol >= np.asarray(a.lb1) - 1e-9)
    assert np.all(x_pol <= np.asarray(a.ub1) + 1e-9)
