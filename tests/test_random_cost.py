"""Random cost coefficients (q randomness) — the reference's open TODO 6
("Allow randomness in cost coefficients q", /root/reference/readme.md:25-26),
implemented here end to end: sto positions addressing the cor objective row
patch the stage-2 objective per scenario.

Semantics under test: random q never changes the dual objective
pi'(r - Tx); it restricts dual feasibility to {pi : W'pi <= q_s}. The SASA
argmax therefore masks pool vertices that are dual-infeasible for a
scenario's q_s, with a universally feasible seed dual (computed against the
support-minimum cost) guaranteeing one admissible candidate per scenario
(sd/cuts.py:build_sasa_cut, models/scenario.py:_compute_seed_dual).

Fixture: instances/newsprice — a newsvendor with random demand (RHS) AND
random selling price (objective coefficient of Y1). Exact extensive-form
optimum over the 6-outcome support: obj = -3.0 at x = 6 (analytic:
1.2x + E[Q], kink slopes -0.35 / +0.25 at x = 6).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import (recourse_lower_bound, solve_lp_host,
                                      solve_problem)
from sqlp_tpu.models.scenario import (cost_panel, effective_rhs_deltas,
                                      sample_deltas)
from sqlp_tpu.models.smps_sto import sample_scenario
from sqlp_tpu.models.stage import instantiate
from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch

EXACT_EF_OBJ = -3.0       # analytic; cross-checked by HiGHS over the support
EXACT_EF_X = 6.0

# full support: (demand, price-coef, prob)
SUPPORT = [(d, p, pd * pp)
           for (d, pd) in [(2.0, 0.3), (6.0, 0.4), (10.0, 0.3)]
           for (p, pp) in [(-1.0, 0.5), (-3.0, 0.5)]]


@pytest.fixture(scope="module")
def inst():
    return load_instance("newsprice")


def support_deltas(inst):
    """[6, 2] delta panel over the full support (sto order: DEM, Y1/OBJ)."""
    m = inst.scenario_model
    base = np.asarray(m.base, np.float64)
    return np.array([[d - base[0], p - base[1]] for (d, p, _) in SUPPORT])


def test_parse_cost_positions(inst):
    m = inst.scenario_model
    assert m.has_cost and m.seed_valid
    assert m.cost_idx == ((1, 0),)            # position 1 patches q[Y1=0]
    np.testing.assert_array_equal(np.asarray(m.rv_is_cost), [False, True])
    np.testing.assert_array_equal(np.asarray(m.rv_is_rhs), [True, False])
    # template values: rhs DEM = 6, q[Y1] = -2
    np.testing.assert_allclose(np.asarray(m.base), [6.0, -2.0])


def test_instantiate_patches_objective(inst):
    # the host StageLP path (smps_routines.jl:7-20 extended to TODO 6)
    rng = np.random.default_rng(7)
    sc = sample_scenario(rng, inst.sto)
    sp = instantiate(inst.sp2, sc)
    want_c = dict(sc)[[p for p, _ in sc][1]]  # Y1/OBJ position value
    assert sp.c[0] == want_c
    assert sp.c[1] == -0.5                    # salvage untouched


def test_seed_dual_universally_feasible(inst):
    m = inst.scenario_model
    seed = np.asarray(m.seed_dual, np.float64)
    W = np.asarray(inst.arrays.W, np.float64)
    for (_, p, _) in SUPPORT:
        q_s = np.array([p, -0.5])
        assert np.all(W.T @ seed <= q_s + 1e-9)
    # sign constraints: both rows '<=' -> pi <= 0
    assert np.all(seed <= 1e-12)


def test_cost_panel(inst):
    m = inst.scenario_model
    deltas = jnp.asarray(support_deltas(inst), jnp.float32)
    Q = np.asarray(cost_panel(m, deltas, inst.arrays.q))
    for s, (_, p, _) in enumerate(SUPPORT):
        np.testing.assert_allclose(Q[s], [p, -0.5], rtol=1e-6)
    # cost positions contribute nothing to the effective RHS
    eff = np.asarray(effective_rhs_deltas(m, deltas, jnp.asarray([4.0])))
    np.testing.assert_allclose(eff[:, 1], 0.0)


def test_solve_batch_per_element_q(inst):
    """Batched PDHG with a per-element Q panel vs exact HiGHS solves."""
    a, m = inst.arrays, inst.scenario_model
    prep = prepare_lp(a.W, a.senses2, a.q, a.lb2, a.ub2)
    key = jax.random.PRNGKey(0)
    B = 64
    deltas = sample_deltas(key, m, B)
    x = jnp.asarray([4.0])
    eff = effective_rhs_deltas(m, deltas, x)
    H = (a.r - a.T @ x)[None, :] + \
        jnp.zeros((B, a.r.shape[0])).at[:, m.rv_row].add(eff)
    Q = cost_panel(m, deltas, a.q)
    obj, Y, Pi, st = solve_batch(prep, H, PDHGConfig(tol=1e-6), Q=Q)
    for b in range(B):
        ob, yb, pb = solve_lp_host(
            np.asarray(Q[b], np.float64), np.asarray(a.W, np.float64),
            np.asarray(H[b], np.float64), np.asarray(a.senses2),
            np.asarray(a.lb2, np.float64), np.asarray(a.ub2, np.float64))
        assert abs(ob - float(obj[b])) <= 1e-4 * (1 + abs(ob))
        # the returned dual must be feasible for ITS OWN scenario's q
        viol = np.asarray(a.W, np.float64).T @ np.asarray(Pi[b], np.float64) \
            - np.asarray(Q[b], np.float64)
        assert viol.max() <= 1e-3


def test_recourse_lower_bound(inst):
    # min over x in [0,10], demand in [2,10], q1 in {-1,-3}, q2=-0.5:
    # y1=10 (<=x=10, <=d=10) at price -3 -> -30
    lb = recourse_lower_bound(inst.arrays, inst.scenario_model)
    np.testing.assert_allclose(lb, -30.0, atol=1e-6)


def test_masked_argmax_cut_validity(inst):
    """A SASA cut built from a mixed-scenario dual pool must lower-bound
    the exact expected recourse at every x (validity would break if the
    argmax picked a dual that is infeasible for a scenario's q_s)."""
    from sqlp_tpu.sd.cuts import build_sasa_cut

    a, m = inst.arrays, inst.scenario_model
    deltas = support_deltas(inst)
    probs = np.array([pr for (_, _, pr) in SUPPORT])

    # exact duals of every scenario at x=4 (vertices of DIFFERENT dual
    # polytopes: the price -1 scenarios' duals are infeasible at price -3)
    pool = []
    for s, (d, p, _) in enumerate(SUPPORT):
        q_s = np.array([p, -0.5])
        h = np.array([4.0, d])
        _, _, pi = solve_lp_host(q_s, np.asarray(a.W, np.float64), h,
                                 np.asarray(a.senses2),
                                 np.asarray(a.lb2, np.float64),
                                 np.asarray(a.ub2, np.float64))
        pool.append(pi)
    D = 16
    duals = np.zeros((D, 2), np.float32)
    duals[:len(pool)] = np.asarray(pool, np.float32)

    for xv in (0.0, 3.0, 6.0, 9.0):
        x = jnp.asarray([xv], jnp.float32)
        cut = build_sasa_cut(
            a, m, jnp.asarray(duals), jnp.asarray(len(pool), jnp.int32),
            jnp.asarray(deltas, jnp.float32),
            jnp.asarray(probs, jnp.float32), jnp.asarray(1.0, jnp.float32),
            x)
        # exact expected recourse at x
        exact = 0.0
        for (d, p, pr) in SUPPORT:
            q_s = np.array([p, -0.5])
            ob, _, _ = solve_lp_host(q_s, np.asarray(a.W, np.float64),
                                     np.array([xv, d]),
                                     np.asarray(a.senses2),
                                     np.asarray(a.lb2, np.float64),
                                     np.asarray(a.ub2, np.float64))
            exact += pr * ob
        val = float(cut.alpha) + float(cut.beta[0]) * xv
        assert val <= exact + 1e-4 * (1 + abs(exact)), (xv, val, exact)
        # ... and at the build point the pool contains every exact dual,
        # so the cut should be TIGHT there
        if xv == 4.0:
            np.testing.assert_allclose(val, exact, rtol=1e-5)


def test_extensive_form_golden(inst):
    from sqlp_tpu.models.crash import solve_extensive_form

    deltas = jnp.asarray(support_deltas(inst), jnp.float32)
    probs = jnp.asarray([pr for (_, _, pr) in SUPPORT], jnp.float32)
    x, obj, st = solve_extensive_form(
        inst.arrays, inst.scenario_model, deltas, probs,
        PDHGConfig(tol=1e-7, max_iters=60_000))
    assert abs(float(obj) - EXACT_EF_OBJ) <= 1e-4
    assert abs(float(x[0]) - EXACT_EF_X) <= 1e-3


@pytest.mark.slow
def test_sd_end_to_end(inst):
    """SD on newsprice: valid lb/ub sandwich around the exact optimum and
    an incumbent whose true cost is near-optimal."""
    from sqlp_tpu.sd.driver import SDSolver

    s = SDSolver(inst, SDConfig(quad_schedule="adaptive",
                                quad_scalar_init=0.1), seed=0)
    # driver must have gated crossover + normalization off (random cost)
    assert not s.config.dual_crossover
    last = s.run(600)
    lb = float(last["cand_est"])
    mean, hw, _ = s.evaluate_ci(min_samples=8192)
    # cand_est estimates the cut model on the SAMPLED stream — it is not a
    # deterministic global bound (RESULTS.md notes; newsvendor's sits at
    # 1.0355 vs 1.0 too). Allow the B=1/600-draw SAA noise scale.
    assert lb <= EXACT_EF_OBJ + 0.5, lb
    assert mean + hw >= EXACT_EF_OBJ - 1e-3, (mean, hw)
    # the incumbent's true cost is within 15% of optimal after 600 iters
    assert mean - hw <= EXACT_EF_OBJ * 0.85, (mean, hw)


def test_evaluate_matches_host_oracle(inst):
    """Device MC evaluation (per-element Q) == serial exact host oracle on
    the same scenario panel."""
    from sqlp_tpu.sd.driver import SDSolver

    s = SDSolver(inst, SDConfig(), seed=0)
    x = np.array([5.0])
    rng = np.random.default_rng(3)
    scens = [sample_scenario(rng, inst.sto) for _ in range(64)]
    exact = float(np.mean([solve_problem(inst.sp2, x, sc)[0]
                           for sc in scens]))
    # device path on the same scenarios
    m = inst.scenario_model
    vals = np.array([[v for (_, v) in sc] for sc in scens], np.float32)
    deltas = jnp.asarray(vals) - m.base
    from sqlp_tpu.sd.algorithm import _scenario_rhs
    H = _scenario_rhs(s.arrays_local, m, deltas,
                      jnp.asarray(x, jnp.float32))
    dev = float(s._recourse_objs(H, Q=s._cost_panel(deltas)).mean())
    np.testing.assert_allclose(dev, exact, rtol=1e-4)
