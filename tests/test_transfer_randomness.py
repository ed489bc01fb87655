"""Transfer-matrix (T) randomness, end to end.

The reference patches non-RHS scenario positions into the transfer matrix
(``instantiate!``, src/smps/smps_routines.jl:11-17; ``delta_coefficients``,
src/sd_algorithm/subprob.jl:81-87 routing col != "RHS" to delta_transfer),
but none of its shipped instances exercise the path — every .sto line is
RHS-only (SURVEY.md quirk 7). The farmer fixture (instances/farmer) covers
it: a random crop yield t ~ {2, 2.5, 3} sits on the transfer entry
(bal1, x1), alongside a random RHS demand on bal2.

The instance is separable, so its optimum is analytic: plant to the largest
yield's break-even, x* = (3, 10/3), with objective

    2*3 + [0.4*0.5*(6-2.5*3) + 0.3*0.5*(6-3*3)]
  + 2.5*10/3 + [0.3*0.75*(6-10) + 0.4*0.75*(8-10)]  =  145/12 = 12.08333...
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.crash import solve_extensive_form
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import solve_lp_host
from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
from sqlp_tpu.sd.algorithm import _scenario_rhs
from sqlp_tpu.sd.cuts import build_sasa_cut, eval_dual
from sqlp_tpu.sd.driver import SDSolver

from conftest import require_instance

OPT = 145.0 / 12.0
T_VALS = [2.0, 2.5, 3.0]
D_VALS = [6.0, 8.0, 10.0]
PROBS = [0.3, 0.4, 0.3]


def _farmer():
    require_instance("farmer")
    return load_instance("farmer", dtype=jnp.float64)


def _support(inst):
    """All 9 scenarios of the finite support: (deltas [9,2], probs [9])."""
    base = np.asarray(inst.scenario_model.base)
    deltas, probs = [], []
    for (t, pt), (d, pd) in itertools.product(zip(T_VALS, PROBS),
                                              zip(D_VALS, PROBS)):
        deltas.append([t - base[0], d - base[1]])
        probs.append(pt * pd)
    return np.asarray(deltas), np.asarray(probs)


def _host_recourse(inst, x, t, d):
    """Exact recourse (obj, y, pi) with T and r patched the reference way."""
    a = inst.arrays
    T = np.asarray(a.T, np.float64).copy()
    r = np.asarray(a.r, np.float64).copy()
    i1 = inst.sp2.row_lookup["bal1"]
    i2 = inst.sp2.row_lookup["bal2"]
    j1 = inst.sp2.col_lookup["x1"]
    T[i1, j1] = t
    r[i2] = d
    h = r - T @ np.asarray(x, np.float64)
    return solve_lp_host(np.asarray(a.q, np.float64),
                         np.asarray(a.W, np.float64), h,
                         np.asarray(a.senses2),
                         np.asarray(a.lb2, np.float64),
                         np.asarray(a.ub2, np.float64))


def test_parse_transfer_position():
    inst = _farmer()
    m = inst.scenario_model
    # order of first appearance in the sto file: (x1, bal1) then (RHS, bal2)
    assert list(np.asarray(m.rv_is_rhs)) == [False, True]
    assert float(m.base[0]) == 2.5            # template T[bal1, x1]
    assert float(m.base[1]) == 8.0            # template rhs[bal2]
    assert int(m.rv_row[0]) == inst.sp2.row_lookup["bal1"]
    assert int(m.rv_row[1]) == inst.sp2.row_lookup["bal2"]
    assert int(m.rv_col[0]) == inst.sp2.col_lookup["x1"]


def test_subproblem_panel_matches_patched_T_host():
    """PDHG on the _scenario_rhs panel == exact host solves with T patched."""
    inst = _farmer()
    deltas, _ = _support(inst)
    x = jnp.asarray([1.2, 2.2], jnp.float64)

    H = _scenario_rhs(inst.arrays, inst.scenario_model,
                      jnp.asarray(deltas), x)
    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)
    obj, Y, Pi, stats = solve_batch(prep, H,
                                    PDHGConfig(tol=1e-10, max_iters=40_000))
    assert bool(stats["pdhg_converged"]), np.asarray(stats["pdhg_err"])

    for s, (t, d) in enumerate(itertools.product(T_VALS, D_VALS)):
        ref, _, _ = _host_recourse(inst, np.asarray(x), t, d)
        assert float(obj[s]) == pytest.approx(ref, abs=1e-6), (s, t, d)


def test_eval_dual_matches_host_objective():
    """pi'((r+dr)-(T+dT)x) at the exact dual == exact objective (strong
    duality; mirrors the reference's exact-equality check, sd_test.jl:62-65)."""
    inst = _farmer()
    deltas, _ = _support(inst)
    x = jnp.asarray([2.0, 1.5], jnp.float64)
    for s, (t, d) in enumerate(itertools.product(T_VALS, D_VALS)):
        ref, _, pi = _host_recourse(inst, np.asarray(x), t, d)
        val = eval_dual(inst.arrays, inst.scenario_model,
                        jnp.asarray(deltas[s]), x, jnp.asarray(pi))
        assert float(val) == pytest.approx(ref, abs=1e-9), (s, t, d)


def test_sasa_cut_transfer_beta_exact_and_valid():
    """With the pool holding every scenario's exact dual, the SASA cut is
    TIGHT at the build point (argmax attains each exact value) and VALID
    (under-estimates E[Q]) everywhere else — this pins the transfer-delta
    beta correction, beta -= sum_s p_s dT_s' pi_s (epigraph.jl:134-142)."""
    inst = _farmer()
    deltas, probs = _support(inst)
    x = jnp.asarray([2.6, 2.9], jnp.float64)

    pool, exp_q = [], 0.0
    for (t, d), p in zip(itertools.product(T_VALS, D_VALS), probs):
        ref, _, pi = _host_recourse(inst, np.asarray(x), t, d)
        pool.append(pi)
        exp_q += p * ref
    pool = jnp.asarray(np.asarray(pool))

    cut = build_sasa_cut(inst.arrays, inst.scenario_model, pool,
                         jnp.asarray(9), jnp.asarray(deltas),
                         jnp.asarray(probs), jnp.asarray(1.0), x)
    at_x = float(cut.alpha + cut.beta @ x)
    assert at_x == pytest.approx(exp_q, abs=1e-8)

    rng = np.random.default_rng(0)
    for _ in range(5):
        xp = jnp.asarray(rng.uniform(0.5, 4.0, size=2))
        eq = sum(p * _host_recourse(inst, np.asarray(xp), t, d)[0]
                 for (t, d), p in zip(itertools.product(T_VALS, D_VALS),
                                      probs))
        assert float(cut.alpha + cut.beta @ xp) <= eq + 1e-8


def test_extensive_form_analytic_optimum():
    inst = _farmer()
    deltas, probs = _support(inst)
    x, obj, stats = solve_extensive_form(
        inst.arrays, inst.scenario_model, jnp.asarray(deltas),
        jnp.asarray(probs), PDHGConfig(tol=1e-8, max_iters=200_000))
    assert bool(stats["ef_converged"]), stats
    assert float(obj) == pytest.approx(OPT, abs=1e-3)
    assert np.asarray(x) == pytest.approx([3.0, 10.0 / 3.0], abs=5e-3)


@pytest.mark.slow
def test_sd_converges_on_transfer_randomness():
    inst = _farmer()
    cfg = SDConfig(
        dtype="float64",
        max_scenarios=512, max_dual_vertices=64, max_cuts=24,
        pdhg=PDHGConfig(tol=1e-9, max_iters=20_000),
        qp=QPConfig(tol=1e-10, max_iters=4_000),
    )
    s = SDSolver(inst, cfg, x0=np.array([2.0, 2.0]), seed=3)
    s.run(250)
    ub = s.evaluate(n_samples=6000)
    # MC noise on 6000 draws is ~0.05; the incumbent should be near-optimal
    assert abs(ub - OPT) < 0.25, (ub, OPT)
    assert abs(s.lower_estimate - OPT) < 1.0, s.lower_estimate
