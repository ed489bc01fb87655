"""Golden-value unit tests for the SD machinery, mirroring the reference's
test/sd_test.jl and test/dual_set_test.jl on the lands fixture."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import solve_problem
from sqlp_tpu.models.smps_tim import Position
from sqlp_tpu.models.scenario import effective_rhs_deltas
from sqlp_tpu.sd.cuts import argmax_duals, build_sasa_cut, evaluate_epigraph
from sqlp_tpu.sd.dual_pool import push_duals, round_sig_bits
from sqlp_tpu.sd.master import assemble_master, cut_dual_slice
from sqlp_tpu.sd.state import default_epigraph_spec, init_state, master_rows

from conftest import require_instance


@pytest.fixture(scope="module")
def lands():
    require_instance("lands")
    return load_instance("lands", dtype=jnp.float64)


# ---------------------------------------------------------------- dual pool

def test_dual_pool_dedup_semantics():
    """Approximate-equality semantics of the dual set (dual_set_test.jl):
    1e-10 perturbations are equal; same 1-norm but different elements (v5 vs
    v1) are distinct; counts grow 1,1,2,3."""
    v1 = np.array([1.0, 2.0, 3.0])
    v2 = np.array([1.0000000001, 2.0, 3.0])
    v3 = np.array([4.0, 5.0, 6.0])
    v5 = np.array([3.0, 2.0, 1.0])  # same 1-norm as v1, different vector

    D = 8
    duals = jnp.zeros((D, 3))
    rounded = jnp.zeros((D, 3))
    n = jnp.asarray(0, jnp.int32)
    dropped = jnp.asarray(0, jnp.int32)
    for vec, expected in [(v1, 1), (v2, 1), (v3, 2), (v5, 3)]:
        duals, rounded, n, dropped = push_duals(
            duals, rounded, n, jnp.asarray(vec)[None, :], dropped)
        assert int(n) == expected
    assert int(dropped) == 0


def test_dual_pool_capacity_ring_replace():
    """At capacity, new distinct duals ring-replace the oldest slot."""
    duals = jnp.zeros((2, 3))
    rounded = jnp.zeros((2, 3))
    n = jnp.asarray(0, jnp.int32)
    dropped = jnp.asarray(0, jnp.int32)
    batch = jnp.asarray([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0], [4.0, 0, 0]])
    duals, rounded, n, dropped = push_duals(duals, rounded, n, batch, dropped)
    assert int(n) == 2
    assert int(dropped) == 2
    np.testing.assert_allclose(np.asarray(duals)[:, 0], [3.0, 4.0])
    # duplicates of current pool entries still dedup
    duals, rounded, n, dropped = push_duals(
        duals, rounded, n, jnp.asarray([[4.0, 0, 0]]), dropped)
    assert int(dropped) == 2


def test_dual_pool_usage_score_eviction():
    """With a usage score, a push at capacity evicts the LOWEST-score live
    vertex (not the oldest), and the fresh vertex starts at the live mean."""
    duals = jnp.asarray([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]])
    rounded = duals
    n = jnp.asarray(3, jnp.int32)
    dropped = jnp.asarray(0, jnp.int32)
    score = jnp.asarray([5.0, 0.5, 2.0])  # slot 1 least used
    duals, rounded, n, dropped, score = push_duals(
        duals, rounded, n, jnp.asarray([[9.0, 0, 0]]), dropped, score=score)
    assert int(n) == 3 and int(dropped) == 1
    np.testing.assert_allclose(np.asarray(duals)[:, 0], [1.0, 9.0, 3.0])
    # fresh slot gets the pre-push live mean (5 + 0.5 + 2) / 3
    np.testing.assert_allclose(float(score[1]), 2.5)
    # duplicates still dedup and leave the score untouched
    d2, r2, n2, dr2, s2 = push_duals(
        duals, rounded, n, jnp.asarray([[9.0, 0, 0]]), dropped, score=score)
    assert int(dr2) == 1
    np.testing.assert_allclose(np.asarray(s2), np.asarray(score))


def test_round_sig_bits_julia_parity():
    """round(x; base=2, sigdigits=16): 1.0000000001 -> 1.0 exactly."""
    x = jnp.asarray([1.0000000001, 1.0, -0.4999999999, 0.0])
    r = np.asarray(round_sig_bits(x))
    assert r[0] == r[1] == 1.0
    assert r[2] == -0.5
    assert r[3] == 0.0


# ------------------------------------------------------------------ argmax

def _scenario(value):
    return [(Position("RHS", "S2C5"), float(value))]


def _delta_panel(inst, values):
    """[S, R] raw delta panel for lands' single RHS random position."""
    base = float(inst.scenario_model.base[0])
    return jnp.asarray([[v - base] for v in values], jnp.float64)


def test_argmax_matches_numpy_and_direct_solves(lands):
    """The matmul argmax equals a numpy double loop exactly, and with
    sufficient dual vertices equals the direct solver objective
    (sd_test.jl:76-94)."""
    inst = lands
    x1 = np.array([3.0, 3.0, 3.0, 3.0])
    x2 = np.array([2.0, 4.0, 2.0, 6.0])
    values = [5.0, 5.0, 3.0, 7.0]

    # dual points from solving at x1 (host oracle = exact vertex duals)
    pis = []
    for v in values:
        _, _, pi = solve_problem(inst.sp2, x1, _scenario(v))
        pis.append(pi)
    D = 8
    duals = jnp.zeros((D, inst.m2), jnp.float64)
    rounded = jnp.zeros((D, inst.m2), jnp.float64)
    n = jnp.asarray(0, jnp.int32)
    dropped = jnp.asarray(0, jnp.int32)
    duals, rounded, n, dropped = push_duals(
        duals, rounded, n, jnp.asarray(np.array(pis)), dropped)
    assert int(n) == 3  # first two scenarios identical -> dedup

    model = inst.scenario_model
    deltas = _delta_panel(inst, values)
    eff = effective_rhs_deltas(model, deltas, jnp.asarray(x2))
    base = inst.arrays.r - inst.arrays.T @ jnp.asarray(x2)
    val, arg = argmax_duals(duals, n, base, model.rv_row, eff)

    # numpy reference: double loop over scenarios x pool
    duals_np = np.asarray(duals)[:3]
    h = np.asarray(base)[None, :] + np.zeros((4, inst.m2))
    for s in range(4):
        h[s, int(model.rv_row[0])] += float(eff[s, 0])
    scores = duals_np @ h.T  # [3, 4]
    np.testing.assert_allclose(np.asarray(val), scores.max(axis=0), rtol=1e-12)

    # sufficiency: equals direct solves at x2 (reference asserts exact)
    for s, v in enumerate(values):
        obj, _, _ = solve_problem(inst.sp2, x2, _scenario(v))
        assert float(val[s]) == pytest.approx(obj, rel=1e-9)


# ---------------------------------------------------------- build_sasa_cut

def test_build_sasa_cut_weighted_golden(lands):
    """Weighted cut assembly (sd_test.jl:207-235): scenarios rhs=3 (w=1.5)
    and rhs=7 (w=0.5), duals from x1 solves, cut built at x=[2,3,4,5]."""
    inst = lands
    x1 = np.array([3.0, 3.0, 3.0, 3.0])
    x = np.array([2.0, 3.0, 4.0, 5.0])

    _, _, my_dual = solve_problem(inst.sp2, x1, _scenario(5.0))
    _, _, my_dual_2 = solve_problem(inst.sp2, x1, _scenario(3.0))

    D = 4
    duals = jnp.zeros((D, inst.m2), jnp.float64)
    rounded = jnp.zeros((D, inst.m2), jnp.float64)
    n = jnp.asarray(0, jnp.int32)
    dropped = jnp.asarray(0, jnp.int32)
    duals, rounded, n, dropped = push_duals(
        duals, rounded, n, jnp.asarray(np.array([my_dual, my_dual_2])), dropped)

    S = 4  # padded capacity; 2 live scenarios
    deltas = jnp.zeros((S, 1), jnp.float64)
    base_v = float(inst.scenario_model.base[0])
    deltas = deltas.at[0, 0].set(3.0 - base_v).at[1, 0].set(7.0 - base_v)
    weights = jnp.asarray([1.5, 0.5, 0.0, 0.0], jnp.float64)
    total = jnp.asarray(2.0, jnp.float64)

    cut = build_sasa_cut(inst.arrays, inst.scenario_model, duals, n,
                         deltas, weights, total, jnp.asarray(x))

    # expected from the reference's manual calculation: scenario rhs=3
    # selects my_dual_2, rhs=7 selects my_dual
    r = np.asarray(inst.arrays.r)
    T = np.asarray(inst.arrays.T)
    row = int(inst.scenario_model.rv_row[0])
    r1 = r.copy(); r1[row] = 3.0
    r2 = r.copy(); r2[row] = 7.0
    expected_alpha = 1.5 / 2.0 * my_dual_2 @ r1 + 0.5 / 2.0 * my_dual @ r2
    expected_beta = 1.5 / 2.0 * (-T.T @ my_dual_2) + 0.5 / 2.0 * (-T.T @ my_dual)
    assert float(cut.alpha) == pytest.approx(expected_alpha, rel=1e-12)
    np.testing.assert_allclose(np.asarray(cut.beta), expected_beta, rtol=1e-12)


# ------------------------------------------------------ epigraph evaluation

def _epi_eval(cuts, inc, x, total, lb):
    """Helper building padded arrays for evaluate_epigraph."""
    K = 4
    alpha = np.zeros(K); beta = np.zeros((K, 4)); mark = np.zeros(K)
    live = np.zeros(K, bool)
    for k, (a, b, m) in enumerate(cuts):
        alpha[k], beta[k], mark[k], live[k] = a, b, m, True
    if inc is None:
        ia, ib, iv = 0.0, np.zeros(4), False
    else:
        ia, ib, iv = inc[0], np.asarray(inc[1]), True
    return float(evaluate_epigraph(
        jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(mark),
        jnp.asarray(live), jnp.asarray(ia), jnp.asarray(ib),
        jnp.asarray(iv), jnp.asarray(float(total)), jnp.asarray(float(lb)),
        jnp.asarray(x, jnp.float64)))


def test_evaluate_epigraph_golden():
    """Golden values from sd_test.jl:189-194 (weights applied outside)."""
    cut1 = (1.0, [2.0, 3.0, 4.0, 5.0], 1.0)
    cut2 = (6.0, [7.0, 8.0, 9.0, 10.0], 2.0)
    inc = (11.0, [12.0, 13.0, 14.0, 15.0])
    x10 = [10.0] * 4

    # epi1: cuts {cut1, cut2}, incumbent, total=2, lb=0 -> 551 (inc wins)
    assert _epi_eval([cut1, cut2], inc, x10, 2.0, 0.0) == pytest.approx(551.0)
    # epi2: {cut1}, no inc, total=2, lb=100 -> 141/2 + 100/2
    assert _epi_eval([cut1], None, x10, 2.0, 100.0) == pytest.approx(141 / 2 + 100 / 2)
    # below lb: lb wins
    assert _epi_eval([cut1], None, [-1.0] * 4, 2.0, 100.0) == pytest.approx(100.0)


# ------------------------------------------------------------ master rows

def test_master_cut_row_discount_lb_blending(lands):
    """The 50.5 golden: cut alpha=1, mark=1, total=2, lb=100 ->
    row bound d*alpha + (1-d)*lb = 0.5 + 50 = 50.5 (sd_test.jl:184-187)."""
    inst = lands
    cfg = SDConfig(dtype="float64", max_scenarios=8, max_dual_vertices=8,
                   max_cuts=4)
    espec = default_epigraph_spec(1, 0.5, 100.0, dtype=jnp.float64)
    state = init_state(inst, espec, cfg, np.zeros(inst.n1),
                       jax.random.PRNGKey(0))
    state = dataclasses.replace(
        state,
        cut_alpha=state.cut_alpha.at[0, 0].set(1.0),
        cut_beta=state.cut_beta.at[0, 0].set(
            jnp.asarray([2.0, 3.0, 4.0, 5.0])),
        cut_mark=state.cut_mark.at[0, 0].set(1.0),
        cut_live=state.cut_live.at[0, 0].set(True),
        total_weight=state.total_weight.at[0].set(2.0),
    )
    rho = jnp.asarray(0.1, jnp.float64)
    p_diag, g, A, l, u, is_eq = assemble_master(inst.arrays, espec, state, rho)
    m1, n1 = inst.m1, inst.n1
    row = m1 + n1  # first cut row
    assert float(l[row]) == pytest.approx(50.5)
    assert not np.isfinite(float(u[row]))
    # A row: [-d*beta | 1]
    np.testing.assert_allclose(np.asarray(A[row]),
                               [-1.0, -1.5, -2.0, -2.5, 1.0])
    # dead rows are zero with free bounds
    assert float(l[row + 1]) == -np.inf
    np.testing.assert_allclose(np.asarray(A[row + 1]), 0.0)
    # shape contract
    assert A.shape[0] == master_rows(n1, m1, 1, cfg.max_cuts)
    # cut_dual_slice picks exactly the cut rows
    mu = jnp.arange(A.shape[0], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(cut_dual_slice(mu, m1, n1, 1, 4))[0],
                               [row, row + 1, row + 2, row + 3])
