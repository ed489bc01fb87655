"""Sampling schemes, importance weights, and user-supplied scenarios.

Covers the reference surfaces/TODOs the round-3 step API added:
  * ``sd_iteration!(cell, scenario_list)`` — externally supplied scenarios
    (src/sd_algorithm/algorithm.jl:39-45) via ``sd_step(deltas=...)`` /
    ``SDSolver.step_scenarios``;
  * ``add_scenario!(epi, sc, weight)`` — per-scenario weights
    (src/sd_algorithm/epigraph.jl:81-96) threaded through the step;
  * importance sampling (reference readme.md TODO items 5/8) via
    ``sample_importance``;
  * antithetic / stratified sampling (reference readme.md TODO item 7).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.scenario import (sample_deltas, sample_importance,
                                      sample_values, scenario_log_pdf,
                                      values_to_deltas)
from sqlp_tpu.sd.algorithm import sd_step
from sqlp_tpu.sd.driver import SDSolver

from conftest import require_instance

_CFG = SDConfig(
    dtype="float64",
    max_scenarios=256, max_dual_vertices=128, max_cuts=16,
    quad_schedule="constant", quad_scalar_init=0.1,
    pdhg=PDHGConfig(tol=1e-8, max_iters=20_000),
    qp=QPConfig(tol=1e-9, max_iters=8_000),
)


@pytest.fixture(scope="module")
def lands():
    require_instance("lands")
    return load_instance("lands", dtype=jnp.float64)


@pytest.fixture(scope="module")
def storm_model():
    require_instance("storm")
    return load_instance("storm", dtype=jnp.float64).scenario_model


# ---------------------------------------------------------------------------
# sampling schemes
# ---------------------------------------------------------------------------

def test_antithetic_pairs_and_marginals(storm_model):
    """Antithetic batches pair (u, 1-u): continuous marginals mirror
    around their center, and the overall marginal distribution is kept
    (storm has discrete positions; means must match iid within noise)."""
    key = jax.random.PRNGKey(0)
    B = 4096
    v_anti = np.asarray(sample_values(key, storm_model, B,
                                      method="antithetic"))
    half = B // 2
    mean = np.asarray(storm_model.mean)
    is_norm = np.asarray(storm_model.dist_type) == 1
    if is_norm.any():
        k = np.flatnonzero(is_norm)[0]
        # normal positions: v and reflection are symmetric around mean
        np.testing.assert_allclose(v_anti[:half, k] + v_anti[half:, k],
                                   2 * mean[k], rtol=0, atol=1e-9)
    # per-position means match plain iid sampling within MC noise
    v_iid = np.asarray(sample_values(jax.random.PRNGKey(1), storm_model,
                                     B, method="iid"))
    scale = 1.0 + np.abs(v_iid.mean(0))
    assert np.max(np.abs(v_anti.mean(0) - v_iid.mean(0)) / scale) < 0.05


def test_antithetic_variance_reduction(storm_model):
    """The batch-mean of a monotone statistic has lower variance under
    antithetic draws than iid (the whole point of the scheme)."""
    stat = lambda v: v.sum(axis=1)          # monotone in every coordinate
    var_iid, var_anti = [], []
    for s in range(20):
        k = jax.random.PRNGKey(s)
        vi = np.asarray(sample_values(k, storm_model, 256, method="iid"))
        va = np.asarray(sample_values(k, storm_model, 256,
                                      method="antithetic"))
        var_iid.append(stat(vi).mean())
        var_anti.append(stat(va).mean())
    assert np.var(var_anti) < 0.5 * np.var(var_iid)


def test_stratified_hits_every_stratum(storm_model):
    """Latin hypercube: per position, the B draws land one per stratum of
    [0,1) — for a UNIFORM position the sorted values are near-evenly
    spaced; for discrete positions the outcome frequencies match the
    probabilities to within 1/B."""
    B = 256
    v = np.asarray(sample_values(jax.random.PRNGKey(3), storm_model, B,
                                 method="stratified"))
    dist = np.asarray(storm_model.dist_type)
    # discrete positions: counts within ceil(p*B)+-1 (stratified exactness)
    values = np.asarray(storm_model.values)
    cdf = np.asarray(storm_model.cdf)
    for k in np.flatnonzero(dist == 0)[:10]:
        pmf = np.diff(cdf[k], prepend=0.0)
        for j, val in enumerate(values[k]):
            if pmf[j] <= 0:
                continue
            cnt = np.sum(np.abs(v[:, k] - val) < 1e-9)
            # mass pmf[j]*B spans that many strata; only the two boundary
            # strata are ambiguous, so the count is within 2 of exact
            assert abs(cnt - pmf[j] * B) < 2.0, (k, j, cnt, pmf[j] * B)


def test_stratified_variance_reduction(storm_model):
    stat = lambda v: v.sum(axis=1)
    m_iid, m_strat = [], []
    for s in range(20):
        k = jax.random.PRNGKey(100 + s)
        m_iid.append(stat(np.asarray(
            sample_values(k, storm_model, 256, method="iid"))).mean())
        m_strat.append(stat(np.asarray(
            sample_values(k, storm_model, 256,
                          method="stratified"))).mean())
    assert np.var(m_strat) < 0.25 * np.var(m_iid)


def test_odd_batch_antithetic_falls_back(storm_model):
    v = sample_values(jax.random.PRNGKey(0), storm_model, 7,
                      method="antithetic")
    assert v.shape == (7, storm_model.n_rv)


# ---------------------------------------------------------------------------
# log-pdf and importance sampling
# ---------------------------------------------------------------------------

def test_scenario_log_pdf_discrete_exact(lands):
    """lands: one discrete position, values [3,5,7], probs [.3,.4,.3]
    (reference golden, test/smps_tests.jl:55-58)."""
    model = lands.scenario_model
    lp = np.asarray(scenario_log_pdf(model, jnp.asarray([[3.0], [5.0],
                                                         [7.0]])))
    np.testing.assert_allclose(np.exp(lp), [0.3, 0.4, 0.3], atol=1e-12)
    # off-support value has zero probability
    lp_off = float(scenario_log_pdf(model, jnp.asarray([4.0])))
    assert np.exp(lp_off) < 1e-200


def test_scenario_log_pdf_continuous(storm_model):
    """Normal/uniform positions: per-position log densities sum; check
    against a direct computation."""
    v = sample_values(jax.random.PRNGKey(5), storm_model, 64)
    lp = np.asarray(scenario_log_pdf(storm_model, v))
    assert np.all(np.isfinite(lp))
    vn = np.asarray(v, np.float64)
    dist = np.asarray(storm_model.dist_type)
    mean = np.asarray(storm_model.mean)
    std = np.asarray(storm_model.std)
    left = np.asarray(storm_model.left)
    width = np.asarray(storm_model.width)
    cdf = np.asarray(storm_model.cdf)
    values = np.asarray(storm_model.values)
    ref = np.zeros(64)
    for k in range(storm_model.n_rv):
        if dist[k] == 0:
            pmf = np.diff(cdf[k], prepend=0.0)
            for b in range(64):
                j = np.argmin(np.abs(values[k] - vn[b, k]))
                ref[b] += np.log(max(pmf[j], 1e-300))
        elif dist[k] == 1:
            z = (vn[:, k] - mean[k]) / std[k]
            ref += -0.5 * z * z - 0.5 * np.log(2 * np.pi) - np.log(std[k])
        else:
            ref += -np.log(width[k])
    np.testing.assert_allclose(lp, ref, rtol=1e-10)


def test_importance_weights_unbiased(lands):
    """Draw from a flattened proposal over lands' discrete support; the
    importance-weighted mean of any statistic matches the exact
    expectation under the target."""
    model = lands.scenario_model
    # proposal: uniform over the 3 outcomes (target probs .3/.4/.3)
    prop = dataclasses.replace(
        model, cdf=jnp.asarray([[1 / 3, 2 / 3, 1.0]], jnp.float64))
    deltas, w = sample_importance(jax.random.PRNGKey(0), model, prop, 3000)
    vals = np.asarray(deltas + model.base)[:, 0]
    w = np.asarray(w)
    # weights are exact pmf ratios
    expect_w = {3.0: 0.3 * 3, 5.0: 0.4 * 3, 7.0: 0.3 * 3}
    for v, wi in zip(vals, w):
        np.testing.assert_allclose(wi, expect_w[v], rtol=1e-12)
    # weighted mean of the value ~ exact target mean 0.3*3+0.4*5+0.3*7=5.0
    est = (w * vals).sum() / w.sum()
    assert abs(est - 5.0) < 0.1


# ---------------------------------------------------------------------------
# user-supplied scenarios + weights through the step
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_external_deltas_match_internal_trajectory(lands):
    """Feeding sd_step the exact deltas its internal sampler would draw
    reproduces the internal trajectory bitwise (same key handling)."""
    a = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=11)
    b = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=11)
    E, B = 1, _CFG.scenarios_per_iter
    for _ in range(5):
        _, k_sample = jax.random.split(b.state.key)
        d = sample_deltas(k_sample, lands.scenario_model, E * B).reshape(
            E, B, lands.scenario_model.n_rv)
        a.step()
        b.step_scenarios(deltas=d)
    np.testing.assert_array_equal(np.asarray(a.state.x_candidate),
                                  np.asarray(b.state.x_candidate))
    np.testing.assert_array_equal(np.asarray(a.state.scen_deltas),
                                  np.asarray(b.state.scen_deltas))
    assert float(a.state.cand_est) == float(b.state.cand_est)


def test_weighted_scenarios_bookkeeping(lands):
    """Per-scenario weights land in the store, total_weight accumulates
    them, and the cut discount d = weight_mark/total tracks the weighted
    totals (add_scenario! weight semantics, epigraph.jl:81-96,145)."""
    s = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=2)
    vals = np.array([[[3.0]]])
    s.step_scenarios(values=vals, weights=np.array([[2.5]]))
    assert float(s.state.total_weight[0]) == 2.5
    assert int(s.state.n_scen[0]) == 1
    assert int(s.state.n_stream[0]) == 1
    np.testing.assert_allclose(np.asarray(s.state.scen_weights[0, 0]), 2.5)
    # cut built this iteration carries weight_mark = total at build = 2.5
    live = np.asarray(s.state.cut_live[0])
    marks = np.asarray(s.state.cut_mark[0])[live]
    np.testing.assert_allclose(marks, [2.5])
    s.step_scenarios(values=np.array([[[7.0]]]), weights=np.array([[0.5]]))
    assert float(s.state.total_weight[0]) == 3.0
    assert int(s.state.n_stream[0]) == 2


@pytest.mark.slow
def test_importance_sampling_sd_run_converges(lands):
    """Lands driven by importance-sampled scenarios (flattened proposal,
    pmf-ratio weights) converges to the same neighborhood as plain SD —
    the reference's TODO-5/8 workflow, end to end."""
    model = lands.scenario_model
    prop = dataclasses.replace(
        model, cdf=jnp.asarray([[1 / 3, 2 / 3, 1.0]], jnp.float64))
    plain = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=3)
    plain.run(200)
    is_ = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=3)
    key = jax.random.PRNGKey(42)
    for _ in range(200):
        key, k = jax.random.split(key)
        d, w = sample_importance(k, model, prop, 1)
        is_.step_scenarios(deltas=d[None], weights=w[None])
    lb_plain = plain.lower_estimate
    lb_is = is_.lower_estimate
    # both sit near the lands optimum's neighborhood (381.85); the IS
    # stream is a different (but unbiased) estimator, so allow slack
    assert abs(lb_plain - lb_is) < 8.0, (lb_plain, lb_is)
    ub = is_.evaluate(n_samples=4096)
    assert abs(ub - 381.85) < 6.0, ub


@pytest.mark.slow
def test_on_device_proposal_run(lands, tmp_path):
    """SDSolver(proposal=...): the whole importance-sampling loop runs
    inside the chunked device program (no per-iteration host work) and
    converges to the lands neighborhood; stored weights are the exact
    density ratios {0.9, 1.2}."""
    from sqlp_tpu.models.instance import load_proposal

    sto = tmp_path / "prop.sto"
    sto.write_text(
        "STOCH         LandS\n"
        "INDEP         DISCRETE\n"
        "    RHS       S2C5      3.0                      0.3333333333\n"
        "    RHS       S2C5      5.0                      0.3333333333\n"
        "    RHS       S2C5      7.0                      0.3333333334\n"
        "ENDATA\n")
    prop = load_proposal(lands, str(sto), dtype=jnp.float64)
    s = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=6,
                 proposal=prop)
    s.run(200)
    assert 370 < s.lower_estimate < 390, s.lower_estimate
    w = np.asarray(s.state.scen_weights[0])[:int(s.state.n_scen[0])]
    assert set(np.round(w, 6)) <= {0.9, 1.2}, np.unique(w)
    # total weight accumulates the ratios (mean 1 in expectation)
    assert abs(float(s.state.total_weight[0]) / 200 - 1.0) < 0.15


def test_load_proposal_position_mismatch(lands, tmp_path):
    sto = tmp_path / "bad.sto"
    sto.write_text(
        "STOCH         LandS\n"
        "INDEP         DISCRETE\n"
        "    RHS       S2C6      3.0                      1.0\n"
        "ENDATA\n")
    from sqlp_tpu.models.instance import load_proposal
    with pytest.raises((ValueError, AssertionError, KeyError)):
        load_proposal(lands, str(sto), dtype=jnp.float64)


def test_sd_config_sampling_stratified_runs(lands):
    """config.sampling drives the internal sampler (B>1 path)."""
    cfg = _CFG.replace(scenarios_per_iter=4, sampling="stratified")
    s = SDSolver(lands, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=5)
    s.run(40)
    assert np.isfinite(s.lower_estimate)
    # stream bookkeeping: 40 iters * B=4
    assert int(s.state.n_stream[0]) == 160
    assert float(s.state.total_weight[0]) == 160.0


def test_evaluate_sampling_methods_agree(lands):
    """MC evaluation under iid / antithetic / stratified agrees within
    sampling noise (same estimand), stratified closest to exact."""
    s = SDSolver(lands, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=1)
    x = np.array([3.0, 3.0, 3.0, 3.0])
    vals = [s.evaluate(x=x, n_samples=2048, sampling=m)
            for m in ("iid", "antithetic", "stratified")]
    assert max(vals) - min(vals) < 2.0, vals
