"""Certified lower bound (sd/lower_bound.py).

The deterministic half of the certification claim is testable exactly:
each replication's cut-model minimum must sit at or below the optimum of
the sample-average (SAA) extensive form over the SAME scenario stream,
computed here by an independent HiGHS f64 block LP. The statistical half
(Student-t aggregation across replications) is checked for shape,
ordering, and coherence with the exact per-replication bounds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.optimize

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.algorithm import _scenario_rhs
from sqlp_tpu.sd.driver import SDReplications, SDSolver
from sqlp_tpu.sd.lower_bound import cut_model_min

from conftest import require_instance

_CFG = SDConfig(
    dtype="float64",
    max_scenarios=128, max_dual_vertices=128, max_cuts=24,
    pdhg=PDHGConfig(tol=1e-8, max_iters=20_000),
    qp=QPConfig(tol=1e-9, max_iters=4_000),
)


def _saa_ef_optimum(inst, state, epi: int = 0) -> float:
    """Exact SAA extensive-form optimum over epigraph ``epi``'s stored
    scenario stream (unit weights, RHS-only randomness), via HiGHS f64.

    Variables [x, y_1..y_S]; rows: stage-1 on x, then per scenario
    T x + W y_s {senses2} r_s with r_s = r + scatter(delta_s).
    """
    a = inst.arrays
    sm = inst.scenario_model
    assert bool(np.all(np.asarray(sm.rv_is_rhs))), \
        "helper assumes RHS-only randomness"
    S = int(np.asarray(state.n_scen)[epi])
    assert int(np.asarray(state.scen_dropped)) == 0
    deltas = np.asarray(state.scen_deltas, np.float64)[epi, :S]
    w = np.asarray(state.scen_weights, np.float64)[epi, :S]
    np.testing.assert_allclose(w, 1.0)
    r_s = np.asarray(_scenario_rhs(
        a, sm, jnp.asarray(deltas), jnp.zeros(inst.n1)), np.float64)  # [S,m2]

    c = np.asarray(a.c, np.float64)
    q = np.asarray(a.q, np.float64)
    A1 = np.asarray(a.A1, np.float64)
    b1 = np.asarray(a.b1, np.float64)
    s1 = np.asarray(a.senses1)
    T = np.asarray(a.T, np.float64)
    W = np.asarray(a.W, np.float64)
    s2 = np.asarray(a.senses2)
    n1, n2, m2 = inst.n1, inst.n2, inst.m2

    nz = n1 + S * n2
    obj = np.concatenate([c] + [q / S] * S)
    rows_ub, rhs_ub, rows_eq, rhs_eq = [], [], [], []

    def add(row, rhs, sense):
        if sense == 0:
            rows_eq.append(row)
            rhs_eq.append(rhs)
        elif sense == 1:                       # '>='
            rows_ub.append(-row)
            rhs_ub.append(-rhs)
        else:
            rows_ub.append(row)
            rhs_ub.append(rhs)

    for i in range(A1.shape[0]):
        row = np.zeros(nz)
        row[:n1] = A1[i]
        add(row, b1[i], s1[i])
    for s in range(S):
        off = n1 + s * n2
        for i in range(m2):
            row = np.zeros(nz)
            row[:n1] = T[i]
            row[off:off + n2] = W[i]
            add(row, r_s[s, i], s2[i])

    def box(lo, hi):
        return [(l if np.isfinite(l) else None, h if np.isfinite(h) else None)
                for l, h in zip(lo, hi)]

    bounds = box(np.asarray(a.lb1, np.float64), np.asarray(a.ub1, np.float64))
    bounds += box(np.asarray(a.lb2, np.float64),
                  np.asarray(a.ub2, np.float64)) * S
    res = scipy.optimize.linprog(
        obj, A_ub=np.asarray(rows_ub), b_ub=np.asarray(rhs_ub),
        A_eq=np.asarray(rows_eq) if rows_eq else None,
        b_eq=np.asarray(rhs_eq) if rows_eq else None,
        bounds=bounds, method="highs")
    assert res.status == 0, res.message
    return float(res.fun)


@pytest.mark.slow
def test_cut_model_min_bounds_saa_optimum_lands():
    """After 60 lands iterations the exact cut-model minimum must sit at
    or below the SAA extensive-form optimum over the same 60 scenarios —
    the deterministic inequality the certification rests on."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    solver = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=2)
    solver.run(60)
    lb = solver.cut_model_lower_bound()
    v_saa = _saa_ef_optimum(inst, solver.state)
    assert lb <= v_saa + 1e-8, (lb, v_saa)
    # and the bound is non-trivial: far above the vacuous lb_e = 0 model
    assert lb > 300.0, lb
    # the proxy the reference prints evaluates the same model at one
    # point, so it can never sit below the model minimum
    assert lb <= solver.lower_estimate + 1e-8


@pytest.mark.slow
def test_cut_model_min_vs_estimate_scaled_f32():
    """With objective normalization + f32 state (production mode) the
    host f64 LP still agrees with the on-device model: min <= value at
    the candidate, in UNSCALED units."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float32)
    cfg = SDConfig(max_scenarios=128, max_dual_vertices=128, max_cuts=24,
                   pdhg=PDHGConfig(tol=1e-6, max_iters=20_000),
                   qp=QPConfig(tol=1e-7, max_iters=4_000))
    assert cfg.normalize_objective
    solver = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=5)
    solver.run(50)
    lb = solver.cut_model_lower_bound()
    assert lb <= solver.lower_estimate + 1e-3 * (1 + abs(lb))
    assert lb > 300.0


@pytest.mark.slow
def test_certified_bound_replications_newsvendor():
    """R=4 newsvendor replications with the Benders polish (default):
    every per-replication bound must equal its own SAA extensive-form
    optimum within the polish gap tolerance (and never exceed it), and
    lb_cert = mean - t-half-width must respect the known optimum 1.0."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=4, seed=11)
    s.run(120)
    out = s.certified_lower_bound(method="polish")
    assert out["n_replications"] == 4
    assert len(out["lb_per_rep"]) == 4
    for r, (state, lb_r) in enumerate(zip(s.states, out["lb_per_rep"])):
        v_saa = _saa_ef_optimum(inst, state)
        # never above the SAA optimum (validity), and the polish drives
        # it tight from below (quality)
        assert lb_r <= v_saa + 1e-8, (r, lb_r, v_saa)
        assert lb_r >= v_saa - 1e-3 * (1 + abs(v_saa)), (r, lb_r, v_saa)
    assert out["lb_cert"] == pytest.approx(
        out["lb_mean"] - out["lb_half_width"])
    # exact optimum is 1.0 (instances/newsvendor)
    assert out["lb_cert"] <= 1.0 + 0.05
    assert out["lb_cert"] > 0.8

    # the unpolished route stays available and is never tighter
    raw = s.certified_lower_bound(method="model")
    assert raw["lb_mean"] <= out["lb_mean"] + 1e-8

    # the EF-dual route (the default): one extensive-form solve per
    # replication; its aggregate-cut minimum equals each SAA optimum to
    # the solve tolerance (epsilon-feasible duals, refined in f64)
    ef = s.certified_lower_bound(method="ef")
    for r, state in enumerate(s.states):
        v_saa = _saa_ef_optimum(inst, state)
        assert abs(ef["lb_per_rep"][r] - v_saa) <= 1e-3 * (1 + abs(v_saa))
    assert np.all(ef["dual_infeas_per_rep"] <= 1e-4)


@pytest.mark.slow
def test_certified_bound_extended_stream_newsvendor():
    """extra_scenarios mode: the SD cuts are excluded, the polish
    certifies v_{N+extra} from its own cuts alone, and the bound must
    respect the exact optimum 1.0 with a tight polish gap."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=3, seed=21)
    s.run(100)
    out = s.certified_lower_bound(method="polish", polish_rounds=16,
                                  extra_scenarios=412)
    assert out["n_scenarios"] == 512
    # polish converged on the tiny instance: lb == exact SAA value at
    # the final point (within tolerance), and the larger sample keeps
    # the per-replication optima near the true 1.0
    assert np.all(out["polish_gap_per_rep"] < 1e-3)
    assert np.all(np.abs(out["lb_per_rep"] - 1.0) < 0.2)
    assert out["lb_cert"] <= 1.0 + 0.05

    # EF route over the same extended streams: same certification target
    # v_{N+extra}, one joint solve per replication
    from sqlp_tpu.config import PDHGConfig as _P
    ef = s.certified_lower_bound(method="ef", extra_scenarios=412,
                                 seed=9000,
                                 ef_config=_P(tol=1e-6, max_iters=120000))
    assert np.all(ef["ef_err_per_rep"] <= 2e-4), ef["ef_err_per_rep"]
    assert ef["n_scenarios"] == 512
    assert np.all(np.abs(ef["lb_per_rep"] - 1.0) < 0.2)
    # both routes bound the SAME per-replication SAA optimum; they must
    # agree to the EF gap + polish gap
    assert np.all(np.abs(ef["lb_per_rep"] - out["lb_per_rep"]) < 0.02), \
        (ef["lb_per_rep"], out["lb_per_rep"])


@pytest.mark.slow
def test_certified_bound_fresh_stratified_newsvendor():
    """fresh_scenarios mode: certification over fresh Latin-hypercube
    streams. Stratified sample averages stay unbiased per x (the bound
    argument holds) while v_N concentrates — on the 3-outcome newsvendor
    the stratified empirical distribution is near-exact, so every
    replication's bound must land within 2% of the true optimum 1.0."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=3, seed=5)
    s.run(80)
    out = s.certified_lower_bound(
        method="ef", fresh_scenarios=512,
        ef_config=PDHGConfig(tol=1e-7, max_iters=120_000))
    assert out["n_scenarios"] == 512
    assert np.all(np.abs(out["lb_per_rep"] - 1.0) < 0.02), out["lb_per_rep"]
    assert out["lb_half_width"] < 0.02


@pytest.mark.slow
def test_fresh_polish_hits_known_optima():
    """polish + fresh Latin-hypercube streams: the bundle converges
    exactly on small instances and stratification kills the SAA spread,
    so the certified bound must land ON the known optimum (newsvendor
    1.0) — the flagship property of the small-instance route (and the
    regression test for the Kelley-companion fix: chasing only the rich
    model's argmin left a replication stuck at the epigraph floor)."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=3, seed=5)
    s.run(80)
    out = s.certified_lower_bound(method="polish", polish_rounds=16,
                                  fresh_scenarios=512)
    assert np.all(np.abs(out["lb_per_rep"] - 1.0) < 1e-3), out["lb_per_rep"]
    assert abs(out["lb_cert"] - 1.0) < 2e-3
    assert np.all(out["polish_gap_per_rep"] < 1e-3)


@pytest.mark.slow
def test_cut_refresh_keeps_bound_valid():
    """cut_refresh_every rebuilds live cuts at their generating points at
    full weight; the refreshed model must still under-estimate the SAA
    optimum (refreshed cuts are ordinary SASA cuts), marks must show the
    refresh happened, and the trajectory stays convergent."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    cfg = _CFG.replace(cut_refresh_every=16)
    solver = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=2)
    solver.run(60)
    live = np.asarray(solver.state.cut_live)
    marks = np.asarray(solver.state.cut_mark)
    # every live cut was either refreshed at iteration 48 (mark reset to
    # the then-total weight 48) or inserted later
    assert marks[live].min() >= 48 - 1e-9, marks[live]
    lb = solver.cut_model_lower_bound()
    v_saa = _saa_ef_optimum(inst, solver.state)
    assert lb <= v_saa + 1e-8, (lb, v_saa)
    assert lb > 300.0
    ub = solver.evaluate(n_samples=2000)
    assert abs(ub - 381.8533) < 8.0


def test_cut_refresh_replicated_path():
    """cut_refresh_every through sd_step_replicated (the uniform lockstep
    gate + vmapped rebuild): marks show the refresh fired on every
    replication and the runs stay convergent."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    cfg = _CFG.replace(cut_refresh_every=16)
    s = SDReplications(inst, cfg, n_replications=2, seed=3)
    s.run(40)
    live = np.asarray(s.state.cut_live)        # [R, E, K]
    marks = np.asarray(s.state.cut_mark)
    for r in range(2):
        assert marks[r][live[r]].min() >= 32 - 1e-9, marks[r][live[r]]
    assert np.all(np.isfinite(s.lower_estimates))


@pytest.mark.slow
def test_ef_chunked_matches_continuous():
    """solve_extensive_form_chunked: warm-started chains must converge
    like one continuous solve, and a chunk can never end worse than its
    warm start (the best-iterate init fix)."""
    require_instance("lands")
    import jax as _j
    from sqlp_tpu.models.crash import (solve_extensive_form,
                                       solve_extensive_form_chunked)
    from sqlp_tpu.models.scenario import sample_deltas

    inst = load_instance("lands", dtype=jnp.float64)
    deltas = sample_deltas(_j.random.PRNGKey(2), inst.scenario_model, 40)
    probs = jnp.full((40,), 1.0 / 40, jnp.float64)
    cfg = PDHGConfig(tol=1e-7, max_iters=12_000)
    x1, o1, s1 = solve_extensive_form(inst.arrays, inst.scenario_model,
                                      deltas, probs, cfg)
    out = solve_extensive_form_chunked(inst.arrays, inst.scenario_model,
                                       deltas, probs, cfg,
                                       chunk_iters=2_000)
    o2, s2 = out[1], out[2]
    assert abs(float(o1) - float(o2)) <= 1e-4 * (1 + abs(float(o1)))
    assert float(s2["ef_err"]) <= 10 * max(float(s1["ef_err"]), cfg.tol)
    # monotonicity at the chunk boundary: a warm chunk starts at its
    # predecessor's best iterate and can only improve on it
    c1 = PDHGConfig(tol=1e-12, max_iters=2_000)
    r1 = solve_extensive_form(inst.arrays, inst.scenario_model, deltas,
                              probs, c1, return_duals=True)
    r2 = solve_extensive_form(inst.arrays, inst.scenario_model, deltas,
                              probs, c1, return_duals=True,
                              x0=r1[0], Y0=r1[4], U0=r1[3], u00=r1[5],
                              omega0=r1[2]["ef_omega"])
    assert float(r2[2]["ef_err0"]) <= float(r1[2]["ef_err"]) * (1 + 1e-6)
    assert float(r2[2]["ef_err"]) <= float(r2[2]["ef_err0"]) * (1 + 1e-6)


def test_t_lower_bound_rejected_replication_is_visible():
    """A rejected certificate (-inf per-rep bound) must surface as a
    visible -inf lb_cert with a warning naming the replication — not as
    nan from mean/std arithmetic (the CLI printed 'lb_cert=nan')."""
    from sqlp_tpu.sd.lower_bound import t_lower_bound

    with pytest.warns(UserWarning, match=r"replications \[1\]"):
        out = t_lower_bound(np.array([9.5, -np.inf, 9.7]))
    assert out["lb_cert"] == -np.inf
    assert out["lb_mean"] == -np.inf
    assert not np.isnan(out["lb_cert"])


@pytest.mark.slow
def test_certified_bound_single_replication_warns():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    s = SDReplications(inst, _CFG, n_replications=1, seed=0)
    s.run(20)
    with pytest.warns(UserWarning, match="one replication"):
        out = s.certified_lower_bound()
    assert out["lb_cert"] == -np.inf
    assert np.isfinite(out["lb_mean"])


@pytest.mark.slow
def test_solve_to_certified_gap_stops_early():
    """Certified-gap-aware stopping (beyond the reference's open
    stopping-criteria TODO, readme.md:18): on newsvendor the polish
    route + fresh stratified streams certify essentially the exact
    optimum, so the loop must stop at the FIRST certification round —
    well before max_iters — and report a valid bracket around the known
    optimum 1.0 with a time-to-certified-gap."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=3, seed=5)
    out = s.solve_to_certified_gap(
        0.2, max_iters=400, certify_every=80, method="polish",
        min_ub_samples=2048, max_ub_samples=2048,
        polish_rounds=16, fresh_scenarios=512)
    assert out["stopped"], out
    assert out["iters"] == 80                      # first round crossed
    assert len(out["rounds"]) == 1
    assert out["cert_gap"] <= 0.2
    assert out["time_to_certified_gap_s"] is not None
    # bracket validity around the exact optimum 1.0
    assert out["lb_cert"] <= 1.0 + 1e-3
    ub_hi = out["compromise_mc_ub"] + out["compromise_mc_ub_half_width"]
    assert ub_hi >= 1.0 - 1e-3
    # the escalation must only fire when the free route misses
    assert out["route"] in ("model", "polish")


@pytest.mark.slow
def test_ef_refine_modes_all_valid_newsvendor():
    """All three dual-repair modes (minimal-movement projection, raw +
    exact corrections, warm f64 re-solve) must produce valid bounds; on
    newsvendor's NON-degenerate recourse all three also stay tight at
    the exact optimum 1.0. (On degenerate instances only the projection
    preserves tightness — ssn measurements in RESULTS.md r5 — which is
    why it is the default.)"""
    require_instance("newsvendor")
    from sqlp_tpu.sd.lower_bound import saa_ef_bound

    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=2, seed=5)
    s.run(60)
    for kw in ({"refine_mode": "project"},
               {"refine_duals": False, "host_exact_cap": 0},
               {"refine_mode": "resolve"}):
        out = saa_ef_bound(s.arrays, s.scenario_model, s.espec, s.states,
                           s.config, obj_scale=s.obj_scale,
                           fresh_scenarios=256, **kw)
        assert np.all(out["lb_per_rep"] <= 1.0 + 1e-3), (kw, out)
        assert np.all(out["lb_per_rep"] >= 1.0 - 0.05), (kw, out)
        assert "x_ef_per_rep" in out
        assert out["x_ef_per_rep"].shape == (2, inst.n1)


@pytest.mark.slow
def test_ef_polish_combo_route():
    """method='ef_polish': bundle cuts over the SAME fresh streams merge
    into the EF bound model (extra_cuts), so the combined bound can only
    match or beat the bundle's own."""
    require_instance("newsvendor")
    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=2, seed=5)
    s.run(60)
    out = s.certified_lower_bound(method="ef_polish", polish_rounds=4,
                                  fresh_scenarios=256)
    assert np.all(out["lb_per_rep"] >= out["polish_lb_per_rep"] - 1e-6)
    assert abs(out["lb_mean"] - 1.0) < 0.05


def test_antithetic_complement_coupling():
    """sample_deltas(complement=True) must return the exact antithetic
    complement of the same key's panel: uniform marginals satisfy
    v + v_c = 2*left + width, normal marginals v + v_c = 2*mean, and
    both panels carry the target distribution (same mean up to
    sampling error)."""
    import jax
    from sqlp_tpu.models.scenario import sample_values

    require_instance("transship")
    inst = load_instance("transship", dtype=jnp.float64)
    sm = inst.scenario_model
    key = jax.random.PRNGKey(3)
    a = np.asarray(sample_values(key, sm, 512, method="stratified"),
                   np.float64)
    b = np.asarray(sample_values(key, sm, 512, method="stratified",
                                 complement=True), np.float64)
    from sqlp_tpu.models.scenario import DIST_NORMAL, DIST_UNIFORM
    dist = np.asarray(sm.dist_type)
    for k in range(sm.n_rv):
        if dist[k] == DIST_UNIFORM:
            lo = float(np.asarray(sm.left)[k])
            w = float(np.asarray(sm.width)[k])
            np.testing.assert_allclose(a[:, k] + b[:, k], 2 * lo + w,
                                       rtol=1e-12)
        elif dist[k] == DIST_NORMAL:
            mu = float(np.asarray(sm.mean)[k])
            np.testing.assert_allclose(a[:, k] + b[:, k], 2 * mu,
                                       atol=1e-6 * (1 + abs(mu)))


@pytest.mark.slow
def test_antithetic_replication_pairing_bound():
    """certified_lower_bound(antithetic_reps=True): replication 2k+1
    certifies the complement stream of 2k; the t-interval aggregates
    the R/2 pair means. On newsvendor the bound must still land on the
    exact optimum; the streams must actually differ across the pair."""
    require_instance("newsvendor")
    from sqlp_tpu.sd.lower_bound import _certification_streams

    inst = load_instance("newsvendor", dtype=jnp.float64)
    cfg = _CFG.replace(max_scenarios=256)
    s = SDReplications(inst, cfg, n_replications=4, seed=5)
    s.run(60)
    d, w, inc = _certification_streams(
        s.states, s.scenario_model, 4, 1, 60, 0, 256, 9000,
        "stratified", "antithetic")
    assert not np.allclose(d[0], d[1])       # complement, not a copy
    assert np.allclose(np.sort(d[0], axis=1), np.sort(d[1], axis=1)) or \
        abs(d[0].mean() - d[1].mean()) < 0.5  # same marginal, coupled
    out = s.certified_lower_bound(method="ef", fresh_scenarios=256,
                                  antithetic_reps=True)
    assert out["n_replications"] == 2        # pair means
    assert abs(out["lb_mean"] - 1.0) < 0.05
    assert out["lb_cert"] <= 1.0 + 1e-3
