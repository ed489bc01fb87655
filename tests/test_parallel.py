"""Distribution tests: sharded-vs-single-device consistency and the
multi-epigraph configuration (the reference's marquee extension:
readme.md:5-9 'multiple weighted epigraph variables, each with its own
cut pool')."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.parallel.mesh import make_mesh, replicate, shard_state
from sqlp_tpu.sd.algorithm import sd_step
from sqlp_tpu.sd.driver import SDSolver
from sqlp_tpu.sd.state import default_epigraph_spec, init_state

from conftest import require_instance


def _lands_exact_objective(inst, x) -> float:
    """c@x + sum_s p_s Q(x, v_s) over lands' 3-outcome support — the exact
    extensive-form objective whose optimum is the reference golden
    381.8533333 (test/crash_test.jl:37). Recourse LPs solved by HiGHS f64."""
    from sqlp_tpu.models.routines import solve_lp_host
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    a = inst.arrays
    sm = inst.scenario_model
    vals = np.asarray(sm.values, np.float64)[0, :3]
    cdf = np.asarray(sm.cdf, np.float64)[0, :3]
    probs = np.diff(np.concatenate([[0.0], cdf]))
    deltas = jnp.asarray((vals - float(sm.base[0]))[:, None], jnp.float64)
    x = np.asarray(x, np.float64)
    H = np.asarray(_scenario_rhs(a, sm, deltas, jnp.asarray(x)), np.float64)
    q = np.asarray(a.q, np.float64)
    W = np.asarray(a.W, np.float64)
    s2 = np.asarray(a.senses2)
    lo = np.asarray(a.lb2, np.float64)
    hi = np.asarray(a.ub2, np.float64)
    rec = [solve_lp_host(q, W, H[i], s2, lo, hi)[0] for i in range(3)]
    return float(np.asarray(a.c, np.float64) @ x + probs @ rec)


_CFG = SDConfig(
    dtype="float64",
    max_scenarios=256, max_dual_vertices=64, max_cuts=16,
    pdhg=PDHGConfig(tol=1e-8, max_iters=10_000),
    qp=QPConfig(tol=1e-9, max_iters=4_000),
)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """Iterations on the 8-device mesh must match the unsharded run.

    Collective reductions reassociate floating point, so the trajectories
    agree to ~1e-13 per step until a binary branch (cut pruning, dual
    dedup, incumbent test) amplifies the difference — measured on lands:
    bitwise-level agreement through iteration 16, divergence at 17. The
    tight comparison therefore runs 12 iterations; a further 8 only check
    solution-level consistency.
    """
    require_instance("lands")
    assert jax.device_count() >= 8
    inst = load_instance("lands", dtype=jnp.float64)
    espec = default_epigraph_spec(1, 1.0, 0.0, dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])

    from sqlp_tpu.ops.pdhg import prepare_lp
    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)

    # single device
    s1 = init_state(inst, espec, _CFG, x0, jax.random.PRNGKey(3))
    for _ in range(12):
        s1, _ = sd_step(inst.arrays, inst.scenario_model, espec, prep,
                        s1, _CFG)

    # 8-device mesh
    mesh = make_mesh(8)
    arrays = replicate(inst.arrays, mesh)
    model = replicate(inst.scenario_model, mesh)
    espec_r = replicate(espec, mesh)
    prep_r = replicate(prep, mesh)
    s8 = shard_state(init_state(inst, espec, _CFG, x0,
                                jax.random.PRNGKey(3)), mesh)
    for _ in range(12):
        s8, _ = sd_step(arrays, model, espec_r, prep_r, s8, _CFG)

    np.testing.assert_allclose(np.asarray(s1.x_candidate),
                               np.asarray(s8.x_candidate), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s1.x_incumbent),
                               np.asarray(s8.x_incumbent), atol=1e-8)
    # Dual dedup sits on a 16-sig-bit rounding boundary; allow one flip.
    assert abs(int(s1.n_duals) - int(s8.n_duals)) <= 1
    assert int(jnp.sum(s1.cut_live)) == int(jnp.sum(s8.cut_live))

    # Past the chaotic branch horizon the trajectories are distinct but
    # both must remain VALID SD runs, so assert a valid-run invariant
    # instead of a loose norm on x: both incumbents' exact 3-scenario
    # extensive-form objectives agree within 1.0 (and neither sits below
    # the EF optimum 381.8533, which would mean a broken evaluation).
    for _ in range(8):
        s1, _ = sd_step(inst.arrays, inst.scenario_model, espec, prep,
                        s1, _CFG)
        s8, _ = sd_step(arrays, model, espec_r, prep_r, s8, _CFG)
    assert abs(int(s1.n_duals) - int(s8.n_duals)) <= 3
    f1 = _lands_exact_objective(inst, s1.x_incumbent)
    f8 = _lands_exact_objective(inst, s8.x_incumbent)
    assert f1 >= 381.8533 - 1e-6
    assert f8 >= 381.8533 - 1e-6
    assert abs(f1 - f8) < 1.0, (f1, f8)


@pytest.mark.slow
def test_multi_epigraph_lands():
    """Two epigraphs at weight 0.5 each (own scenario streams + cut pools)
    still bracket the lands optimum: E[0.5 Q + 0.5 Q'] = E[Q]."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    espec = default_epigraph_spec(2, 0.5, 0.0, dtype=jnp.float64)
    solver = SDSolver(inst, _CFG, espec=espec,
                      x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=9)
    solver.run(250)
    assert int(solver.state.n_scen[0]) == 250
    assert int(solver.state.n_scen[1]) == 250
    # each epigraph accumulated its own cuts
    assert int(jnp.sum(solver.state.cut_live[0])) >= 1
    assert int(jnp.sum(solver.state.cut_live[1])) >= 1
    lb = solver.lower_estimate
    ub = solver.evaluate(n_samples=4000)
    assert lb < 381.8533 + 0.5
    assert ub > 381.8533 - 0.5
    assert abs(ub - 381.8533) < 6.0


@pytest.mark.slow
def test_weighted_epigraphs_unequal():
    """Unequal weights w=[0.7, 0.3] with per-epigraph lower bounds — the
    weighted generalization the reference documents (readme.md:5-7)."""
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    espec = default_epigraph_spec(2, [0.7, 0.3], [0.0, -100.0],
                                  dtype=jnp.float64)
    solver = SDSolver(inst, _CFG, espec=espec,
                      x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=13)
    solver.run(250)
    ub = solver.evaluate(n_samples=4000)
    assert abs(ub - 381.8533) < 6.0


@pytest.mark.slow
def test_dual_pool_sharded_matches_single_device():
    """With the dual-vertex pool ALSO sharded over the mesh (the north
    star's second scaling axis), the sharded trajectory still matches the
    unsharded run — the step is written in global view, so XLA inserts
    the cross-shard argmax/dedup collectives."""
    require_instance("lands")
    assert jax.device_count() >= 8
    inst = load_instance("lands", dtype=jnp.float64)
    espec = default_epigraph_spec(1, 1.0, 0.0, dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])

    from sqlp_tpu.ops.pdhg import prepare_lp
    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)

    s1 = init_state(inst, espec, _CFG, x0, jax.random.PRNGKey(3))
    s1_hist = {}
    for it in range(12):
        s1, _ = sd_step(inst.arrays, inst.scenario_model, espec, prep,
                        s1, _CFG)
        s1_hist[it] = np.asarray(s1.x_candidate)

    mesh = make_mesh(8)
    arrays = replicate(inst.arrays, mesh)
    model = replicate(inst.scenario_model, mesh)
    espec_r = replicate(espec, mesh)
    prep_r = replicate(prep, mesh)
    s8 = shard_state(init_state(inst, espec, _CFG, x0,
                                jax.random.PRNGKey(3)), mesh,
                     shard_duals=True)
    # Sharding the dual pool reassociates the argmax-score reduction;
    # the SASA argmax is quantized (sd/cuts.py:quantized_argmax) so
    # near-tie picks are tiling-invariant and the sharded trajectory
    # matches the single-device one at EVERY iteration.
    for it in range(12):
        s8, _ = sd_step(arrays, model, espec_r, prep_r, s8, _CFG)
        np.testing.assert_allclose(np.asarray(s1_hist[it]),
                                   np.asarray(s8.x_candidate),
                                   atol=1e-8,
                                   err_msg=f"diverged at iteration {it}")

    scale = abs(float(s1.cand_est)) + 1.0
    assert abs(float(s1.cand_est) - float(s8.cand_est)) / scale < 5e-3
    assert abs(int(s1.n_duals) - int(s8.n_duals)) <= 2
    assert abs(int(jnp.sum(s1.cut_live)) - int(jnp.sum(s8.cut_live))) <= 1


@pytest.mark.slow
def test_mesh_2d_duals_by_scenarios():
    """2-D (duals x scenarios) mesh: each growth axis of the argmax
    matmul [D,R]x[R,S] on its own mesh dimension (SURVEY §5.7). The
    global-view step must reproduce the single-device trajectory over a
    short window and stay solution-consistent past it."""
    require_instance("lands")
    assert jax.device_count() >= 8
    from sqlp_tpu.parallel.mesh import make_mesh_2d
    inst = load_instance("lands", dtype=jnp.float64)
    espec = default_epigraph_spec(1, 1.0, 0.0, dtype=jnp.float64)
    x0 = np.array([3.0, 3.0, 3.0, 3.0])

    from sqlp_tpu.ops.pdhg import prepare_lp
    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)

    s1 = init_state(inst, espec, _CFG, x0, jax.random.PRNGKey(3))
    s1_hist = {}
    for it in range(12):
        s1, _ = sd_step(inst.arrays, inst.scenario_model, espec, prep,
                        s1, _CFG)
        s1_hist[it] = np.asarray(s1.x_candidate)

    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"duals": 2, "scenarios": 4}
    arrays = replicate(inst.arrays, mesh)
    model = replicate(inst.scenario_model, mesh)
    espec_r = replicate(espec, mesh)
    prep_r = replicate(prep, mesh)
    s2d = shard_state(init_state(inst, espec, _CFG, x0,
                                 jax.random.PRNGKey(3)), mesh)
    # verify the placement really is 2-D: dual pool sharded over axis 0,
    # scenario stores over the mesh's scenario axis
    d_shard = s2d.duals.sharding.spec
    s_shard = s2d.scen_deltas.sharding.spec
    assert d_shard[0] == "duals", d_shard
    assert s_shard[1] == "scenarios", s_shard

    for it in range(12):
        s2d, _ = sd_step(arrays, model, espec_r, prep_r, s2d, _CFG)
        np.testing.assert_allclose(s1_hist[it],
                                   np.asarray(s2d.x_candidate),
                                   atol=1e-8,
                                   err_msg=f"diverged at iteration {it}")

    scale = abs(float(s1.cand_est)) + 1.0
    assert abs(float(s1.cand_est) - float(s2d.cand_est)) / scale < 5e-3
    assert abs(int(s1.n_duals) - int(s2d.n_duals)) <= 2
    assert abs(int(jnp.sum(s1.cut_live)) - int(jnp.sum(s2d.cut_live))) <= 1


@pytest.mark.slow
def test_mesh_2d_driver_end_to_end():
    """SDSolver(mesh_shape=(2,4)): 60 iterations + sharded MC evaluation
    land in the lands neighborhood."""
    require_instance("lands")
    assert jax.device_count() >= 8
    inst = load_instance("lands", dtype=jnp.float64)
    solver = SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]),
                      seed=4, mesh_shape=(2, 4))
    solver.run(60)
    assert np.isfinite(solver.lower_estimate)
    ub = solver.evaluate(n_samples=2048)
    assert abs(ub - 381.8533) < 8.0, ub
