"""Dual-vertex crossover (ops/crossover.py).

The reference's cuts are built from exact simplex dual vertices
(src/smps/smps_routines.jl:58-61); our PDHG duals are epsilon-optimal.
The crossover must (a) recover vertex-quality duals from perturbed /
loosely-converged first-order duals, (b) never accept an infeasible or
objective-losing point, (c) measurably tighten the dual objective that
feeds cut values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sqlp_tpu.config import PDHGConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import solve_lp_host
from sqlp_tpu.models.scenario import sample_deltas
from sqlp_tpu.ops.crossover import sharpen_duals
from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
from sqlp_tpu.sd.algorithm import _scenario_rhs

from conftest import require_instance


def _setup(name, B, x, seed=0):
    inst = load_instance(name, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    deltas = sample_deltas(key, inst.scenario_model, B)
    H = _scenario_rhs(inst.arrays, inst.scenario_model, deltas,
                      jnp.asarray(x, jnp.float64))
    return inst, np.asarray(H, np.float64)


def _host_solutions(inst, H):
    a = inst.arrays
    q = np.asarray(a.q, np.float64)
    W = np.asarray(a.W, np.float64)
    s2 = np.asarray(a.senses2)
    lb = np.asarray(a.lb2, np.float64)
    ub = np.asarray(a.ub2, np.float64)
    objs, Ys, Pis = [], [], []
    for h in H:
        o, y, pi = solve_lp_host(q, W, h, s2, lb, ub)
        objs.append(o), Ys.append(y), Pis.append(pi)
    return np.asarray(objs), np.asarray(Ys), np.asarray(Pis)


def _dual_feas_err(inst, P):
    a = inst.arrays
    q = np.asarray(a.q, np.float64)
    W = np.asarray(a.W, np.float64)
    lb = np.asarray(a.lb2, np.float64)
    ub = np.asarray(a.ub2, np.float64)
    g = q[None, :] - P @ W
    viol = (np.where(~np.isfinite(ub)[None, :], np.maximum(-g, 0.0), 0.0)
            + np.where(~np.isfinite(lb)[None, :], np.maximum(g, 0.0), 0.0))
    return np.linalg.norm(viol, axis=-1) / (1.0 + np.linalg.norm(q))


def test_recovers_vertex_from_perturbed_dual():
    """Shrinking an exact dual toward zero mimics an interior first-order
    iterate; the crossover must recover (at least) vertex-level dual
    objective from the exact primal's active structure."""
    require_instance("transship")
    inst, H = _setup("transship", B=6, x=np.zeros(7))
    objs, Ys, Pis = _host_solutions(inst, H)
    a = inst.arrays

    Pi_interior = 0.9 * Pis  # feasible for >=-row duals scaled toward 0
    Pi_s, accepted = sharpen_duals(
        a.W, a.q, a.senses2, a.lb2, a.ub2,
        jnp.asarray(H), jnp.asarray(Ys), jnp.asarray(Pi_interior))
    Pi_s = np.asarray(Pi_s)
    assert np.asarray(accepted).all()
    # vertex dual objective == LP optimum (strong duality; RHS-only
    # bound terms vanish: transship has lb=0, ub=inf)
    np.testing.assert_allclose((Pi_s * H).sum(-1), objs, rtol=1e-6)
    assert (_dual_feas_err(inst, Pi_s) < 1e-7).all()


def test_never_loses_objective_or_feasibility_on_pdhg_duals():
    require_instance("lands")
    x = np.array([5.0, 5.0, 5.0, 5.0])
    inst, H = _setup("lands", B=8, x=x, seed=3)
    a = inst.arrays
    prep = prepare_lp(a.W, a.senses2, a.q, a.lb2, a.ub2)
    # loose tolerance: visibly interior duals
    obj, Y, Pi, stats = solve_batch(prep, jnp.asarray(H),
                                    PDHGConfig(tol=1e-5, max_iters=20_000))
    Pi_s, accepted = sharpen_duals(a.W, a.q, a.senses2, a.lb2, a.ub2,
                                   jnp.asarray(H), Y, Pi)
    Pi_s, Pi = np.asarray(Pi_s), np.asarray(Pi)
    d_new = (Pi_s * H).sum(-1)
    d_old = (Pi * H).sum(-1)
    assert (d_new >= d_old - 1e-9 * (1.0 + np.abs(d_old))).all()
    assert (_dual_feas_err(inst, Pi_s) < 1e-5).all()
    # the exact optima upper-bound every feasible dual objective
    objs, _, _ = _host_solutions(inst, H)
    assert (d_new <= objs + 1e-6 * (1.0 + np.abs(objs))).all()
    # and at least one element should actually have been sharpened
    assert np.asarray(accepted).any()


def test_rejects_when_vertex_is_infeasible():
    """A garbage primal point produces a wrong active set; the rounded
    dual must be rejected, keeping the input."""
    require_instance("lands")
    x = np.array([5.0, 5.0, 5.0, 5.0])
    inst, H = _setup("lands", B=4, x=x, seed=5)
    a = inst.arrays
    objs, Ys, Pis = _host_solutions(inst, H)
    Y_bad = np.full_like(Ys, 0.37)  # interior everywhere -> overdetermined
    Pi_s, accepted = sharpen_duals(a.W, a.q, a.senses2, a.lb2, a.ub2,
                                   jnp.asarray(H), jnp.asarray(Y_bad),
                                   jnp.asarray(Pis))
    acc = np.asarray(accepted)
    Pi_s = np.asarray(Pi_s)
    # rejected elements must pass the input through bitwise
    np.testing.assert_array_equal(Pi_s[~acc], Pis[~acc])
    # any accepted element must still be feasible and not lose objective
    if acc.any():
        assert (_dual_feas_err(inst, Pi_s[acc]) < 1e-5).all()
        d_new = (Pi_s[acc] * H[acc]).sum(-1)
        d_old = (Pis[acc] * H[acc]).sum(-1)
        assert (d_new >= d_old - 1e-9 * (1.0 + np.abs(d_old))).all()


@pytest.mark.parametrize("name,x", [("lands", [5.0, 5.0, 5.0, 5.0]),
                                    ("transship", [0.0] * 7)])
def test_sharpened_pdhg_duals_reach_host_vertex_objective(name, x):
    """End to end: loose PDHG + crossover ~= exact solver dual objective."""
    require_instance(name)
    inst, H = _setup(name, B=8, x=np.asarray(x), seed=7)
    a = inst.arrays
    prep = prepare_lp(a.W, a.senses2, a.q, a.lb2, a.ub2)
    obj, Y, Pi, stats = solve_batch(prep, jnp.asarray(H),
                                    PDHGConfig(tol=1e-6, max_iters=40_000))
    Pi_s, _ = sharpen_duals(a.W, a.q, a.senses2, a.lb2, a.ub2,
                            jnp.asarray(H), Y, Pi)
    objs, _, _ = _host_solutions(inst, H)
    d_new = (np.asarray(Pi_s) * H).sum(-1)
    np.testing.assert_allclose(d_new, objs, rtol=1e-5, atol=1e-7)
