"""Master prox-QP ADMM solver vs scipy oracles."""

import numpy as np
import pytest
import scipy.optimize
import jax.numpy as jnp

from sqlp_tpu.config import QPConfig
from sqlp_tpu.ops.prox_qp import solve_qp


def _solve_ref_qp(p, g, A, l, u):
    """Reference solve via scipy trust-constr."""
    nz = len(g)
    fun = lambda z: 0.5 * z @ (p * z) + g @ z
    jac = lambda z: p * z + g
    hess = lambda z: np.diag(p)
    con = scipy.optimize.LinearConstraint(A, l, u)
    res = scipy.optimize.minimize(
        fun, np.zeros(nz), jac=jac, hess=hess, method="trust-constr",
        constraints=[con], options={"gtol": 1e-12, "xtol": 1e-14})
    return res.x, res.fun


def test_qp_projection():
    """min 1/2||z - z0||^2 over a box: solution is the clipped z0."""
    nz = 6
    z0 = np.array([-3.0, -1.0, 0.5, 2.0, 5.0, 0.0])
    p = np.ones(nz)
    g = -z0
    A = np.eye(nz)
    l = -np.ones(nz)
    u = np.ones(nz)
    z, mu, st = solve_qp(jnp.asarray(p), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         jnp.zeros(nz, bool), QPConfig())
    assert bool(st["qp_converged"])
    np.testing.assert_allclose(np.asarray(z), np.clip(z0, -1, 1), atol=1e-6)


def test_qp_master_shape():
    """A master-like QP: x in R^3, one epigraph eta with 3 cuts.

    min c@x + 1*eta + rho/2||x - x0||^2
    s.t. sum(x) >= 1, 0 <= x <= 2, eta >= a_k + b_k@x.
    Checked against scipy trust-constr; also eta* equals the max cut and the
    active cut's multiplier is the only nonzero one (the prune signal the
    reference reads, src/sd_algorithm/algorithm.jl:58-69).
    """
    rho = 0.5
    c = np.array([1.0, 0.5, 0.2])
    x0 = np.array([0.3, 0.3, 0.3])
    alphas = np.array([0.0, 1.0, -2.0])
    betas = np.array([[1.0, 0.0, 0.0],
                      [-1.0, -1.0, -1.0],
                      [2.0, 2.0, 0.0]])
    nz = 4
    p = np.array([rho, rho, rho, 0.0])
    g = np.concatenate([c - rho * x0, [1.0]])
    rows = []
    l, u = [], []
    rows.append([1.0, 1.0, 1.0, 0.0]); l.append(1.0); u.append(np.inf)
    for j in range(3):
        e = np.zeros(nz); e[j] = 1.0
        rows.append(e); l.append(0.0); u.append(2.0)
    for k in range(3):
        rows.append(np.concatenate([-betas[k], [1.0]]))
        l.append(alphas[k]); u.append(np.inf)
    A = np.array(rows)
    l, u = np.array(l), np.array(u)

    z, mu, st = solve_qp(jnp.asarray(p), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         jnp.zeros(len(l), bool),
                         QPConfig(tol=1e-10, max_iters=20_000))
    assert bool(st["qp_converged"])
    z = np.asarray(z)
    z_ref, f_ref = _solve_ref_qp(p, g, A, l, u)
    np.testing.assert_allclose(z, z_ref, atol=1e-5)
    # eta* equals the active cut value
    cut_vals = alphas + betas @ z[:3]
    assert z[3] == pytest.approx(np.max(cut_vals), abs=1e-6)
    # strictly-slack cuts have ~zero multipliers (prune signal); ties at the
    # max may legitimately split the eta weight between multipliers
    mu = np.asarray(mu)[4:]
    slack = np.max(cut_vals) - cut_vals
    for k in range(3):
        if slack[k] > 1e-4:
            assert abs(mu[k]) < 1e-6
    # dual feasibility on eta: active multipliers sum to the eta weight
    assert -np.sum(mu) == pytest.approx(1.0, abs=1e-6)


def test_qp_dead_rows_zero_dual():
    """Zero rows with (-inf, inf) bounds (dead cut slots) get mu == 0."""
    nz = 2
    p = np.ones(nz)
    g = np.array([-1.0, -2.0])
    A = np.array([[1.0, 1.0], [0.0, 0.0], [0.0, 0.0]])
    l = np.array([-np.inf, -np.inf, -np.inf])
    u = np.array([1.0, np.inf, np.inf])
    z, mu, st = solve_qp(jnp.asarray(p), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         jnp.zeros(3, bool), QPConfig())
    assert bool(st["qp_converged"])
    np.testing.assert_allclose(np.asarray(mu)[1:], 0.0, atol=1e-8)
    # analytic: unconstrained opt (1,2) projected onto z1+z2 <= 1 -> (0,1)
    np.testing.assert_allclose(np.asarray(z), [0.0, 1.0], atol=1e-6)


def test_qp_equality_rows():
    """Equality rows (l == u, is_eq mask) are honored."""
    nz = 3
    p = np.ones(nz)
    g = np.zeros(nz)
    A = np.array([[1.0, 1.0, 1.0]])
    l = np.array([3.0]); u = np.array([3.0])
    z, mu, st = solve_qp(jnp.asarray(p), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         jnp.ones(1, bool), QPConfig())
    assert bool(st["qp_converged"])
    np.testing.assert_allclose(np.asarray(z), np.ones(3), atol=1e-6)


@pytest.mark.parametrize("fname", ["compqp.npz", "compqp2.npz",
                                   "compqp3.npz"])
def test_captured_compromise_qps_converge(fname):
    """Regression fixtures: three lands compromise QPs captured from runs
    where the ADMM exit missed tol 1e-7 by 1.4-2x (primal-lagging at a
    weakly-separated vertex, dual-lagging after a stall exit, and a far
    plateau). The exit repairs (primal hyperplane sweeps, dual LS
    multiplier correction) and the two-seed refined polish must close all
    three."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data", fname)
    d = np.load(path)
    z, mu, st = solve_qp(
        jnp.asarray(d["p_diag"]), jnp.asarray(d["g"]), jnp.asarray(d["A"]),
        jnp.asarray(d["l"]), jnp.asarray(d["u"]), jnp.asarray(d["is_eq"]),
        QPConfig(tol=1e-7, max_iters=8_000))
    assert bool(st["qp_converged"]), float(st["qp_err"])
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.all(np.isfinite(np.asarray(mu)))


def test_stale_warm_start_triggers_cold_restart():
    """Regression: a lands master QP (seed 5, iteration 85) whose
    previous-iteration warm start traps ADMM in a basin the rho-adaptation
    deadband never escapes — the warm solve exits at err ~1.7e-2 (a
    whole-unit stage-1 violation) while a cold start converges to 3e-16.
    solve_qp must detect the missed tolerance and re-run cold; the
    infeasible-incumbent chain this caused is separately gated in
    sd_step (candidate feasibility check)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "master_qp_warm_stall_lands.npz")
    d = np.load(path)
    z, mu, st = solve_qp(
        jnp.asarray(d["p"]), jnp.asarray(d["g"]), jnp.asarray(d["A"]),
        jnp.asarray(d["l"]), jnp.asarray(d["u"]), jnp.asarray(d["is_eq"]),
        QPConfig(tol=1e-9, max_iters=4_000),
        z0=jnp.asarray(d["warm_z"]), mu0=jnp.asarray(d["warm_mu"]))
    assert bool(st["qp_converged"]), float(st["qp_err"])
    # the true optimum has x = (0, 0, 12, 6.749...): sum-capacity row active
    zh = np.asarray(z)
    assert abs(zh[:4].sum() - 12.0) < 1e-6, zh


def test_rho_warm_start_round_trip():
    """rho_init threading: stats report the adapted penalty, and a
    re-solve warm-started at (z, mu, qp_rho) converges immediately —
    the SD master carries this across iterations (state.master_rho)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data", "compqp.npz")
    d = np.load(path)
    args = (jnp.asarray(d["p_diag"]), jnp.asarray(d["g"]),
            jnp.asarray(d["A"]), jnp.asarray(d["l"]), jnp.asarray(d["u"]),
            jnp.asarray(d["is_eq"]))
    cfg = QPConfig(tol=1e-7, max_iters=8_000)
    z, mu, st = solve_qp(*args, cfg)
    assert bool(st["qp_converged"])
    rho = st["qp_rho"]
    assert np.isfinite(float(rho)) and float(rho) > 0
    z2, mu2, st2 = solve_qp(*args, cfg, z0=z, mu0=mu, rho_init=rho)
    assert bool(st2["qp_converged"])
    assert int(st2["qp_iters"]) <= int(st["qp_iters"])
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_hard_stall_cap_bounds_iterations():
    """stall_hard_windows caps a solve that cannot (or only slowly can)
    reach tolerance, regardless of how far the error is from it: with the
    cap the solve uses strictly fewer iterations on a budget-burning
    problem and still returns finite iterates. The cap is OFF by default
    so accuracy-critical one-shot solves (compromise QPs) keep their full
    creeping budget."""
    import os
    assert QPConfig().stall_hard_windows == 0
    from sqlp_tpu.config import SDConfig
    assert SDConfig().qp.stall_hard_windows > 0
    path = os.path.join(os.path.dirname(__file__), "data", "compqp.npz")
    d = np.load(path)
    args = (jnp.asarray(d["p_diag"]), jnp.asarray(d["g"]),
            jnp.asarray(d["A"]), jnp.asarray(d["l"]), jnp.asarray(d["u"]),
            jnp.asarray(d["is_eq"]))
    # an unreachable tolerance forces the budget-burning regime
    base = QPConfig(tol=1e-16, max_iters=4_000)
    z0, mu0, st0 = solve_qp(*args, base)
    capped = QPConfig(tol=1e-16, max_iters=4_000, stall_hard_windows=2)
    z1, mu1, st1 = solve_qp(*args, capped)
    assert int(st1["qp_iters"]) < int(st0["qp_iters"])
    assert np.all(np.isfinite(np.asarray(z1)))
    assert np.all(np.isfinite(np.asarray(mu1)))
    assert np.isfinite(float(st1["qp_err"]))
