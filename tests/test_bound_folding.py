"""Nontrivial second-stage variable bounds: folded into explicit rows.

The reference only WARNS when stage-2 vars carry finite bounds
(extract_coefficients, /root/reference/src/sd_algorithm/subprob.jl:17-27)
and then builds cuts from constraint duals alone — a binding bound's
multiplier lands on the bound, invisible to pi, so the cuts are invalid.
Instance compilation here folds each finite bound into an explicit
recourse row (models/instance.py, fold_bounds=True default), making the
multiplier a row dual that every consumer (SASA cuts, argmax, crossover)
sees. All six reference instances have trivial stage-2 bounds, so the
fold is a no-op there (asserted below).

Fixture: instances/saleslim — newsvendor with salvage capacity Y2 <= 2
(BOUNDS UP). Exact optimum -3.9 at x = 6 (analytic; cross-checked by
HiGHS over the 3-outcome support in-test).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import solve_lp_host

EXACT_OBJ = -3.9
EXACT_X = 6.0
SUPPORT = [(2.0, 0.3), (6.0, 0.4), (10.0, 0.3)]


@pytest.fixture(scope="module")
def inst():
    return load_instance("saleslim")


def _exact_recourse(inst, xv, d):
    """Exact Q(x, d) through the folded system (HiGHS, f64)."""
    a = inst.arrays
    h = np.concatenate([np.array([xv, d]),
                        np.asarray(a.r, np.float64)[2:]])
    ob, y, pi = solve_lp_host(
        np.asarray(a.q, np.float64), np.asarray(a.W, np.float64), h,
        np.asarray(a.senses2), np.asarray(a.lb2, np.float64),
        np.asarray(a.ub2, np.float64))
    return ob, y, pi


def test_fold_shapes(inst):
    # Y2's UP 2.0 became row [0, 1] <= 2 with the box opened
    a = inst.arrays
    assert inst.m2 == 3 and inst.sp2.n_rows == 2
    np.testing.assert_allclose(np.asarray(a.W)[2], [0.0, 1.0])
    assert float(a.r[2]) == 2.0 and int(a.senses2[2]) == -1
    assert np.isinf(np.asarray(a.ub2)).all()
    # T padded with zero rows: bound rows never involve x
    np.testing.assert_allclose(np.asarray(a.T)[2], 0.0)


def test_fold_noop_on_reference_instances():
    for name in ("lands", "newsvendor"):
        folded = load_instance(name)
        plain = load_instance(name, fold_bounds=False)
        assert folded.m2 == plain.m2
        np.testing.assert_array_equal(np.asarray(folded.arrays.W),
                                      np.asarray(plain.arrays.W))


def test_folded_duals_carry_bound_multiplier(inst):
    """At a demand where the salvage cap binds, the folded system's row
    dual on the bound row is nonzero — the information the reference's
    cut math loses."""
    ob, y, pi = _exact_recourse(inst, 6.0, 2.0)
    # d=2: sell 2, salvage capped at 2 -> Q = -4 - 1 = -5
    np.testing.assert_allclose(ob, -5.0, atol=1e-9)
    assert abs(pi[2]) > 1e-9        # bound row multiplier active


def test_unfolded_cuts_are_invalid_folded_are_valid(inst):
    """Demonstrate the failure the fold fixes: with the raw box system,
    the dual objective pi'(r - Tx) OVERestimates Q wherever the bound
    binds; the folded system's dual objective equals Q (strong duality
    on the full row set)."""
    plain = load_instance("saleslim", fold_bounds=False)
    xv = 6.0
    for d in (2.0, 6.0):
        # plain system: duals of the 2 template rows only
        a0 = plain.arrays
        h0 = np.array([xv, d])
        ob0, y0, pi0 = solve_lp_host(
            np.asarray(a0.q, np.float64), np.asarray(a0.W, np.float64),
            h0, np.asarray(a0.senses2), np.asarray(a0.lb2, np.float64),
            np.asarray(a0.ub2, np.float64))
        cutval_plain = float(pi0 @ h0)        # what the SASA math would use
        ob1, _, pi1 = _exact_recourse(inst, xv, d)
        h1 = np.concatenate([h0, [2.0]])
        cutval_folded = float(pi1 @ h1)
        np.testing.assert_allclose(ob0, ob1, atol=1e-9)
        np.testing.assert_allclose(cutval_folded, ob1, atol=1e-7)
        if d == 2.0:
            # bound binds: the unfolded dual objective misses -lambda*ub
            assert cutval_plain > ob0 + 0.5, (cutval_plain, ob0)


def test_extensive_form_golden(inst):
    from sqlp_tpu.models.crash import solve_extensive_form

    deltas = jnp.asarray([[d - 6.0] for (d, _) in SUPPORT], jnp.float32)
    probs = jnp.asarray([p for (_, p) in SUPPORT], jnp.float32)
    x, obj, st = solve_extensive_form(
        inst.arrays, inst.scenario_model, deltas, probs,
        PDHGConfig(tol=1e-7, max_iters=60_000))
    assert abs(float(obj) - EXACT_OBJ) <= 1e-3
    assert abs(float(x[0]) - EXACT_X) <= 1e-2


@pytest.mark.slow
def test_sd_converges_with_folded_bounds(inst):
    """End to end: SD on the folded system converges to the true optimum
    — the configuration the reference can only warn about."""
    from sqlp_tpu.sd.driver import SDSolver

    s = SDSolver(inst, SDConfig(quad_schedule="adaptive",
                                quad_scalar_init=0.1), seed=0)
    last = s.run(600)
    mean, hw, _ = s.evaluate_ci(min_samples=8192)
    assert float(last["cand_est"]) <= EXACT_OBJ + 0.5
    assert mean + hw >= EXACT_OBJ - 1e-3
    assert abs(float(s.x_incumbent[0]) - EXACT_X) < 1.0
    assert mean - hw <= EXACT_OBJ * 0.9
