"""Aux subsystems: checkpoint/resume determinism, metrics sink."""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDSolver
from sqlp_tpu.utils.checkpoint import load_meta, load_state, save_state
from sqlp_tpu.utils.metrics import MetricsLogger

from conftest import require_instance

_CFG = SDConfig(
    dtype="float64",
    max_scenarios=128, max_dual_vertices=64, max_cuts=16,
    pdhg=PDHGConfig(tol=1e-8, max_iters=10_000),
    qp=QPConfig(tol=1e-9, max_iters=4_000),
)


def _solver():
    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    return SDSolver(inst, _CFG, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=5)


@pytest.mark.slow
def test_checkpoint_resume_exact_trajectory(tmp_path):
    """10 iters -> checkpoint -> 10 more must equal 20 straight iters
    bitwise (checkpoint restores the PRNG key; SURVEY.md §5.4)."""
    path = str(tmp_path / "ckpt.npz")

    a = _solver()
    a.run(10)
    save_state(path, a.state, instance="lands")
    a.run(10)

    b = _solver()
    b.state = load_state(path, template=b.state)
    assert int(b.state.it) == 10
    b.run(10)

    np.testing.assert_array_equal(a.x_candidate, b.x_candidate)
    np.testing.assert_array_equal(a.x_incumbent, b.x_incumbent)
    assert int(a.state.n_duals) == int(b.state.n_duals)
    assert load_meta(path)["instance"] == "lands"


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    a = _solver()
    save_state(path, a.state)
    small = SDSolver(a.inst, _CFG.replace(max_cuts=8),
                     x0=np.zeros(4), seed=5)
    try:
        load_state(path, template=small.state)
        raise AssertionError("expected shape mismatch rejection")
    except ValueError as e:
        assert "shape" in str(e)


@pytest.mark.slow
def test_checkpoint_missing_scalar_field_defaults(tmp_path):
    """A checkpoint written before SDState grew a scalar field (e.g.
    master_rho) must still load: the scalar defaults from the template
    instead of hard-erroring (ADVICE r2). Missing ARRAY fields still
    reject — there is no safe default for pool contents."""
    import warnings

    path = str(tmp_path / "ckpt.npz")
    a = _solver()
    a.run(3)
    save_state(path, a.state, instance="lands")

    # Strip a scalar field from the archive, as an old-version file would.
    with np.load(path) as z:
        payload = {k: z[k] for k in z.files}
    assert payload["master_rho"].ndim == 0
    del payload["master_rho"]
    np.savez(path, **payload)

    b = _solver()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        b.state = load_state(path, template=b.state)
    assert any("master_rho" in str(x.message) for x in w)
    assert float(b.state.master_rho) == float(b.state.master_rho)  # finite
    np.testing.assert_array_equal(
        np.asarray(b.state.x_candidate), np.asarray(a.state.x_candidate))

    # An array field must still hard-error.
    del payload["x_candidate"]
    payload["master_rho"] = np.asarray(0.1)
    np.savez(path, **payload)
    try:
        load_state(path, template=_solver().state)
        raise AssertionError("expected missing-array rejection")
    except ValueError as e:
        assert "x_candidate" in str(e)


@pytest.mark.slow
def test_checkpoint_pre_weighted_stream_loads(tmp_path):
    """A checkpoint from before weighted streams (no n_stream array) must
    restore n_stream = total_weight exactly — every earlier run used unit
    weights, where the stream count IS the total weight — so resumed
    reservoir sampling continues the same inclusion probabilities."""
    path = str(tmp_path / "ckpt.npz")
    a = _solver()
    a.run(7)
    save_state(path, a.state, instance="lands")

    with np.load(path) as z:
        payload = {k: z[k] for k in z.files}
    del payload["n_stream"]
    np.savez(path, **payload)

    b = _solver()
    b.state = load_state(path, template=b.state)
    np.testing.assert_array_equal(np.asarray(b.state.n_stream),
                                  np.asarray(a.state.total_weight,
                                             np.int32))
    # and the resumed trajectory still matches a straight run
    a.run(5)
    b.run(5)
    np.testing.assert_array_equal(a.x_candidate, b.x_candidate)


def test_metrics_jsonl_sink(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as log:
        log.log({"it": jnp.asarray(1), "cand_est": jnp.asarray(2.5),
                 "is_improved": jnp.asarray(True),
                 "x_candidate": jnp.zeros(4)},  # non-scalar -> dropped
                tag="t")
        log.log({"it": 2, "bad": float("nan")})
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["it"] == 1
    assert lines[0]["cand_est"] == 2.5
    assert lines[0]["is_improved"] is True
    assert lines[0]["tag"] == "t"
    assert "x_candidate" not in lines[0]
    assert "bad" not in lines[1]
    assert "wall_s" in lines[0]


@pytest.mark.slow
def test_checkpoint_legacy_replicated_cut_x(tmp_path):
    """Pre-round-4 REPLICATED checkpoints (no cut_x field, [R, E, K] cut
    arrays) must load with per-replication incumbent defaults — the shim
    originally assumed single-run shapes and crashed unpacking."""
    from sqlp_tpu.sd.driver import SDReplications

    cfg = SDConfig(dtype="float64", max_scenarios=16, max_dual_vertices=16,
                   max_cuts=4,
                   pdhg=PDHGConfig(tol=1e-6, max_iters=2000),
                   qp=QPConfig(tol=1e-7, max_iters=2000))
    inst = load_instance("lands", dtype=jnp.float64)
    s = SDReplications(inst, cfg, n_replications=2, seed=0,
                       x0=np.array([3.0, 3.0, 3.0, 3.0]))
    s.run(3)
    path = str(tmp_path / "legacy.npz")
    save_state(path, s.state, instance="lands")
    with np.load(path) as z:
        fields = {k: z[k] for k in z.files if k != "cut_x"}
    np.savez(path, **fields)

    restored = load_state(path)
    R, E, K = np.asarray(s.state.cut_alpha).shape
    assert restored.cut_x.shape == (R, E, K, inst.n1)
    xi = np.asarray(s.state.x_incumbent)
    np.testing.assert_allclose(
        np.asarray(restored.cut_x),
        np.broadcast_to(xi[:, None, None, :], (R, E, K, inst.n1)))
