"""Stopping rules (sd/stopping.py) and the multi-epigraph driver path.

The reference planned stopping rules and never shipped them
(src/sd_algorithm/plugin/stopping_rule.jl is 0 bytes, readme.md:18); these
tests pin the semantics of ours. The multi-epigraph driver test exercises
the reference's headline extension (multiple weighted epigraph variables,
readme.md:5-9) through the user-facing SDSolver surface.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sqlp_tpu.sd.stopping import GapRule, LowerBoundStabilization


def test_gap_rule_relative_semantics():
    rule = GapRule(rel_gap=0.01)
    assert not rule.check(lb_est=90.0, ub_est=100.0)
    assert rule.check(lb_est=99.5, ub_est=100.0)
    # CI half-width inflates the ub: a conservative test
    assert not rule.check(lb_est=99.5, ub_est=100.0, ub_half_width=2.0)
    # near-zero objectives use the +1 absolute floor
    assert rule.check(lb_est=-0.005, ub_est=0.0)


def test_stabilization_window():
    stab = LowerBoundStabilization(window=3, rel_tol=1e-3)
    assert not stab.update(10.0)      # fewer than window samples
    assert not stab.update(11.0)
    assert not stab.update(12.0)      # window full but still moving
    assert not stab.update(12.001)
    assert stab.update(12.002)        # last 3 within 1e-3*(1+12)


def test_stabilization_resets_on_movement():
    stab = LowerBoundStabilization(window=2, rel_tol=1e-6)
    stab.update(5.0)
    assert stab.update(5.0)
    assert not stab.update(6.0)       # jump breaks the window


@pytest.mark.slow
def test_driver_multi_epigraph_lands():
    """n_epi=2 splits the scenario stream over two weight-1/2 epigraphs and
    still converges to the lands optimum region."""
    from conftest import require_instance
    from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig
    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.sd.driver import SDSolver

    require_instance("lands")
    inst = load_instance("lands", dtype=jnp.float64)
    cfg = SDConfig(dtype="float64",
                   max_scenarios=256, max_dual_vertices=128, max_cuts=32,
                   quad_schedule="constant", quad_scalar_init=0.1,
                   pdhg=PDHGConfig(tol=1e-8, max_iters=20_000),
                   qp=QPConfig(tol=1e-9, max_iters=8_000))
    solver = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]),
                      seed=3, n_epi=2)
    assert np.allclose(np.asarray(solver.espec.obj_weight), 0.5)
    solver.run(150)
    lb = solver.lower_estimate
    ub = solver.evaluate(n_samples=2000)
    assert abs(lb - 381.8533) < 8.0
    assert abs(ub - 381.8533) < 8.0
