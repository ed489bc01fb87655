"""A/B: periodic full-pool cut refresh (VERDICT r3 item 4a).

SDConfig.cut_refresh_every rebuilds every live stored cut at its
generating point against the current dual pool / scenario store at full
weight, undoing the 1/N decay for the whole pool (the reference
regenerates only the incumbent cut, epigraph.jl:83). This script
measures the lb/ub effect and the wall cost on the flagship workload.

Usage: python tools/ab_cut_refresh.py [instance] [iters] [refresh_every...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from sqlp_tpu.utils.jaxsetup import configure_jax


def main() -> int:
    configure_jax()
    from sqlp_tpu.config import PDHGConfig, SDConfig
    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.sd.driver import SDSolver

    name = sys.argv[1] if len(sys.argv) > 1 else "ssn"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    everies = [int(v) for v in sys.argv[3:]] or [0, 256]

    inst = load_instance(name)
    for every in everies:
        config = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                          pdhg=PDHGConfig(tol=1e-4, max_iters=80_000),
                          cut_refresh_every=every)
        solver = SDSolver(inst, config, seed=1)
        solver.run(min(iters, 256))          # warm/compile
        del solver
        solver = SDSolver(inst, config, seed=0)
        t0 = time.time()
        solver.run(iters)
        wall = time.time() - t0
        lb_proxy = solver.lower_estimate
        lb_model = solver.cut_model_lower_bound()
        ub, hw, _ = solver.evaluate_ci(min_samples=16384, max_samples=16384,
                                       seed=7, sampling="stratified")
        print(f"[refresh={every}] {iters} iters {wall:.1f}s "
              f"({iters / wall:.1f} it/s) lb_proxy={lb_proxy:.4f} "
              f"lb_model_min={lb_model:.4f} ub={ub:.4f}+-{hw:.4f} "
              f"duals={int(solver.state.n_duals)} "
              f"cuts={int(np.asarray(solver.state.cut_live).sum())}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
