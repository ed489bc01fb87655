"""A/B: f64 crossover fallback on storm (VERDICT r3 item 5).

On storm the f32 crossover acceptance test passes 0 duals and the
adaptive gate turns sharpening off (SDConfig.crossover_dry_limit). The
f64 fallback (SDConfig.crossover_f64_fallback) re-runs the rounding in
emulated f64 on the SD step's small panel once the f32 path runs dry.
This script measures both arms from identical seeds: wall clock, lb
estimate, MC upper bound, dual-pool size, and acceptance counts.

Usage: python tools/ab_crossover_f64.py [instance] [iters]
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

    name = sys.argv[1] if len(sys.argv) > 1 else "storm"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1500

    inst = load_instance(name)
    for label, fallback in (("f32-gate (r3 default)", False),
                            ("f64 fallback", True)):
        config = SDConfig(pdhg=PDHGConfig(tol=1e-4, max_iters=80_000),
                          crossover_f64_fallback=fallback)
        solver = SDSolver(inst, config, seed=0)
        solver.run(min(iters, 256))          # warm/compile
        solver = SDSolver(inst, config, seed=0)
        t0 = time.time()
        solver.run(iters, log_every=1)
        wall = time.time() - t0
        acc = np.array([h["crossover_accepted"] for h in solver.history])
        lb = solver.lower_estimate
        ub, hw, _ = solver.evaluate_ci(min_samples=8192, max_samples=8192,
                                       seed=7, sampling="stratified")
        print(f"[{label}] {iters} iters {wall:.1f}s "
              f"({iters / wall:.1f} it/s) lb={lb:.2f} "
              f"ub={ub:.2f}+-{hw:.2f} "
              f"duals={int(solver.state.n_duals)} "
              f"xover_acc_total={int(acc.sum())} "
              f"acc_after_300={int(acc[300:].sum()) if len(acc) > 300 else 0}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
