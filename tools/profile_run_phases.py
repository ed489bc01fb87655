"""Per-chunk wall-clock across a full SD run: where does the time go
over the course of 3000 iterations (early cold pools vs late hard
masters/subproblems)?

Usage: python tools/profile_run_phases.py [instance] [iters] [chunk]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sqlp_tpu.config import PDHGConfig, SDConfig, autoscale_capacities
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDSolver


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ssn"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    cfg = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                   pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    cfg = autoscale_capacities(cfg, iters)
    inst = load_instance(name, dtype=cfg.jdtype)

    # separate warm solver to absorb compiles (same chunk size!)
    warm = SDSolver(inst, cfg, seed=1)
    warm.run(2 * chunk, chunk=chunk)
    del warm

    solver = SDSolver(inst, cfg, seed=0)
    t_all = time.time()
    marks = []
    last_t = [time.time()]

    def cb(done, stats):
        now = time.time()
        marks.append((done, now - last_t[0], stats))
        last_t[0] = now

    solver.run(iters, callback=cb, chunk=chunk)
    total = time.time() - t_all
    print(f"total: {total:.2f}s ({iters / total:.1f} it/s)")
    print(f"{'iters':>6} {'ms/it':>7} {'n_duals':>8} {'cuts':>5} "
          f"{'conv%':>6} {'qp_ok':>6}")
    for done, dt, st in marks:
        n_it = chunk if done % chunk == 0 else done % chunk
        conv = float(np.mean(st.get("pdhg_converged_frac",
                                    st.get("pdhg_valid", np.nan))))
        print(f"{done:>6} {dt / n_it * 1e3:>7.2f} "
              f"{int(st['n_duals']):>8} {int(st['n_cuts_live']):>5} "
              f"{conv:>6.2f} {str(bool(st.get('qp_converged', 1))):>6}")


if __name__ == "__main__":
    main()
