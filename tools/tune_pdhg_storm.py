"""Quick A/B of PDHG knobs at a warm storm state (tunneled TPU).

Same harness as profile_sd_step.time_chunk: warm once, then time one
compiled 64-iteration chunk from the same state per variant.

Usage: python tools/tune_pdhg_storm.py [instance] [warm_iters] [total_iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sqlp_tpu.config import PDHGConfig, SDConfig, autoscale_capacities
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDSolver
from tools.profile_sd_step import time_chunk


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "storm"
    warm_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    total_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 1500

    base = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                    pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    base = autoscale_capacities(base, total_iters)
    inst = load_instance(name, dtype=base.jdtype)

    solver = SDSolver(inst, base, seed=0)
    t0 = time.time()
    solver.run(warm_iters)
    print(f"[warm] {warm_iters} iters in {time.time() - t0:.1f}s; "
          f"n_duals={int(solver.state.n_duals)}")

    def pdhg(**kw):
        return base.pdhg.__class__(**{**base.pdhg.__dict__, **kw})

    variants = {
        "base (re=80 halpern)": {},
        "re=40": dict(pdhg=pdhg(restart_every=40)),
        "re=160": dict(pdhg=pdhg(restart_every=160)),
        "avg": dict(pdhg=pdhg(scheme="average")),
        "omega=0": dict(pdhg=pdhg(omega_smoothing=0.0)),
        "stall=25": dict(pdhg=pdhg(stall_rounds=25)),
    }
    for label, kw in variants.items():
        cfg = base.replace(**kw) if kw else base
        solver.config = cfg
        sec = time_chunk(solver, chunk=64)
        print(f"{label:>22}: {sec * 1e3:7.2f} ms/iter ({1.0 / sec:6.1f} it/s)")
    solver.config = base


if __name__ == "__main__":
    main()
