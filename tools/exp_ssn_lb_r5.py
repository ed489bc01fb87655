"""Round-5 ssn lb-side experiment: EF certificates over larger fresh
streams, resumed from a saved R-replication state.

N=12000 with the default ef_chunk_iters=16384 produced a single XLA
program ~4x the r4 size and killed the tunneled TPU worker (the known
~2-minute device-program limit); the chunk budget here scales inversely
with the stream length.

Usage: timeout 1800 env PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/exp_ssn_lb_r5.py [--fresh 12000] [--chunk 4096]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sqlp_tpu.config import PDHGConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDReplications
from sqlp_tpu.utils.checkpoint import load_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--fresh", type=int, default=12000)
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--no-refine", action="store_true",
                   help="skip the dual feasibility projection; rely on "
                        "the exact weak-duality corrections alone")
    p.add_argument("--mode", default="project",
                   choices=["resolve", "project"],
                   help="dual repair mode (saa_ef_bound refine_mode); "
                        "'resolve' is a measured negative on ssn "
                        "(RESULTS.md r5) — kept for A/B reproduction")
    p.add_argument("--host-cap", type=int, default=None,
                   help="host-exact repair cap (0 disables the repair)")
    p.add_argument("--antithetic", action="store_true",
                   help="antithetic replication pairing (pair-mean t)")
    p.add_argument("--ef-tol", type=float, default=None,
                   help="EF solve tolerance override")
    p.add_argument("--ef-iters", type=int, default=None,
                   help="EF solve max_iters override")
    p.add_argument("--checkpoint", default="/tmp/ssn_r5_state.npz")
    args = p.parse_args()

    cfg = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                   pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    inst = load_instance("ssn", dtype=cfg.jdtype)
    s = SDReplications(inst, cfg, n_replications=args.reps, seed=0)
    s.state = load_state(args.checkpoint, template=s.state)

    t0 = time.time()
    kw = {"refine_mode": args.mode}
    if args.antithetic:
        kw["antithetic_reps"] = True
    if args.no_refine:
        kw["refine_duals"] = False
    if args.host_cap is not None:
        kw["host_exact_cap"] = args.host_cap
    if args.ef_tol or args.ef_iters:
        import dataclasses
        kw["ef_config"] = dataclasses.replace(
            cfg.pdhg, tol=args.ef_tol or cfg.pdhg.tol,
            max_iters=args.ef_iters or cfg.pdhg.max_iters)
    cert = s.certified_lower_bound(method="ef",
                                   fresh_scenarios=args.fresh,
                                   ef_chunk_iters=args.chunk, **kw)
    out = {"phase": "lb", "fresh": args.fresh, "chunk": args.chunk,
           "lb_cert": round(float(cert["lb_cert"]), 4),
           "lb_mean": round(float(cert["lb_mean"]), 4),
           "lb_half_width": round(float(cert["lb_half_width"]), 4),
           "lb_per_rep": [round(float(v), 4) for v in cert["lb_per_rep"]],
           "ef_obj_per_rep": [round(float(v), 4)
                              for v in cert["ef_obj_per_rep"]],
           "ef_err_max": float(np.max(cert["ef_err_per_rep"])),
           "dual_infeas_max": float(np.max(cert["dual_infeas_per_rep"])),
           "host_exact": int(cert["host_exact_count"]),
           "corr_per_rep": [round(float(v), 4)
                            for v in cert["cut_correction_per_rep"]],
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
