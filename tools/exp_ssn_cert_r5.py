"""Round-5 ssn certified-gap experiments (VERDICT r4 item 2).

Target: certified 95% gap <= 2.5% (r4: 4.3%). The r4 decomposition of
the slack (RESULTS.md open item 4): compromise-ub true cost ~0.5-0.7%,
ub CI 0.8%, SAA bias of the 3000-scenario fresh streams ~0.7%, lb
Student-t half-width 1.9%. This script attacks all four:

  phase sd     R=8 x 3000 with --cut-refresh 512 (the scan-based
               replicated rebuild, commit 34d248c): sharper F_r models
               should give a better compromise decision;
  phase ub     compromise + stratified MC to a 0.05 half-width;
  phase lb     EF dual certificates over fresh stratified streams of
               N=12000 per replication (4x r4): v_N spread and SAA bias
               both shrink with N.

Each phase prints one JSON line; the SD state is checkpointed for
follow-up experiments (polish of x_comp, R=16 comparisons).

Usage: timeout 1800 env PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/exp_ssn_cert_r5.py [--fresh N] [--refresh K]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sqlp_tpu.config import PDHGConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.compromise import compromise_decision
from sqlp_tpu.sd.driver import SDReplications
from sqlp_tpu.utils.checkpoint import save_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--fresh", type=int, default=12000)
    p.add_argument("--refresh", type=int, default=512)
    p.add_argument("--ub-hw", type=float, default=0.05)
    p.add_argument("--skip-lb", action="store_true")
    p.add_argument("--checkpoint", default="/tmp/ssn_r5_state.npz")
    args = p.parse_args()

    cfg = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                   cut_refresh_every=args.refresh,
                   pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    inst = load_instance("ssn", dtype=cfg.jdtype)

    t0 = time.time()
    s = SDReplications(inst, cfg, n_replications=args.reps, seed=0)
    s.run(args.iters)
    print(json.dumps({"phase": "sd", "reps": args.reps,
                      "iters": args.iters, "refresh": args.refresh,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    if args.checkpoint:
        save_state(args.checkpoint, s.state, instance=inst.name)

    t0 = time.time()
    x_comp, info = compromise_decision(inst, s.states, s.especs, rho=1.0,
                                       qp_config=cfg.qp,
                                       obj_scale=s.obj_scale)
    ub, hw, n_ub = s.evaluate_ci(x=x_comp, min_samples=32768,
                                 max_samples=1_048_576,
                                 target_half_width=args.ub_hw, seed=7,
                                 batch=8192, sampling="stratified")
    print(json.dumps({"phase": "ub", "ub": round(ub, 4),
                      "hw": round(hw, 4), "n": int(n_ub),
                      "x_comp_norm": round(float(np.abs(x_comp).sum()), 3),
                      "host_fallbacks": int(getattr(
                          s, "host_fallback_count", 0)),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    np.save("/tmp/ssn_r5_xcomp.npy", np.asarray(x_comp))

    if not args.skip_lb:
        t0 = time.time()
        cert = s.certified_lower_bound(method="ef",
                                       fresh_scenarios=args.fresh)
        out = {"phase": "lb", "fresh": args.fresh,
               "lb_cert": round(float(cert["lb_cert"]), 4),
               "lb_mean": round(float(cert["lb_mean"]), 4),
               "lb_half_width": round(float(cert["lb_half_width"]), 4),
               "lb_per_rep": [round(float(v), 4)
                              for v in cert["lb_per_rep"]],
               "ef_err_max": float(np.max(cert["ef_err_per_rep"])),
               "dual_infeas_max": float(
                   np.max(cert["dual_infeas_per_rep"])),
               "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(out), flush=True)
        lo = cert["lb_mean"] - cert["lb_half_width"]
        hi = ub + hw
        print(json.dumps({"phase": "gap",
                          "cert_gap": round((hi - lo) / hi, 5)}),
              flush=True)


if __name__ == "__main__":
    main()
