"""A/B: host-exact dual sharpening on storm (VERDICT r4 item 7).

Storm's recourse is degenerate enough that neither the f32 nor the f64
batched active-set crossover ever certifies a vertex (0/96 accepted,
RESULTS.md r4) — the one reference capability (exact simplex duals from
CPLEX/GLPK, smps_routines.jl:58-61) without a working equivalent. The
second mechanism (sd/driver.py:sharpen_duals_host) sidesteps vertex
identification entirely: every N iterations, re-solve EXACTLY (HiGHS
f64) the home scenarios of the pool's top-K argmax winners and push the
exact basic duals into the pool.

Arms (identical seeds, reference storm workload, 1500 iters):
  off  plain run;
  on   sharpen every 256 iterations, K=32.

Reported per arm: wall, it/s, lb proxy, exact cut-model minimum (the
deterministic SAA bound — the quality read that matters), MC ub, pool
stats, and the measured per-round optimality slack of the pool argmax
on the re-solved scenarios (how much value first-order duals leave on
the table there).

Usage: timeout 1800 env PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/ab_host_sharpen.py [--iters 1500]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sqlp_tpu.config import PDHGConfig, SDConfig
from sqlp_tpu.models.instance import load_instance
from sqlp_tpu.sd.driver import SDSolver


def run_arm(inst, cfg, iters, sharpen_every, k, seed=0):
    s = SDSolver(inst, cfg, seed=seed)
    t0 = time.time()
    done = 0
    rounds = []
    while done < iters:
        n = min(sharpen_every or iters, iters - done)
        last = s.run(n)
        done += n
        if sharpen_every and done < iters:
            rounds.append(s.sharpen_duals_host(k=k))
    wall = time.time() - t0
    lb_model = s.cut_model_lower_bound()
    ub, hw, _ = s.evaluate_ci(min_samples=16384, max_samples=16384,
                              seed=7, batch=8192, sampling="stratified")
    out = {"iters": iters, "wall_s": round(wall, 1),
           "it_per_s": round(iters / wall, 1),
           "lb_est": round(s.lower_estimate, 1),
           "cut_model_min": round(lb_model, 1),
           "mc_ub": round(ub, 1), "mc_ub_hw": round(hw, 1),
           "n_duals": int(s.state.n_duals),
           "duals_dropped": int(s.state.duals_dropped)}
    if rounds:
        out["sharpen_rounds"] = len(rounds)
        out["n_new_total"] = int(sum(r["n_new"] for r in rounds))
        out["n_solved_total"] = int(sum(r["n_solved"] for r in rounds))
        out["mean_slack_per_round"] = [round(r["mean_slack"], 6)
                                       for r in rounds]
        out["max_slack_per_round"] = [round(r["max_slack"], 6)
                                      for r in rounds]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--every", type=int, default=256)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--arm", choices=["off", "on", "both"], default="both")
    args = p.parse_args()

    cfg = SDConfig(pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    inst = load_instance("storm", dtype=cfg.jdtype)
    if args.arm in ("off", "both"):
        print(json.dumps({"arm": "off",
                          **run_arm(inst, cfg, args.iters, 0, 0)}),
              flush=True)
    if args.arm in ("on", "both"):
        print(json.dumps({"arm": "on", "every": args.every, "k": args.k,
                          **run_arm(inst, cfg, args.iters, args.every,
                                    args.k)}),
              flush=True)


if __name__ == "__main__":
    main()
