"""Round-5 ssn FLAGSHIP certified run: R=16 x 3000 SD, EF certificates
over N=6000 antithetic-paired fresh stratified streams (tol-1e-5 EF +
minimal-movement dual projection), EF-argmin decision selection on a
CRN panel, winner evaluated independently with the batch-mean CI.

Target (VERDICT r4 item 2): certified 95% gap <= 2.5%.

Usage: timeout 3300 env PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/exp_ssn_flagship_r5.py
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
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--fresh", type=int, default=6000)
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--ub-hw", type=float, default=0.045)
    p.add_argument("--checkpoint", default="/tmp/ssn_r16_state.npz")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    cfg = SDConfig(quad_schedule="adaptive", quad_scalar_init=1e-3,
                   pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    inst = load_instance("ssn", dtype=cfg.jdtype)

    s = SDReplications(inst, cfg, n_replications=args.reps, seed=0)
    if args.resume:
        from sqlp_tpu.utils.checkpoint import load_state
        s.state = load_state(args.checkpoint, template=s.state)
    else:
        t0 = time.time()
        s.run(args.iters)
        print(json.dumps({"phase": "sd", "reps": args.reps,
                          "iters": args.iters,
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)
        if args.checkpoint:
            save_state(args.checkpoint, s.state, instance=inst.name)

    t0 = time.time()
    cert = s.certified_lower_bound(method="ef",
                                   fresh_scenarios=args.fresh,
                                   antithetic_reps=True,
                                   ef_chunk_iters=args.chunk)
    print(json.dumps({
        "phase": "lb", "fresh": args.fresh, "pairing": "antithetic",
        "lb_cert": round(float(cert["lb_cert"]), 4),
        "lb_mean": round(float(cert["lb_mean"]), 4),
        "lb_half_width": round(float(cert["lb_half_width"]), 4),
        "lb_pairs": [round(float(v), 4) for v in cert["lb_per_rep"]],
        "ef_err_max": float(np.max(cert["ef_err_per_rep"])),
        "dual_infeas_max": float(np.max(cert["dual_infeas_per_rep"])),
        "wall_s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    x_comp, _ = compromise_decision(inst, s.states, s.especs, rho=1.0,
                                    qp_config=cfg.qp,
                                    obj_scale=s.obj_scale)
    x_ef = np.asarray(cert["x_ef_per_rep"])
    cand = {"compromise": x_comp, "ef_avg": x_ef.mean(axis=0)}
    for r in range(0, min(8, x_ef.shape[0]), 2):
        cand[f"ef_{r}"] = x_ef[r]
    sel = s.select_decision(cand, n_samples=24576, seed=11)
    print(json.dumps({
        "phase": "select", "winner": sel["name"],
        "table": {k: [round(v[0], 4), round(v[1], 4)]
                  for k, v in sel["table"].items()},
        "wall_s": round(time.time() - t0, 1)}), flush=True)
    np.save("/tmp/ssn_r16_xbest.npy", sel["x"])

    t0 = time.time()
    ub, hw, n_ub = s.evaluate_ci(x=sel["x"], min_samples=32768,
                                 max_samples=786_432,
                                 target_half_width=args.ub_hw, seed=7,
                                 batch=8192, sampling="stratified")
    lo = cert["lb_mean"] - cert["lb_half_width"]
    hi = ub + hw
    print(json.dumps({
        "phase": "ub", "decision": sel["name"], "ub": round(ub, 4),
        "hw": round(hw, 4), "n": int(n_ub),
        "wall_s": round(time.time() - t0, 1),
        "cert_gap": round((hi - lo) / hi, 5)}), flush=True)


if __name__ == "__main__":
    main()
