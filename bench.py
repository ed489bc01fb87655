"""Benchmark: scenario-subproblem throughput of the batched PDHG kernel.

Headline metric per BASELINE.md: second-stage recourse LPs solved per
second per chip. The baseline is the reference's serial
one-LP-at-a-time external-solver loop (JuMP -> CPLEX/GLPK,
src/smps/smps_routines.jl:50-62); since Julia isn't in this image the
baseline is measured as serial HiGHS solves via scipy on this host —
the same "hand the LP to an exact solver, one scenario at a time"
architecture the reference uses (readme.md:15-16 flags it as the
bottleneck).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sqlp_tpu.config import PDHGConfig
    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.models.routines import solve_lp_host
    from sqlp_tpu.models.scenario import sample_deltas
    from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    name = "ssn"  # flagship workload (reference drives 3000 SD iters on it)
    inst = load_instance(name)
    B = 4096
    x = jnp.zeros(inst.n1)

    key = jax.random.PRNGKey(0)
    deltas = sample_deltas(key, inst.scenario_model, B)
    H = _scenario_rhs(inst.arrays, inst.scenario_model, deltas, x)

    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)
    cfg = PDHGConfig(tol=1e-4, max_iters=80_000)

    # warm-up / compile
    obj, Y, Pi, stats = solve_batch(prep, H, cfg)
    np.asarray(obj)

    t0 = time.time()
    obj, Y, Pi, stats = solve_batch(prep, H, cfg)
    obj_h = np.asarray(obj)
    elapsed = time.time() - t0
    throughput = B / elapsed

    # honesty check: spot-compare against the exact host solver
    Hn = np.asarray(H, np.float64)
    rel_errs = []
    for b in range(0, B, B // 4):
        ref, _, _ = solve_lp_host(
            np.asarray(inst.arrays.q, np.float64),
            np.asarray(inst.arrays.W, np.float64), Hn[b],
            np.asarray(inst.arrays.senses2),
            np.asarray(inst.arrays.lb2, np.float64),
            np.asarray(inst.arrays.ub2, np.float64))
        rel_errs.append(abs(float(obj_h[b]) - ref) / (1.0 + abs(ref)))
    assert max(rel_errs) < 1e-3, f"objective mismatch vs HiGHS: {rel_errs}"

    # baseline: serial exact solves, one scenario at a time (the reference's
    # architecture), measured on this host
    n_base = 16
    t0 = time.time()
    for b in range(n_base):
        solve_lp_host(
            np.asarray(inst.arrays.q, np.float64),
            np.asarray(inst.arrays.W, np.float64), Hn[b],
            np.asarray(inst.arrays.senses2),
            np.asarray(inst.arrays.lb2, np.float64),
            np.asarray(inst.arrays.ub2, np.float64))
    base_throughput = n_base / (time.time() - t0)

    print(json.dumps({
        "metric": f"{name}_subproblems_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "LP solves/s",
        "vs_baseline": round(throughput / base_throughput, 2),
    }))


if __name__ == "__main__":
    main()
