"""Worker for the 2-process distributed test (not a test module).

Run as: python _distributed_worker.py <process_id> <port> <out.npz>

Initializes jax.distributed over 2 processes x 4 virtual CPU devices,
builds an 8-device global mesh, runs 20 SD iterations on lands with the
scenario stores AND the dual pool sharded across both processes, and
(process 0) dumps the cand_est trajectory + incumbent for comparison
against a single-process run of the identical configuration.

Only ``CFG``/``run_trajectory`` are defined at import time so the test
module can share the exact configuration; the distributed setup runs
under __main__ only.
"""

import sys


def _cfg():
    from sqlp_tpu.config import PDHGConfig, QPConfig, SDConfig

    return SDConfig(
        dtype="float64",
        max_scenarios=256, max_dual_vertices=64, max_cuts=16,
        pdhg=PDHGConfig(tol=1e-8, max_iters=10_000),
        qp=QPConfig(tol=1e-9, max_iters=4_000),
    )


def run_trajectory(n_iters: int = 20):
    """The shared workload: lands, 8-device mesh, sharded duals."""
    import numpy as np

    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.sd.driver import SDSolver

    cfg = _cfg()
    inst = load_instance("lands", dtype=cfg.jdtype)
    solver = SDSolver(inst, cfg, x0=np.array([3.0, 3.0, 3.0, 3.0]), seed=3,
                      mesh_devices=8, shard_duals=True)
    solver.run(n_iters, log_every=1)
    cand = np.asarray([h["cand_est"] for h in solver.history])
    # MC evaluation shards its panel over the same (possibly cross-
    # process) mesh — exercises place_batch/to_host end to end
    ub = solver.evaluate(n_samples=1024, batch=512, seed=77)
    return cand, solver.x_incumbent, ub


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

    from sqlp_tpu.parallel.distributed import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid,
                     cpu_devices_per_process=4)

    import jax

    jax.config.update("jax_enable_x64", True)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    cand, x_inc, ub = run_trajectory()
    if pid == 0:
        np.savez(out_path, cand_est=cand, x_incumbent=x_inc, mc_ub=ub)
    print(f"[worker {pid}] done, cand_est[-1]={cand[-1]:.6f} "
          f"mc_ub={ub:.6f}", flush=True)


if __name__ == "__main__":
    main()
