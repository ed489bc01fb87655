"""Benchmark harness: subproblem throughput + time-to-SD-gap.

Headline metric per BASELINE.md: second-stage recourse LPs solved per
second per chip (batched PDHG kernel, ssn, B=4096, tol 1e-4). The
baseline is the reference's serial one-LP-at-a-time external-solver loop
(JuMP -> CPLEX/GLPK, src/smps/smps_routines.jl:50-62); since Julia isn't
in this image the baseline is measured as serial HiGHS solves via scipy
on this host — the same "hand the LP to an exact solver, one scenario at
a time" architecture the reference uses (readme.md:15-16 flags it as the
bottleneck).

Second metric (recorded as extra fields on the same JSON line):
wall-clock for the reference's flagship ssn driver workload — 3000 SD
iterations, x0=0, adaptive prox schedule with rho0=1e-3
(/root/reference/test/instance_test/ssn_test.jl:31,45-48) — plus the
final lb estimate, MC upper bound, and relative gap.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Resilience: the known-flaky TPU tunnel can either fail fast
(RuntimeError: Unable to initialize backend 'axon') or hang for minutes
at backend init. This file is therefore split into an orchestrator (no
jax import; probes the backend in a throwaway subprocess with a hard
timeout, retries with backoff, falls back to CPU) and a --child
measurement process. Every outcome — including total failure — is a
structured JSON line, never a bare traceback.

Usage:
  python bench.py                    # probe TPU, fall back to CPU
  python bench.py --cpu-baseline-only
  python bench.py --skip-sd-gap      # throughput metric only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_TIMEOUT_S = 120          # one backend-init probe (tunnel hangs, not errors)
PROBE_ATTEMPTS = 3
PROBE_BACKOFF_S = (20, 60)     # sleep between probe attempts
CHILD_TIMEOUT_S = 5400         # full measurement run incl. XLA compiles
                               # (the r5 flagship ssn_certified section
                               # alone is ~33 min of chip time)
CPU_CHILD_TIMEOUT_S = 2700


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def probe_backend() -> str:
    """Return 'tpu' if a non-CPU jax backend initializes within the
    timeout, else 'cpu'. Runs in a subprocess because a wedged tunnel
    HANGS at init (observed for hours) rather than raising."""
    code = "import jax; print(jax.devices()[0].platform)"
    for attempt in range(1, PROBE_ATTEMPTS + 1):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=PROBE_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            _log(f"probe {attempt}/{PROBE_ATTEMPTS}: backend init hung "
                 f">{PROBE_TIMEOUT_S}s (tunnel wedged)")
            out = None
        if out is not None and out.returncode == 0:
            plat = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            _log(f"probe {attempt}: backend '{plat}' up "
                 f"({time.time() - t0:.1f}s)")
            if plat and plat != "cpu":
                return "tpu"
            return "cpu"
        if out is not None:
            tail = (out.stderr or "").strip().splitlines()
            _log(f"probe {attempt}/{PROBE_ATTEMPTS}: init failed rc="
                 f"{out.returncode}: {tail[-1] if tail else '?'}")
        if attempt < PROBE_ATTEMPTS:
            delay = PROBE_BACKOFF_S[min(attempt - 1, len(PROBE_BACKOFF_S) - 1)]
            _log(f"retrying in {delay}s")
            time.sleep(delay)
    return "cpu"


def run_child(platform: str, skip_sd_gap: bool) -> dict | None:
    """Run the measurement child; return its parsed JSON or None."""
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--platform", platform]
    if skip_sd_gap:
        cmd.append("--skip-sd-gap")
    timeout = CHILD_TIMEOUT_S if platform == "tpu" else CPU_CHILD_TIMEOUT_S
    _log(f"measurement child on {platform} (timeout {timeout}s)")
    try:
        out = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=None,
                             text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        _log(f"child on {platform} exceeded {timeout}s; killed")
        return None
    if out.returncode != 0:
        _log(f"child on {platform} exited rc={out.returncode}")
        return None
    for line in reversed((out.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    _log(f"child on {platform} produced no JSON line")
    return None


def orchestrate(args) -> int:
    platform = "cpu" if args.cpu_baseline_only else probe_backend()
    result = run_child(platform, args.skip_sd_gap)
    if result is None and platform == "tpu":
        _log("TPU measurement failed; retrying once")
        result = run_child("tpu", args.skip_sd_gap)
    if result is None and platform == "tpu":
        _log("falling back to CPU measurement")
        platform = "cpu"
        result = run_child("cpu", args.skip_sd_gap)
    if result is None:
        print(json.dumps({
            "metric": "ssn_subproblems_per_sec_per_chip",
            "value": 0.0, "unit": "LP solves/s", "vs_baseline": 0.0,
            "error": "all measurement attempts failed (see stderr log)",
            "backend": platform,
        }))
        return 1
    print(json.dumps(result))
    return 0


# --------------------------------------------------------------------------
# measurement child
# --------------------------------------------------------------------------

def _bench_throughput(inst, config, B: int) -> dict:
    """Batched-PDHG LP throughput vs serial exact host solves."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sqlp_tpu.models.routines import solve_lp_host
    from sqlp_tpu.models.scenario import sample_deltas
    from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
    from sqlp_tpu.sd.algorithm import _scenario_rhs

    x = jnp.zeros(inst.n1)
    key = jax.random.PRNGKey(0)
    deltas = sample_deltas(key, inst.scenario_model, B)
    H = _scenario_rhs(inst.arrays, inst.scenario_model, deltas, x)
    prep = prepare_lp(inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
                      inst.arrays.lb2, inst.arrays.ub2)

    # warm-up / compile; force with np.asarray (block_until_ready
    # misreports completion over the tunneled backend)
    obj, Y, Pi, stats = solve_batch(prep, H, config.pdhg)
    np.asarray(obj)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        obj, Y, Pi, stats = solve_batch(prep, H, config.pdhg)
        obj_h = np.asarray(obj)
        best = min(best, time.time() - t0)
    throughput = B / best

    # honesty check: spot-compare against the exact host solver
    Hn = np.asarray(H, np.float64)
    q64 = np.asarray(inst.arrays.q, np.float64)
    W64 = np.asarray(inst.arrays.W, np.float64)
    s2 = np.asarray(inst.arrays.senses2)
    lb64 = np.asarray(inst.arrays.lb2, np.float64)
    ub64 = np.asarray(inst.arrays.ub2, np.float64)
    rel_errs = []
    for b in range(0, B, max(B // 4, 1)):
        ref, _, _ = solve_lp_host(q64, W64, Hn[b], s2, lb64, ub64)
        rel_errs.append(abs(float(obj_h[b]) - ref) / (1.0 + abs(ref)))
    assert max(rel_errs) < 1e-3, f"objective mismatch vs HiGHS: {rel_errs}"

    # baseline: serial exact solves, one scenario at a time (the
    # reference's architecture), measured on this host. One timing run of
    # a host solver is noisy (observed 94.5 vs 68.5 LP/s for the same host
    # across rounds — a 38% swing in the headline multiplier's
    # denominator); take the median of repeated measurements and report
    # the spread alongside.
    n_base = 16
    base_runs = []
    for _ in range(5):
        t0 = time.time()
        for b in range(n_base):
            solve_lp_host(q64, W64, Hn[b], s2, lb64, ub64)
        base_runs.append(n_base / (time.time() - t0))
    base_throughput = float(np.median(base_runs))

    return {"throughput": throughput, "baseline": base_throughput,
            "baseline_runs": [round(r, 2) for r in sorted(base_runs)],
            "batch": B, "max_rel_err_vs_highs": max(rel_errs)}


def _bench_sd_gap(inst, config, n_iters: int) -> dict:
    """Reference ssn driver workload: wall-clock to run n_iters SD
    iterations plus the final lb/ub gap (ssn_test.jl:31,45-48)."""
    import numpy as np

    from sqlp_tpu.sd.driver import SDSolver

    # warm-up solver triggers all XLA compiles (persistent compile cache
    # makes the timed run's compiles ~free); discarded afterwards. Must
    # cover a FULL driver chunk (256) so the timed run reuses the compiled
    # full-chunk executable instead of building it on the clock.
    warm = SDSolver(inst, config, seed=1)
    warm.run(min(n_iters, 256))
    del warm

    solver = SDSolver(inst, config, seed=0)
    t0 = time.time()
    solver.run(n_iters, log_every=1)
    wallclock = time.time() - t0
    lb = solver.lower_estimate
    # the candidate estimate is a noisy series (every cut moves it);
    # the trailing mean is the stable read a practitioner would report
    lb_tail = [h["cand_est"] for h in solver.history[-100:]]
    # stratified MC: unbiased, and the reported iid-based half-width is
    # then conservative (sd/driver.py:evaluate_ci docstring)
    ub, hw, n = solver.evaluate_ci(min_samples=8192, max_samples=8192,
                                   seed=7, sampling="stratified")
    gap = (ub - lb) / max(abs(ub), 1e-9)
    return {"sd_iters": n_iters, "sd_wallclock_s": round(wallclock, 2),
            "sd_iters_per_sec": round(n_iters / wallclock, 2),
            "gap_kind": "proxy (lb_est is the cut-model estimate, not a "
                        "valid bound; the certified gap is ssn_certified)",
            "lb_est": round(lb, 4),
            "lb_est_mean_last100": round(float(np.mean(lb_tail)), 4),
            "mc_ub": round(ub, 4),
            "mc_ub_half_width": round(hw, 4), "rel_gap": round(gap, 5)}


def _bench_certified(inst, config, n_reps: int, n_iters: int,
                     fresh_scenarios: int = 0, ub_samples: int = 65536,
                     ub_half_width: float = 0.0,
                     method: str = "ef",
                     antithetic_reps: bool = False) -> dict:
    """The certified-optimality-gap pipeline (the ssn quality headline):

    R batched SD replications -> one extensive-form dual certificate per
    replication (saa_ef_bound: a valid deterministic bound on each
    replication's SAA optimum, tight to the EF duality gap) -> Student-t
    aggregation into a 95% confidence lower bound on the TRUE optimum ->
    compromise decision (Sen & Liu) evaluated by stratified Monte Carlo.
    cert_gap = ((ub + ub_hw) - (lb_mean - lb_hw)) / (ub + ub_hw): every
    term is either an exact bound or carries its own confidence interval
    — unlike the single-run proxy gap (rel_gap below), which compares a
    cut-model evaluation that is not a bound at all.

    ``fresh_scenarios`` certifies over fresh LATIN-HYPERCUBE streams
    instead of the SD run's i.i.d. draws: stratified sample averages are
    unbiased for every fixed x (so E[SAA optimum] <= v* still holds) but
    concentrate much harder, shrinking both the SAA downward bias and
    the cross-replication spread (measured on ssn R=8, N=3000: lb_mean
    9.71 -> 9.83, half-width 0.40 -> 0.19). ``ub_half_width`` > 0 keeps
    sampling the compromise decision until the 95% CI is that tight.
    """
    import numpy as np

    from sqlp_tpu.sd.compromise import compromise_decision
    from sqlp_tpu.sd.driver import SDReplications

    t0 = time.time()
    s = SDReplications(inst, config, n_replications=n_reps, seed=0)
    s.run(n_iters)
    sd_wall = time.time() - t0

    t0 = time.time()
    # EF chunk budget: saa_ef_bound self-scales it to the block count
    # (single programs past ~2 min kill the tunneled worker)
    kw = {"fresh_scenarios": fresh_scenarios,
          "antithetic_reps": antithetic_reps} \
        if method == "ef" else {}
    cert = s.certified_lower_bound(method=method, **kw)
    cert_wall = time.time() - t0

    t0 = time.time()
    x_comp, info = compromise_decision(inst, s.states, s.especs, rho=1.0,
                                       qp_config=config.qp,
                                       obj_scale=s.obj_scale)
    # Decision candidates: the Sen-Liu compromise of the SD cut models,
    # plus (on the EF route) the certification solves' own argmins —
    # each minimizes a large fresh-stream SAA exactly, which beats a
    # decayed cut model's compromise on ssn (RESULTS.md r5). Selection
    # runs on a shared CRN panel; the WINNER is then re-evaluated on an
    # independent panel, so the reported ub stays unbiased.
    candidates = {"compromise": x_comp}
    if "x_ef_per_rep" in cert:
        x_ef = np.asarray(cert["x_ef_per_rep"])
        candidates["ef_avg"] = x_ef.mean(axis=0)
        # even indices: under antithetic pairing odd replications are
        # the complements — their argmins are no less valid, but the
        # even ones already span the independent streams
        for r in range(0, min(6, x_ef.shape[0]), 2):
            candidates[f"ef_{r}"] = x_ef[r]
    if len(candidates) > 1:
        sel = s.select_decision(candidates,
                                n_samples=min(16384, ub_samples), seed=11)
        x_best, chosen = sel["x"], sel["name"]
    else:
        x_best, chosen, sel = x_comp, "compromise", None
    # batch 8192: a 16384-element panel at full straggler budget is a
    # single multi-minute XLA program, long enough to kill the tunneled
    # TPU worker (same failure mode as unchunked EF solves)
    ub_c, hw_c, n_ub = s.evaluate_ci(
        x=x_best, min_samples=min(32768, ub_samples),
        max_samples=ub_samples, target_half_width=ub_half_width, seed=7,
        batch=8192, sampling="stratified")
    ub_wall = time.time() - t0
    lo = cert["lb_mean"] - cert["lb_half_width"]
    hi = ub_c + hw_c
    return {"n_replications": n_reps, "sd_iters": n_iters,
            "cert_method": method,
            "decision": chosen,
            "decision_selection": None if sel is None else
            {k: [round(v[0], 4), round(v[1], 4)]
             for k, v in sel["table"].items()},
            "n_cert_scenarios": int(cert.get("n_scenarios", 0)),
            "sd_wall_s": round(sd_wall, 2),
            "cert_wall_s": round(cert_wall, 2),
            "ub_wall_s": round(ub_wall, 2),
            "total_wall_s": round(sd_wall + cert_wall + ub_wall, 2),
            "lb_cert": round(float(cert["lb_cert"]), 4),
            "lb_mean": round(float(cert["lb_mean"]), 4),
            "lb_half_width": round(float(cert["lb_half_width"]), 4),
            "lb_per_rep_min": round(float(cert["lb_per_rep"].min()), 4),
            "lb_per_rep_max": round(float(cert["lb_per_rep"].max()), 4),
            "ef_err_max": float(np.max(cert["ef_err_per_rep"]))
            if "ef_err_per_rep" in cert else None,
            "dual_infeas_max": float(np.max(cert["dual_infeas_per_rep"]))
            if "dual_infeas_per_rep" in cert else None,
            "confidence": 0.95,
            # the selected decision's independent-panel estimate (the
            # 'decision' field says which candidate won; r4 rounds
            # always evaluated the compromise, hence the legacy key)
            "decision_mc_ub": round(ub_c, 4),
            "decision_mc_ub_half_width": round(hw_c, 4),
            "mc_ub_samples": int(n_ub),
            "host_fallback_count": int(getattr(s, "host_fallback_count",
                                               0)),
            "cert_gap": round((hi - lo) / max(abs(hi), 1e-9), 5)}


def _bench_target_gap(on_tpu: bool) -> dict:
    """Certified-gap-aware stopping on lands: run SD in rounds, certify
    periodically (free cut-model route first, polish escalation), stop
    at the 1% certified gap, report time-to-certified-gap
    (sd/driver.py:solve_to_certified_gap)."""
    from sqlp_tpu.config import SDConfig, autoscale_capacities
    from sqlp_tpu.models.instance import load_instance
    from sqlp_tpu.sd.driver import SDReplications

    cfg = autoscale_capacities(SDConfig(), 400)
    inst = load_instance("lands", dtype=cfg.jdtype)
    s = SDReplications(inst, cfg, n_replications=4, seed=0)
    res = s.solve_to_certified_gap(
        0.01, max_iters=400 if on_tpu else 200,
        certify_every=200 if on_tpu else 100, method="polish",
        min_ub_samples=8192 if on_tpu else 2048,
        max_ub_samples=65536 if on_tpu else 2048,
        fresh_scenarios=1024 if on_tpu else 256)
    res.pop("x_compromise")
    res.pop("rounds")
    return res


def child(args) -> int:
    if args.platform == "cpu":
        # must run before any backend query: the axon plugin registers via
        # sitecustomize and ignores the JAX_PLATFORMS env var
        import jax
        jax.config.update("jax_platforms", "cpu")
    from sqlp_tpu.utils.jaxsetup import configure_jax
    configure_jax()

    from sqlp_tpu.config import PDHGConfig, SDConfig
    from sqlp_tpu.models.instance import load_instance

    name = "ssn"  # flagship workload (reference drives 3000 SD iters on it)
    on_tpu = args.platform == "tpu"
    # CPU fallback exists to always produce an artifact; shrink the
    # workload so it finishes, and label it clearly.
    B = 4096 if on_tpu else 512
    sd_iters = 3000 if on_tpu else 200

    config = SDConfig(
        quad_schedule="adaptive", quad_scalar_init=1e-3,
        pdhg=PDHGConfig(tol=1e-4, max_iters=80_000))
    inst = load_instance(name, dtype=config.jdtype)

    thr = _bench_throughput(inst, config, B)
    out = {
        "metric": f"{name}_subproblems_per_sec_per_chip",
        "value": round(thr["throughput"], 1),
        "unit": "LP solves/s",
        "vs_baseline": round(thr["throughput"] / thr["baseline"], 2),
        "backend": args.platform,
        "batch": thr["batch"],
        "serial_baseline_lp_per_sec": round(thr["baseline"], 2),
        "serial_baseline_runs": thr["baseline_runs"],
    }
    if not on_tpu:
        out["note"] = ("CPU fallback (TPU backend unavailable): reduced "
                       f"batch B={B}, sd_iters={sd_iters}")
    if not args.skip_sd_gap:
        try:
            out["ssn_time_to_gap"] = _bench_sd_gap(inst, config, sd_iters)
        except Exception as e:  # keep the headline metric on any SD failure
            out["ssn_time_to_gap"] = {"error": f"{type(e).__name__}: {e}"}
        # second flagship workload per BASELINE.md ("wall-clock to SD gap
        # on SSN/STORM"): storm is the largest instance (714x1381, 117 rv)
        try:
            storm_iters = 1500 if on_tpu else 60
            storm_cfg = SDConfig(pdhg=PDHGConfig(tol=1e-4,
                                                 max_iters=80_000))
            storm = load_instance("storm", dtype=storm_cfg.jdtype)
            out["storm_time_to_gap"] = _bench_sd_gap(
                storm, storm_cfg, storm_iters)
        except Exception as e:
            out["storm_time_to_gap"] = {"error": f"{type(e).__name__}: {e}"}
        # storm certified gap: the SD run's own cut-model minima are
        # already tight there (unlike ssn), so method="model" certifies
        # essentially for free — storm's extensive form does not
        # converge at a bench-scale first-order budget (RESULTS.md r4)
        try:
            out["storm_certified"] = _bench_certified(
                storm, storm_cfg, n_reps=4 if on_tpu else 2,
                n_iters=storm_iters, method="model",
                ub_samples=65536 if on_tpu else 4096,
                ub_half_width=3000.0 if on_tpu else 0.0)
        except Exception as e:
            out["storm_certified"] = {"error": f"{type(e).__name__}: {e}"}
        # THE QUALITY HEADLINE: certified optimality gap from R
        # replications + EF dual certificates (tol-1e-5 EF + minimal-
        # movement dual projection, RESULTS.md r5 — every term rigorous)
        # over antithetic-paired fresh stratified streams + the best of
        # {compromise, EF argmin} decisions evaluated independently
        # with the batch-mean CI (replaces round 3's proxy-based
        # rel_gap, which compared a cut-model evaluation that is not a
        # valid bound, and round 4's certificate, which carried
        # undeducted 1.8e-2 dual infeasibility).
        try:
            # N=3000 fresh streams, not more: the certification EF
            # converges to its 1e-5 tolerance there (~250s per R=8
            # group); at N=6000 even a 400k-iteration budget floors at
            # ef_err 3e-4 and the slope noise costs ~0.3 of bound
            # tightness (RESULTS.md r5 — the measured N-scaling wall)
            out["ssn_certified"] = _bench_certified(
                inst, config, n_reps=16 if on_tpu else 2,
                n_iters=sd_iters,
                fresh_scenarios=3000 if on_tpu else 256,
                ub_samples=786432 if on_tpu else 4096,
                ub_half_width=0.045 if on_tpu else 0.0,
                antithetic_reps=on_tpu)
        except Exception as e:
            out["ssn_certified"] = {"error": f"{type(e).__name__}: {e}"}
        # certified-gap-aware stopping (reference open TODO readme:18,
        # taken further): time-to-certified-gap on lands
        try:
            out["lands_target_gap"] = _bench_target_gap(
                on_tpu=on_tpu)
        except Exception as e:
            out["lands_target_gap"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--cpu-baseline-only", action="store_true",
                   help="skip the TPU probe entirely; measure on CPU")
    p.add_argument("--skip-sd-gap", action="store_true",
                   help="only the LP-throughput metric")
    args = p.parse_args(argv)
    if args.child:
        return child(args)
    return orchestrate(args)


if __name__ == "__main__":
    raise SystemExit(main())
