"""Host-side SD driver: init, iterate, evaluate.

Plays the role of the reference's instance-driver scripts
(test/instance_test/sd_single_cut_test.jl:20-87, ssn_test.jl:24-62): read an
instance, build the cell/epigraphs, loop ``sd_iteration!``, periodically
estimate the Monte-Carlo upper bound. Those scripts are the reference's only
"API"; here the same pattern is a small class around the jitted step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# The jitted sd_step is a large graph (~minutes of XLA compile on TPU);
# cache compilations across processes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SQLP_TPU_COMPILE_CACHE",
                                 os.path.expanduser("~/.cache/sqlp_tpu_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from sqlp_tpu.config import SDConfig
from sqlp_tpu.models.instance import Instance, load_instance
from sqlp_tpu.ops.pdhg import prepare_lp, solve_batch
from sqlp_tpu.sd.algorithm import _scenario_rhs, sd_step
from sqlp_tpu.sd.state import EpigraphSpec, SDState, default_epigraph_spec, init_state
from sqlp_tpu.models.scenario import sample_deltas


class SDSolver:
    """Two-stage regularized SD solver on a compiled instance."""

    def __init__(self, inst: Instance, config: SDConfig = SDConfig(),
                 espec: Optional[EpigraphSpec] = None,
                 x0=None, seed: int = 0):
        self.inst = inst
        self.config = config
        self.espec = espec if espec is not None else default_epigraph_spec(
            1, 1.0, 0.0, dtype=config.jdtype)
        self.prep_sub = prepare_lp(
            inst.arrays.W, inst.arrays.senses2, inst.arrays.q,
            inst.arrays.lb2, inst.arrays.ub2, ruiz_iters=config.pdhg.ruiz_iters)
        if x0 is None:
            x0 = np.zeros(inst.n1)
        self.state: SDState = init_state(
            inst, self.espec, config, x0, jax.random.PRNGKey(seed))
        self.history: List[Dict] = []

    def step(self) -> Dict:
        """One SD iteration; returns host-side stats dict."""
        self.state, stats = sd_step(
            self.inst.arrays, self.inst.scenario_model, self.espec,
            self.prep_sub, self.state, self.config)
        return stats

    def run(self, n_iters: int, log_every: int = 0,
            callback: Optional[Callable[[int, Dict], None]] = None,
            chunk: int = 64) -> Dict:
        """Run n_iters iterations; returns the last iteration's stats.

        Iterations execute in on-device chunks (sd_run) with ONE host sync
        per chunk — per-step host round trips dominate wall clock on a
        tunneled TPU. Per-iteration scalar stats for the whole run land in
        ``self.history`` at ``log_every`` granularity.
        """
        from sqlp_tpu.sd.algorithm import sd_run

        last: Dict = {}
        done = 0
        while done < n_iters:
            n = min(chunk, n_iters - done)
            self.state, acc = sd_run(
                self.inst.arrays, self.inst.scenario_model, self.espec,
                self.prep_sub, self.state, self.config, n)
            acc = {k: np.asarray(v) for k, v in acc.items()}
            done += n
            if log_every:
                for j in range(n):
                    it = int(acc["it"][j])
                    if it % log_every == 0:
                        self.history.append(
                            {k: acc[k][j].item() for k in acc})
            last = {k: acc[k][-1] for k in acc}
            if callback:
                callback(done, last)
        return last

    @property
    def x_incumbent(self) -> np.ndarray:
        return np.asarray(self.state.x_incumbent)

    @property
    def x_candidate(self) -> np.ndarray:
        return np.asarray(self.state.x_candidate)

    @property
    def lower_estimate(self) -> float:
        """Candidate objective estimate under current cuts — the lb proxy the
        reference drivers print (sd_single_cut_test.jl:71-77)."""
        return float(self.state.cand_est)

    def evaluate(self, x=None, n_samples: int = 10_000, seed: int = 123,
                 batch: int = 4096) -> float:
        """Monte-Carlo upper-bound estimate at x (smps_routines.jl:67-82),
        batched on device instead of N serial solver round-trips."""
        inst = self.inst
        x = jnp.asarray(self.x_incumbent if x is None else x,
                        self.config.jdtype)
        key = jax.random.PRNGKey(seed)
        total = 0.0
        done = 0
        while done < n_samples:
            b = min(batch, n_samples - done)
            key, k = jax.random.split(key)
            deltas = sample_deltas(k, inst.scenario_model, b)
            H = _scenario_rhs(inst.arrays, inst.scenario_model, deltas, x)
            obj, _, _, stats = solve_batch(self.prep_sub, H, self.config.pdhg)
            total += float(jnp.sum(obj))
            done += b
        first = float(jnp.dot(inst.arrays.c, x))
        return first + total / n_samples


def solve_instance(name_or_dir: str, n_iters: int = 1000,
                   config: SDConfig = SDConfig(), x0=None,
                   seed: int = 0, log_every: int = 100,
                   verbose: bool = True) -> SDSolver:
    """Convenience one-call driver (the reference's script pattern)."""
    inst = load_instance(name_or_dir, dtype=config.jdtype)
    solver = SDSolver(inst, config, x0=x0, seed=seed)

    def cb(i, stats):
        if verbose:
            print(f"[{inst.name}] iter {i}: lb_est={stats['cand_est']:.4f} "
                  f"inc_est={stats['inc_est']:.4f} rho={stats['rho']:.4g} "
                  f"duals={stats['n_duals']} cuts={stats['n_cuts_live']}")

    t0 = time.time()
    solver.run(n_iters, log_every=log_every, callback=cb)
    if verbose:
        print(f"[{inst.name}] {n_iters} iters in {time.time() - t0:.1f}s")
    return solver
