"""Process-level JAX configuration, applied explicitly by entry points.

Previously these updates ran as a side effect of importing
``sqlp_tpu.sd.driver``, which mutated global JAX state (default dtypes,
compilation-cache paths) for any unrelated code sharing the process
(ADVICE r1). Entry points — the CLI, the SDSolver constructor, the bench
harness — now call :func:`configure_jax` at startup instead.
"""

from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    """Idempotent; safe to call from every entry point.

    - Persistent compilation cache: the jitted sd_step is a large graph
      (~minutes of XLA compile on TPU); cache compilations across
      processes.
    - x64: enables the f64 master-QP path inside solve_qp (storm-scale
      masters are not solvable to per-row feasibility in f32); all other
      state keeps the configured dtype — literals stay weakly typed under
      JAX promotion.

    Set SQLP_TPU_NO_JAX_CONFIG=1 to leave global JAX config untouched
    (embedding in a process that manages its own config).
    """
    global _configured
    if _configured or os.environ.get("SQLP_TPU_NO_JAX_CONFIG"):
        return
    import jax

    # The cache key does NOT include the host CPU's feature set, but
    # XLA:CPU stores AOT-compiled executables: an entry written on a
    # machine with (say) AMX/AVX10 loads on a host without them and
    # executes illegal instructions ("Loading XLA:CPU AOT result ...
    # could lead to execution errors such as SIGILL", observed here when
    # rounds moved hosts). Fingerprint the cache dir by the CPU flags so
    # each machine class gets its own cache.
    try:
        import hashlib
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
        fp = hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        fp = "nocpuinfo"
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SQLP_TPU_COMPILE_CACHE",
                       os.path.expanduser(f"~/.cache/sqlp_tpu_xla-{fp}")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_enable_x64", True)
    _configured = True
