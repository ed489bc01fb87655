"""Aux subsystems: metrics, checkpointing, profiling (SURVEY.md §5 — all
absent in the reference)."""

from sqlp_tpu.utils.metrics import MetricsLogger  # noqa: F401
from sqlp_tpu.utils.checkpoint import load_meta, load_state, save_state  # noqa: F401
from sqlp_tpu.utils.profiling import PhaseTimers, trace  # noqa: F401
