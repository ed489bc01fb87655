"""Distributed layer: device mesh + sharding specs (SURVEY.md §5.7-5.8)."""

from sqlp_tpu.parallel.mesh import (  # noqa: F401
    SCENARIO_AXIS, make_mesh, replicate, shard_state, state_pspecs,
    state_shardings)
