"""Problem model layer: SMPS I/O, stage templates, scenario model, instances.

Mirrors reference layers L1 (src/prob.jl), L2 (src/smps/) and L3
(src/crash.jl), but produces dense NumPy/JAX tensors rather than JuMP models.
"""

from sqlp_tpu.models.smps_cor import CorData, read_cor, tokenize_cor  # noqa: F401
from sqlp_tpu.models.smps_tim import Position, Period, TimData, read_tim  # noqa: F401
from sqlp_tpu.models.smps_sto import (  # noqa: F401
    DiscreteDistribution,
    NormalDistribution,
    UniformDistribution,
    StoData,
    read_sto,
    sample_scenario,
)
from sqlp_tpu.models.stage import (  # noqa: F401
    StageLP,
    get_smps_stage_template,
    instantiate,
    extract_objective,
    evaluate_first_stage_objective,
    check_first_stage_feasible,
)
from sqlp_tpu.models.instance import Instance, load_instance, compile_instance  # noqa: F401
from sqlp_tpu.models.scenario import ScenarioModel, build_scenario_model, sample_deltas  # noqa: F401
from sqlp_tpu.models.crash import crash_x0, solve_extensive_form  # noqa: F401
