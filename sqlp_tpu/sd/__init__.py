"""The SD algorithm layer (reference L4, src/sd_algorithm/ — see SURVEY.md).

State is one pytree (state.py); the iteration is one jitted step
(algorithm.py); the host driver loops it (driver.py).
"""

from sqlp_tpu.sd.state import (  # noqa: F401
    EpigraphSpec, SDState, default_epigraph_spec, init_state)
from sqlp_tpu.sd.dual_pool import push_duals, round_sig_bits  # noqa: F401
from sqlp_tpu.sd.cuts import (  # noqa: F401
    Cut, argmax_duals, build_sasa_cut, evaluate_epigraph,
    evaluate_multi_epigraph)
from sqlp_tpu.sd.algorithm import sd_step  # noqa: F401
from sqlp_tpu.sd.driver import SDSolver, solve_instance  # noqa: F401
from sqlp_tpu.sd.lower_bound import (  # noqa: F401
    certified_lower_bound, cut_model_min, saa_polish, t_lower_bound)
