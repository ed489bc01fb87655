"""Numerical kernels: batched PDHG LP solver, ADMM prox-QP master solver.

These replace the reference's external-LP-solver boundary (JuMP -> MOI ->
GLPK/CPLEX, see SURVEY.md §1) with on-device first-order methods.
"""

from sqlp_tpu.ops.pdhg import PreparedLP, prepare_lp, solve_batch  # noqa: F401
from sqlp_tpu.ops.prox_qp import solve_qp  # noqa: F401
