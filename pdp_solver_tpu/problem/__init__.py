from pdp_solver_tpu.problem.state import (
    ProblemState,
    init_problem_state,
    compute_edge_mask,
    edge_active_instance_mask,
)
from pdp_solver_tpu.problem.simplify import (
    set_variable_core,
    unit_propagate,
    peel,
    simplify,
    set_variables,
    fused_simplify,
    fused_set_variables,
)
