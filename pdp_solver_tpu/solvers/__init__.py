from pdp_solver_tpu.solvers.base import (
    SolverConfig, PDPSolver, SolverState, build_solver)
