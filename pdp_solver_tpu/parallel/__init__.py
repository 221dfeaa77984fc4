from pdp_solver_tpu.parallel.mesh import (
    make_mesh, stack_batches, make_parallel_train_step, make_parallel_solve,
    distributed_initialize)
