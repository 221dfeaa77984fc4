from pdp_solver_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, stack_batches, make_parallel_train_step,
    make_parallel_solve, make_replica_parallel_solve, distributed_initialize)
