from pdp_solver_tpu.fg.batch import (
    FGBatch, pack_instances, bucket_dims, replicate_batch)
from pdp_solver_tpu.fg.loader import BatchLoader, divide_batch
from pdp_solver_tpu.fg.generators import (
    UniformCNFGenerator, ModularCNFGenerator, VariableModularCNFGenerator,
    make_generator)
