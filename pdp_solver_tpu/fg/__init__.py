from pdp_solver_tpu.fg.batch import FGBatch, pack_instances, bucket_dims
