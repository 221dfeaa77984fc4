from pdp_solver_tpu.ops.segment import (
    segment_sum,
    segment_max,
    segment_min_index,
    segment_argmax_first,
    segment_smooth_max,
    safe_log,
    safe_exp,
)

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_min_index",
    "segment_argmax_first",
    "segment_smooth_max",
    "safe_log",
    "safe_exp",
]
