from .segment import (
    gather_rows,
    masked_segment_sum,
    masked_segment_mean,
    masked_segment_max,
    masked_segment_softmax,
    segment_degrees_sorted,
    sorted_segment_sum_scan,
    valid_mask,
)
from .pallas_gather import pallas_gather_rows, use_pallas_gather
from .pallas_aggregate import (
    fused_gather_segment_sum, fused_segment_sum_op, use_fused_aggregate,
)

__all__ = [
    "gather_rows", "masked_segment_sum", "masked_segment_mean",
    "masked_segment_max", "masked_segment_softmax",
    "segment_degrees_sorted", "sorted_segment_sum_scan", "valid_mask",
    "pallas_gather_rows", "use_pallas_gather",
    "fused_gather_segment_sum", "fused_segment_sum_op",
    "use_fused_aggregate",
]
