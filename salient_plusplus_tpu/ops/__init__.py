from .segment import (
    gather_rows,
    masked_segment_sum,
    masked_segment_mean,
    masked_segment_max,
    masked_segment_softmax,
    valid_mask,
)

__all__ = [
    "gather_rows", "masked_segment_sum", "masked_segment_mean",
    "masked_segment_max", "masked_segment_softmax", "valid_mask",
]
