"""RangePartitionBook — contiguous-range partition directory.

TPU-native redesign of the reference's C++ RangePartitionBook
(fast_sampler/range_partition_book.hpp:31-57, .cpp:85-112): because the
dataset is relabeled so each partition owns a contiguous id range, all
directory operations are two-op tensor math and run *on device inside the
jitted step* (searchsorted / subtract / range-test) instead of as host C++.
Works identically on numpy arrays (host sampler path) and jnp arrays
(device path).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class RangePartitionBook:
    part_offsets: np.ndarray  # int [k+1]; partition p owns [off[p], off[p+1])

    @property
    def num_parts(self) -> int:
        return len(self.part_offsets) - 1

    def nid2partid(self, nids, xp=np):
        # range_partition_book.cpp:98-100 (searchsorted on offsets)
        return xp.searchsorted(self.part_offsets[1:], nids, side="right").astype(
            nids.dtype if hasattr(nids, "dtype") else np.int32
        )

    def nid2localnid(self, nids, part_id: int, xp=np):
        # range_partition_book.cpp:89-96 (subtract own offset)
        return nids - self.part_offsets[part_id]

    def nid_is_local(self, nids, part_id: int, xp=np):
        # range_partition_book.cpp:105-107 (range test)
        lo, hi = self.part_offsets[part_id], self.part_offsets[part_id + 1]
        return (nids >= lo) & (nids < hi)

    def partid2nids(self, part_id: int, xp=np):
        # range_partition_book.cpp:109-112 (arange over the owned range)
        return xp.arange(self.part_offsets[part_id],
                         self.part_offsets[part_id + 1], dtype=np.int64)

    def part_sizes(self, xp=np):
        return xp.diff(self.part_offsets)
