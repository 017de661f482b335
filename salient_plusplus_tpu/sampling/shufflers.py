"""Seeded epoch shufflers.

Parity with fast_trainer/shufflers.py: every host derives the *same* global
permutation for an epoch from (initial_seed, epoch) and slices its own
contiguous range (DistributedShuffler, shufflers.py:32-45); the federated
variant shuffles only the host's own partition's seeds (shufflers.py:92-100).
Implemented with numpy PRNG on the host (seed ids feed the host sampler).
"""

from __future__ import annotations

import numpy as np


class Shuffler:
    """Single-host: full permutation each epoch."""

    def __init__(self, idx: np.ndarray, initial_seed: int = 2147483647):
        self.idx = np.asarray(idx, dtype=np.int64)
        self.initial_seed = initial_seed

    def get_idx(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.initial_seed + epoch)
        return self.idx[rng.permutation(len(self.idx))]

    def set_epoch(self, epoch: int) -> np.ndarray:  # convenience alias
        return self.get_idx(epoch)


class DistributedShuffler(Shuffler):
    """Same global permutation on every host; host takes its 1/world slice.

    Matches shufflers.py:32-45: the slice boundaries use ceil-division so
    trailing hosts may get one fewer seed; equal *iteration* counts are
    enforced separately by the equal-iteration splitter (sampler session),
    mirroring N10 (fast_sampler.cpp:587-627).
    """

    def __init__(self, idx: np.ndarray, world_size: int, rank: int,
                 initial_seed: int = 2147483647):
        super().__init__(idx, initial_seed)
        self.world_size = world_size
        self.rank = rank

    def get_idx(self, epoch: int) -> np.ndarray:
        perm = super().get_idx(epoch)
        n = len(perm)
        chunk = -(-n // self.world_size)
        return perm[self.rank * chunk:(self.rank + 1) * chunk]


class FederatedDistributedShuffler(Shuffler):
    """Each host shuffles only its own partition's seed set
    (shufflers.py:92-100) — zero cross-host seed traffic, maximal feature
    locality under contiguous-range partitioning."""

    def __init__(self, local_idx: np.ndarray, initial_seed: int = 2147483647):
        super().__init__(local_idx, initial_seed)
