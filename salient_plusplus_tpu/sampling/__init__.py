from .batch import BatchSpec, PaddedBatch, EdgeBlock
from .oracle import multilayer_sample_np, pad_sample
from .sampler import (
    FastPreSampler, FastSampler, FastSamplerConfig, SamplerStats,
    batch_seed, split_seeds,
)
from .shufflers import Shuffler, DistributedShuffler, FederatedDistributedShuffler

__all__ = [
    "BatchSpec", "PaddedBatch", "EdgeBlock",
    "multilayer_sample_np", "pad_sample",
    "FastPreSampler", "FastSampler", "FastSamplerConfig", "SamplerStats",
    "batch_seed", "split_seeds",
    "Shuffler", "DistributedShuffler", "FederatedDistributedShuffler",
]
