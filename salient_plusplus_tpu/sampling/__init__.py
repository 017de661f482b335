from .batch import BatchSpec, PaddedBatch, EdgeBlock
from .oracle import multilayer_sample_np, pad_sample
from .shufflers import Shuffler, DistributedShuffler, FederatedDistributedShuffler

__all__ = [
    "BatchSpec", "PaddedBatch", "EdgeBlock",
    "multilayer_sample_np", "pad_sample",
    "Shuffler", "DistributedShuffler", "FederatedDistributedShuffler",
]
