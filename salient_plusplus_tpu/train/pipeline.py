"""Host→device batch feeder with transfer/compute overlap.

The TPU-native DeviceIterator family (reference:
fast_trainer/transferers.py). The reference needs a manually-scheduled
10-stage CUDA-stream pipeline because sampling, slicing, 3 all_to_alls and
compute each live on their own stream; under XLA the collectives and gathers
are *inside* the compiled step, so the only host-side pipeline left is:
keep the sampler's padded buffers flowing onto the device ahead of compute
(the DevicePrefetcher analog, transferers.py:890-970).

``DeviceFeeder`` keeps ``depth`` batches in flight: batch k+depth is
device_put (async) while batch k trains; a popped batch is awaited
(normally already resident), its host buffers recycled to the sampler pool,
and handed to the step. Feed-starvation time is tracked — the TPU analog of
the sampler's total_blocked_dur (fast_sampler.cpp:921-922).
"""

from __future__ import annotations

import collections
import time
from typing import Any, Optional

import jax

from ..sampling.cpp import BatchBuffers
from ..sampling.sampler import FastSamplerIter


class DeviceFeeder:
    """Iterate device-resident PaddedBatches with prefetch depth.

    sharding: a jax.sharding.Sharding (or device) applied to every leaf.
    pipelined=False degrades to synchronous transfer per batch — the
    reference's --pipeline_disabled ablation (driver/parser.py:104).
    """

    def __init__(self, it: FastSamplerIter, sharding: Optional[Any] = None,
                 depth: int = 2, pipelined: bool = True):
        self.it = it
        self.sharding = sharding
        self.depth = max(1, depth)
        self.pipelined = pipelined
        self._inflight = collections.deque()
        self._primed = False  # first batch returned (initial fill done)
        self.starved_dur = 0.0
        self.starved_occasions = 0
        # host-side accounting (never read scalars off the device batch in
        # the hot loop — on remote-attached TPUs every D2H is a round-trip)
        self.edges_fed = 0
        self.seeds_fed = 0
        self.bytes_fed = 0  # H2D wire bytes (sum of shipped leaf sizes)
        # On the CPU backend device_put zero-copies aligned numpy arrays —
        # the "device" array aliases the pooled sampler buffer, so recycling
        # would corrupt batches still in use. Copy in that case; on TPU the
        # H2D transfer is a real copy and block_until_ready makes recycling
        # safe without one.
        devs = (list(sharding.device_set)
                if hasattr(sharding, "device_set")
                else [sharding] if sharding is not None else jax.devices()[:1])
        self._needs_copy = any(
            getattr(d, "platform", "cpu") == "cpu" for d in devs)

    def _put(self, bufs: BatchBuffers):
        self.edges_fed += int(bufs.edge_counts.sum())
        self.seeds_fed += int(bufs.seed_count)
        host_batch = bufs.to_padded_batch(bufs.bucket)
        self.bytes_fed += sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(host_batch)
            if hasattr(leaf, "nbytes"))
        if self._needs_copy:
            import numpy as _np

            host_batch = jax.tree_util.tree_map(_np.array, host_batch)
        if self.sharding is not None:
            dev = jax.device_put(host_batch, self.sharding)
        else:
            dev = jax.device_put(host_batch)
        self._inflight.append((dev, bufs))

    def __iter__(self):
        return self

    def __len__(self):
        return len(self.it)

    def __next__(self):
        # top up the pipeline
        while len(self._inflight) < (self.depth if self.pipelined else 1):
            try:
                t0 = time.perf_counter()
                bufs = next(self.it)
                dt = time.perf_counter() - t0
                # any sampler wait after the initial fill delays the step
                # that this __next__ serves — that's feed starvation (the
                # pipelined=False ablation's entire exposed sampling cost
                # lands here; the old `and self._inflight` guard excluded
                # exactly those waits and counted warmup fills instead)
                if self._primed and dt > 1e-4:
                    self.starved_dur += dt
                    self.starved_occasions += 1
                self._put(bufs)
            except StopIteration:
                break
        if not self._inflight:
            raise StopIteration
        dev, bufs = self._inflight.popleft()
        # ensure host->device copy is complete before recycling host buffers
        dev = jax.block_until_ready(dev)
        self.it.recycle(bufs)
        self._primed = True
        return dev
