"""Threaded sampling sessions producing padded batches.

The TPU-native FastSampler/FastSamplerSession analog (reference:
fast_trainer/samplers.py:271-423 driving fast_sampler.cpp:533-935). The
reference runs an in-C++ thread pool with lock-free queues; here Python
worker threads call the native sampler (GIL released during the C call) and
recycle preallocated padded buffer sets through a bounded pool — the pool
bound plays the role of the reference's ``items_in_queue`` semaphore
(fast_sampler.cpp:904).

Correctness invariants carried over verbatim (SURVEY.md N9/N10):
- *equal iteration counts*: with ``exact_num_batches`` set, the epoch's seed
  ids are split into exactly that many nearly-equal chunks regardless of
  batch_size (fast_sampler.cpp:587-627), so every SPMD rank runs the same
  number of steps;
- *deterministic batch order*: batches are released to the consumer in epoch
  order via a reorder buffer (fast_sampler.cpp:653-712), so collectives
  line up across ranks;
- *per-batch deterministic RNG*: seed derived from (base_seed, epoch,
  batch index) (the analog of gen.seed(pair.second*17+5),
  fast_sampler.cpp:994).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .batch import BatchSpec
from .cpp import BatchBuffers, NativeSampler


def batch_seed(base_seed: int, epoch: int, batch_no: int) -> int:
    """Deterministic, well-mixed per-batch RNG seed."""
    s = (base_seed * 0x9E3779B97F4A7C15 + epoch * 0xBF58476D1CE4E5B9
         + batch_no * 0x94D049BB133111EB) & (2**64 - 1)
    s ^= s >> 31
    return s or 1


def split_seeds(idx: np.ndarray, batch_size: int,
                exact_num_batches: Optional[int] = None) -> List[np.ndarray]:
    """Chunk epoch seeds into batches.

    With exact_num_batches: nearly-equal split (N10 parity). Without: simple
    batch_size chunks (last partial).
    """
    if exact_num_batches is not None:
        return [c for c in np.array_split(idx, exact_num_batches)]
    return [idx[i:i + batch_size] for i in range(0, len(idx), batch_size)]


@dataclass
class SamplerStats:
    """Per-epoch sampler observability (FastSamplerStats parity,
    fast_trainer/samplers.py:308-315)."""

    total_blocked_dur: float = 0.0   # consumer wait in __next__
    total_blocked_occasions: int = 0
    sample_time: float = 0.0         # sum over workers
    batches: int = 0
    dropped_nodes: int = 0
    dropped_edges: int = 0
    dropped_cold: int = 0    # cold-tier rows over the cold budget
    cold_rows: int = 0       # host-tier rows served (gathered + shipped)
    # static-shape padding accounting (padded rows cost real device time):
    # waste fraction = 1 − real/padded, where padded sums each batch's OWN
    # bucket caps (2-bucket batches pay the tight caps, not the big ones)
    real_nodes: int = 0
    real_edges: int = 0
    padded_nodes: int = 0
    padded_edges: int = 0
    tight_batches: int = 0

    def node_waste(self, node_cap: int = 0) -> float:
        denom = self.padded_nodes or self.batches * node_cap
        return 1.0 - self.real_nodes / denom if denom else 0.0

    def edge_waste(self, edge_cap_total: int = 0) -> float:
        denom = self.padded_edges or self.batches * edge_cap_total
        return 1.0 - self.real_edges / denom if denom else 0.0


@dataclass
class FastSamplerConfig:
    """Mirror of the reference's FastSamplerConfig (samplers.py:271-298),
    reduced to what the TPU pipeline needs host-side."""

    spec: BatchSpec
    batch_size: int
    base_seed: int = 0
    num_workers: int = 3
    max_batches_in_flight: int = 8
    exact_num_batches: Optional[int] = None
    skip_nonfull_batch: bool = False
    # host-tier feature split (gpu_percent analog, base.py:107-116):
    # vertices with id >= hot_cutoff have their rows in x_cold (host RAM,
    # row i = global row hot_cutoff+i) and are gathered by sampler threads
    hot_cutoff: Optional[int] = None
    x_cold: Optional[np.ndarray] = None
    cold_cap: int = 0
    # when set, x_cold is a uint8 fp8-e4m3 payload and this holds the
    # per-row float32 dequant scales (cold_fp8 wire format)
    x_cold_scale: Optional[np.ndarray] = None
    # distributed tier variant: per-partition hot prefixes (set part/hot
    # sizes instead of hot_cutoff; x_cold = concat of all cold tails)
    cold_part_size: Optional[int] = None
    cold_hot_size: Optional[int] = None
    # device cold-row cache (sampling/cold_cache.py): a shared
    # HostColdCache managing the feature table's slack region; cold
    # classification then runs at CONSUMPTION time (slot-eviction safety)
    # and only miss rows ride H2D. cold_cap doubles as the per-batch miss
    # budget / top miss-bucket size.
    cold_cache: Optional[object] = None
    # fold mode (cold_fold_update): miss buffers always ship at the TOP
    # rung (cold_cap) — no /2 rung ladder — so the train step, which
    # applies the cache update itself, compiles exactly one treedef
    cold_fold: bool = False
    # owner-served cold tier: classify cold rows into per-owner request
    # slots instead of gathering from a host-replicated tail (rows are
    # fetched via the pre-step cold all_to_all, train/dist_loop.py)
    cold_owner_mode: bool = False
    cold_world: int = 0
    cold_r_cap: int = 0
    # emit global src ids for the outermost hop (PaddedBatch.gsrc)
    emit_gsrc: bool = False
    # ship per-target uint8 degrees instead of int32 dst arrays
    # (EdgeBlock.ddeg; fanouts must be in (0, 127])
    compress_dst: bool = False
    # wire-pack int32 index arrays to uint16(+uint8) halves; requires every
    # shipped id < 2^24 (with emit_gsrc the outer hop carries GLOBAL ids,
    # so callers gate on num_nodes)
    pack_wire: bool = False
    # second, tighter bucket: batches whose measured sizes fit it are
    # shipped as tight prefix VIEWS (zero-copy; less padding on device +
    # wire). Consumers pass bufs.bucket to to_padded_batch.
    tight_spec: Optional[BatchSpec] = None


class FastSamplerIter:
    """One epoch's iterator: spawns workers, yields in-order BatchBuffers.

    Consumer must call :meth:`recycle` once the buffers' contents have been
    copied to device (the feeder in train/pipeline.py does this); recycling
    returns the buffer set to the pool and unblocks a worker.
    """

    # consumer-side stall fail-fast (see __next__); generous — the longest
    # legitimate inter-batch wait is one host-contended sample (~seconds)
    STALL_TIMEOUT_S = 600.0

    def __init__(self, sampler: "FastSampler", epoch: int):
        self.sampler = sampler
        cfg = sampler.cfg
        idx = sampler.get_epoch_idx(epoch)
        self.batches = split_seeds(idx, cfg.batch_size, cfg.exact_num_batches)
        if cfg.skip_nonfull_batch and self.batches and \
                len(self.batches[-1]) < cfg.batch_size:
            self.batches = self.batches[:-1]
        self.num_batches = len(self.batches)
        self.stats = SamplerStats()
        self.epoch = epoch
        self._next_expected = 0
        self._reorder: dict[int, BatchBuffers] = {}
        self._out: queue.Queue = queue.Queue()
        self._free: queue.Queue = queue.Queue()
        self._work: queue.Queue = queue.Queue()
        self._shutdown = threading.Event()
        pool = min(cfg.max_batches_in_flight + cfg.num_workers,
                   max(2, self.num_batches + 1))
        for _ in range(max(pool, 1)):
            bufs = BatchBuffers(cfg.spec)
            bufs.attach_from_config(cfg, self.sampler.num_nodes)
            self._free.put(bufs)
        for bno, seeds in enumerate(self.batches):
            self._work.put(bno)
        self._threads = []
        nworkers = max(1, cfg.num_workers)
        for _ in range(nworkers):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self):
        cfg = self.sampler.cfg
        while not self._shutdown.is_set():
            # Acquire the buffer BEFORE claiming a batch number. The
            # reverse order deadlocks under CPU contention: a worker that
            # owns batch k but holds no buffer can be starved while its
            # peers leapfrog through k+1.. with every free buffer — those
            # results park in the reorder map (unusable before k) and the
            # consumer's feeder, blocked inside its top-up, never recycles
            # its in-flight buffers. Owning a buffer first guarantees the
            # holder of the consumer's next-expected batch can always
            # produce it. (Found via faulthandler on a 3x-oversubscribed
            # suite run; the reference's pool has the same claim order but
            # its consumer recycles per-batch, hiding the window.)
            bufs = self._free.get()
            if bufs is None or self._shutdown.is_set():
                return
            try:
                bno = self._work.get_nowait()
            except queue.Empty:
                self._free.put(bufs)  # keep the pool at full capacity
                return
            t0 = time.perf_counter()
            try:
                self.sampler.native.sample_into(
                    bufs, self.batches[bno],
                    rng_seed=batch_seed(cfg.base_seed, self.epoch, bno),
                    y_global=self.sampler.y,
                )
                self.stats.dropped_cold += bufs.finalize_from_config(cfg)
                # 2-bucket padding recovery: mark the batch for tight-spec
                # prefix VIEWS (to_padded_batch(bucket)) iff it fits. A pure
                # function of the batch's measured sizes — bucket choice is
                # deterministic. Reset stale marks from recycled buffers.
                bufs.bucket = (cfg.tight_spec if cfg.tight_spec is not None
                               and bufs.fits(cfg.tight_spec) else None)
            except BaseException as e:  # surface in the consumer, don't hang
                self.recycle(bufs)  # keep the pool at full capacity
                self._out.put((bno, e))
                return
            self.stats.sample_time += time.perf_counter() - t0
            self._out.put((bno, bufs))

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        return self

    def __next__(self) -> BatchBuffers:
        if self._next_expected >= self.num_batches:
            self.close()
            raise StopIteration
        t0 = time.perf_counter()
        blocked = False
        while self._next_expected not in self._reorder:
            try:
                bno, bufs = self._out.get(timeout=self.STALL_TIMEOUT_S)
            except queue.Empty:
                # fail fast, never hang (the framework contract —
                # tests/test_failfast.py): a batch this overdue means a
                # worker died or the pool ran dry; surface queue state
                # instead of blocking the trainer forever
                state = (f"batch {self._next_expected}/{self.num_batches} "
                         f"never arrived after {self.STALL_TIMEOUT_S}s: "
                         f"reorder={sorted(self._reorder)[:8]} "
                         f"free={self._free.qsize()} "
                         f"work={self._work.qsize()} "
                         f"workers_alive="
                         f"{sum(t.is_alive() for t in self._threads)}")
                self.close()
                raise RuntimeError(f"sampler stalled: {state}")
            blocked = True
            self._reorder[bno] = bufs
        if blocked:
            dur = time.perf_counter() - t0
            if dur > 1e-4:
                self.stats.total_blocked_dur += dur
                self.stats.total_blocked_occasions += 1
        bufs = self._reorder.pop(self._next_expected)
        if isinstance(bufs, BaseException):
            self.close()
            raise bufs
        cfg = self.sampler.cfg
        if cfg.cold_cache is not None:
            # serial, in consumption order — the cache's eviction-safety
            # contract (sampling/cold_cache.py)
            self.stats.dropped_cold += bufs.finalize_cached(cfg)
        self._next_expected += 1
        self.stats.batches += 1
        self.stats.dropped_nodes += int(bufs.overflow[0])
        self.stats.dropped_edges += int(bufs.overflow[1])
        self.stats.real_nodes += int(bufs.level_sizes[-1])
        self.stats.real_edges += int(bufs.edge_counts.sum())
        if getattr(bufs, "cold_pos", None) is not None:
            self.stats.cold_rows += int(bufs.cold_count)
        eff = bufs.bucket or bufs.spec
        self.stats.padded_nodes += eff.total_node_cap
        self.stats.padded_edges += sum(eff.edge_caps)
        if bufs.bucket is not None:
            self.stats.tight_batches += 1
        return bufs

    def recycle(self, bufs: BatchBuffers) -> None:
        self._free.put(bufs)

    def close(self):
        self._shutdown.set()
        # abandon unprocessed work so exiting workers don't leave batch
        # numbers that would block a later consumer
        try:
            while True:
                self._work.get_nowait()
        except queue.Empty:
            pass
        # unblock any worker waiting on a free buffer
        for _ in self._threads:
            self._free.put(None)
        for t in self._threads:
            t.join(timeout=5)
        self._threads = []


class FastPreSampler:
    """Pre-samples the whole epoch up front, then iterates the materialized
    batches — the reference's FastPreSampler / OpenMP full_sample path
    (fast_trainer/samplers.py:402-423, fast_sampler.cpp:310-366). Trades
    host memory for zero sampling latency inside the epoch (useful when
    the same epoch order is replayed, e.g. cache-creation passes)."""

    def __init__(self, sampler: "FastSampler"):
        self.sampler = sampler
        self.dropped_cold = 0  # over-cold-budget rows across the epoch

    def presample(self, epoch: int):
        cfg = self.sampler.cfg
        idx = self.sampler.get_epoch_idx(epoch)
        batches = split_seeds(idx, cfg.batch_size, cfg.exact_num_batches)
        out = [None] * len(batches)

        import concurrent.futures as cf

        def work(bno):
            bufs = BatchBuffers(cfg.spec)
            bufs.attach_from_config(cfg, self.sampler.num_nodes)
            self.sampler.native.sample_into(
                bufs, batches[bno],
                rng_seed=batch_seed(cfg.base_seed, epoch, bno),
                y_global=self.sampler.y)
            return bno, bufs, bufs.finalize_from_config(cfg)

        with cf.ThreadPoolExecutor(max(1, cfg.num_workers)) as ex:
            for bno, bufs, dropped in ex.map(work, range(len(batches))):
                out[bno] = bufs
                self.dropped_cold += dropped
        return out

    def __iter__(self):
        return iter(self.presample(self.sampler.epoch))


class FastSampler:
    """Epoch-iterable sampler over one graph (FastSampler parity,
    samplers.py:372-399). ``idx`` is set per epoch by the driver/shuffler."""

    def __init__(self, rowptr: np.ndarray, col: np.ndarray, y: np.ndarray,
                 cfg: FastSamplerConfig,
                 idx: Optional[np.ndarray] = None):
        self.native = NativeSampler(rowptr, col)
        self.y = y
        self.cfg = cfg
        self.idx = idx if idx is not None else np.empty(0, np.int64)
        self.epoch = 0

    def get_epoch_idx(self, epoch: int) -> np.ndarray:
        return self.idx

    @property
    def num_nodes(self) -> int:
        return self.native.rowptr.shape[0] - 1

    def pack_src_maxval(self):
        """Per-hop exclusive bound of edge-src values (attach_pack)."""
        from .cpp import pack_src_maxval

        return pack_src_maxval(self.cfg.spec, self.cfg.emit_gsrc,
                               self.num_nodes)

    def set_epoch(self, idx: np.ndarray, epoch: int):
        self.idx = idx
        self.epoch = epoch

    def __len__(self):
        return len(split_seeds(self.idx, self.cfg.batch_size,
                               self.cfg.exact_num_batches))

    def __iter__(self) -> FastSamplerIter:
        return FastSamplerIter(self, self.epoch)
