"""Single-host training driver: epoch loop, eval, best-model tracking.

The TPU-native BaseDriver/run_driver core (reference:
driver/drivers/base.py:298-424 train loop, :440-525 batchwise_test;
driver/main.py:188-245 epoch/validation/checkpoint loop). SPMD distributed
drivers build on this in parallel/spmd.py.
"""

from __future__ import annotations

import time
import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..data.dataset import GraphData
from ..models import make_model
from ..sampling.batch import BatchSpec, mirror_all_specs
from ..sampling.cpp import NativeSampler
from ..sampling.sampler import FastSampler, FastSamplerConfig
from ..sampling.shufflers import Shuffler
from ..utils.logging import RunLogger
from ..utils.timing import RuntimeStats
from .pipeline import DeviceFeeder
from .state import TrainState, create_train_state
from .step import make_eval_step, make_train_step


def calibrate_spec(native: NativeSampler, seeds_pool: np.ndarray,
                   batch_size: int, fanouts, num_batches: int = 8,
                   safety: float = 1.3, seed: int = 1234,
                   worst_case_probe: bool = True,
                   tight_quantile: Optional[float] = None):
    """Measure frontier/edge sizes over sample batches → padded bucket.

    The static-shape price of XLA (SURVEY.md §7 "hard parts"): capacities
    are set to max-observed × safety, rounded to 128; the sampler counts
    overflow drops so miscalibration is observable, not silent.

    With ``tight_quantile`` set, returns ``(spec, tight)`` where ``tight``
    is a second, quantile-calibrated bucket (no safety margin — batches
    that don't fit it simply stay in the big bucket): the 2-bucket padding
    recovery (SURVEY §7). ``tight`` is None when it would equal ``spec``.
    """
    L = len(fanouts)
    batch_size = min(batch_size, len(seeds_pool)) or batch_size
    # generous scratch spec for measurement (kept monotone even when the
    # batch size exceeds the graph size)
    caps = [batch_size]
    for f in fanouts:
        caps.append(max(caps[-1],
                        min(caps[-1] * (abs(f) + 1) + 1024,
                            native.rowptr.shape[0] - 1 + 1024)))
    probe = BatchSpec(tuple(fanouts), batch_size, tuple(caps),
                      tuple(max(1024, caps[i] * max(abs(fanouts[i]), 1))
                            for i in range(L)))
    rng = np.random.default_rng(seed)
    ls_max = np.zeros(L + 1, np.int64)
    ec_max = np.zeros(L, np.int64)
    probes = []
    for i in range(num_batches):
        take = min(batch_size, len(seeds_pool))
        probes.append(np.sort(rng.choice(seeds_pool, size=take,
                                         replace=False)))
    # adversarial probe: the pool's highest-degree seeds form a near
    # upper-bound batch (frontier size grows with seed degrees) — random
    # probes alone under-cap degree-correlated batches on skewed graphs
    if worst_case_probe:
        deg = np.diff(native.rowptr)
        order = np.argsort(-deg[seeds_pool], kind="stable")
        probes.append(np.sort(
            seeds_pool[order[: min(batch_size, len(seeds_pool))]]))
    ls_all, ec_all = [], []
    for i, seeds in enumerate(probes):
        b = native.sample(probe, seeds, rng_seed=seed + i)
        ls_max = np.maximum(ls_max, b.level_sizes)
        ec_max = np.maximum(
            ec_max, [int(e.count) for e in reversed(b.edges)])
        ls_all.append(np.asarray(b.level_sizes, np.int64))
        ec_all.append(np.asarray([int(e.count) for e in reversed(b.edges)],
                                 np.int64))
    spec = BatchSpec.from_measurements(batch_size, fanouts, ls_max, ec_max,
                                       safety=safety)
    if tight_quantile is None:
        return spec
    # quantile over the RANDOM probes only (the adversarial worst-case
    # probe is an upper bound for the big bucket, not a typical batch)
    n_rand = num_batches if worst_case_probe else len(ls_all)
    ls_q = np.quantile(np.stack(ls_all[:n_rand]), tight_quantile, axis=0)
    ec_q = np.quantile(np.stack(ec_all[:n_rand]), tight_quantile, axis=0)
    tight = BatchSpec.from_measurements(batch_size, fanouts, ls_q, ec_q,
                                        safety=1.0)
    tight = BatchSpec(
        tight.fanouts, tight.seed_cap,
        tuple(min(a, b) for a, b in zip(tight.node_caps, spec.node_caps)),
        tuple(min(a, b) for a, b in zip(tight.edge_caps, spec.edge_caps)))
    return spec, (tight if tight != spec else None)


@dataclass
class TrialResult:
    best_epoch: int = -1
    best_valid_acc: float = 0.0
    final_valid_acc: float = 0.0
    final_test_acc: float = 0.0
    epoch_times: List[float] = field(default_factory=list)
    losses: List[float] = field(default_factory=list)


class Trainer:
    """Single-host trainer over one GraphData."""

    def __init__(self, cfg: RunConfig, graph: GraphData,
                 logger: Optional[RunLogger] = None, device=None):
        self.cfg = cfg
        self.graph = graph
        self.logger = logger or RunLogger()
        self.stats = RuntimeStats()
        self.device = device or jax.devices()[0]
        from ..utils.data_collector import DataCollector

        self.collector = DataCollector(cfg.output_root, rank=0,
                                       enabled=cfg.collect_data)

        self.native = NativeSampler(np.asarray(graph.rowptr, np.int64),
                                    np.asarray(graph.col, np.int32))
        train_idx = graph.split_idx["train"]
        if cfg.spec_buckets > 1:
            self.train_spec, self.train_tight = calibrate_spec(
                self.native, train_idx, cfg.train_batch_size,
                cfg.train_fanouts, cfg.calibration_batches, cfg.spec_safety,
                cfg.seed, worst_case_probe=cfg.calibrate_worst_case,
                tight_quantile=cfg.tight_quantile)
        else:
            self.train_spec = calibrate_spec(
                self.native, train_idx, cfg.train_batch_size,
                cfg.train_fanouts, cfg.calibration_batches, cfg.spec_safety,
                cfg.seed, worst_case_probe=cfg.calibrate_worst_case)
            self.train_tight = None
        # GAT/GCN/ARMA differentiate a PROJECTION of the raw input, so
        # layer 0 needs d_x — emit the outermost hop's src-sorted mirror
        # too (scatter-free backward over the largest hop; gsrc models
        # never need it and the two are mutually exclusive)
        self.train_spec, self.train_tight = mirror_all_specs(
            cfg.model_name, self.train_spec, self.train_tight)
        # (split, fanouts) -> (spec, tight-or-None)
        self.eval_specs: Dict[tuple, tuple] = {}
        # per-split cold-cap floor: grown after a dropping evaluate() (the
        # per-call probe calibration alone can recur the same shortfall)
        self.eval_cold_floor: Dict[tuple, int] = {}
        # per-split calibrated cold cap — probe ONCE per (split, spec),
        # not on every evaluate() call (probe sampling is expensive at
        # eval-spec frontier sizes)
        self.eval_cold_base: Dict[tuple, int] = {}

        # hot/cold feature split (gpu_percent analog, base.py:107-116):
        # the hot prefix lives in HBM; the cold tail stays in host RAM and
        # is gathered by sampler threads. VIP-reordered datasets put the
        # hottest vertices first, making the prefix policy effective.
        V = graph.num_nodes
        self.hot_cutoff = (None if cfg.hbm_fraction >= 1.0
                           else max(1, int(V * cfg.hbm_fraction)))
        from ..data.dataset import pad_feature_dim

        x_np = pad_feature_dim(np.asarray(graph.x))
        # host-side bf16 once: the HBM table is bf16 anyway, and the cold
        # tier ships raw rows host→device — fp32 cold rows would double
        # the dominant >HBM wire payload (measured 11.6→6.2 MB/batch at
        # hbm_fraction=0.5 on the bench shape)
        if x_np.dtype != jnp.bfloat16:
            x_np = x_np.astype(jnp.bfloat16)
        self.x_cold_scale = None
        # cold rows are UNIQUE frontier members, so a batch can never hold
        # more than the whole cold tail — the hard cap every growth clamps
        # to (also what keeps the gsrc slot id space ≤ V + 128)
        self._cold_cap_max = (0 if self.hot_cutoff is None else
                              -(-(V - self.hot_cutoff) // 128) * 128)
        if self.hot_cutoff is not None:
            self.x_cold = np.ascontiguousarray(x_np[self.hot_cutoff:])
            if cfg.cold_fp8:
                from ..parallel.exchange import fp8_encode_rows_np

                self.x_cold, self.x_cold_scale = \
                    fp8_encode_rows_np(self.x_cold)
            cold_cap = self._calibrate_cold_cap(train_idx)
        else:
            self.x_cold, cold_cap = None, 0

        # layer-0 aggregates straight from the HBM table when the model's
        # first hop consumes raw features (gsrc mode): the frontier gather
        # shrinks to the level-(L-1) prefix. With hbm_fraction<1 the cold
        # rows are written into a slack region of the table before each
        # step (self._cold_update) and cold ids are remapped to slack
        # slots by the sampler, so the same single-gather path applies —
        # round-3 review item #2 (hbm<1 used to force the fallback).
        self.global_msg0 = (cfg.gsrc_mode != "off" and
                            cfg.model_name in ("SAGE", "SAGEClassic", "GIN"))
        self._gsrc_cold = self.global_msg0 and self.hot_cutoff is not None
        self._cold_update_fn = None
        self._cache_update_fn = None
        self._slack = 0
        # ship uint8 per-target degrees instead of int32 dst (wire cut)
        self.compress_dst = all(0 < f <= 127 for f in cfg.train_fanouts)
        # wire-pack int32 index arrays (2-3 bytes/elem); with gsrc the
        # outer hop ships GLOBAL ids (cold slot encoding adds ≤ 128), so
        # gate on the whole id space fitting 2^24
        self.pack_wire = (cfg.pack_wire
                          and (not self.global_msg0 or V < 2**24 - 256)
                          and self.train_spec.total_node_cap < 2**24)
        # persistent device cold-row cache in the slack region: only MISS
        # rows ride H2D per batch (round-3 review item #1 — cross-batch
        # dedup of the >HBM wire); +1 slack row = the permanent zero row
        # dropped ids point at. cold_cache_slots == -1: decide on/off and
        # slot count from the measured H2D credit (round-4 review #5 —
        # "a knob is not a policy"; the cache WINS only when the link
        # credit is below the projected no-cache demand).
        self._cold_cache = None
        self.cold_plan = None
        slots = cfg.cold_cache_slots
        if slots != 0:
            if not self._gsrc_cold:
                raise ValueError(
                    "cold_cache_slots requires a gsrc-capable model "
                    "(SAGE/SAGEClassic/GIN) — the cache lives in the "
                    "gsrc slack region")
            if slots == -1:
                slots = self._plan_cold_cache(train_idx, cold_cap, V)
        if slots > 0:
            from ..sampling.cold_cache import HostColdCache

            self._cold_cache = HostColdCache(
                V - self.hot_cutoff, max(slots, cold_cap))
        # fold the cold tier's slack update into the train step
        # (PERF_NOTES r4 finding 5). Cache mode: top-rung-only miss
        # buffers — one treedef, no per-batch updater dispatch. Plain
        # gsrc-cold mode: the _cold_update dynamic_update_slice moves
        # inside the step — same dispatch saving, no byte cost.
        self._fold_cold = (cfg.cold_fold_update and
                           (self._cold_cache is not None
                            or self._gsrc_cold))
        self.train_sampler = FastSampler(
            self.native.rowptr, self.native.col,
            np.asarray(graph.y, np.int32),
            FastSamplerConfig(
                spec=self.train_spec, batch_size=cfg.train_batch_size,
                base_seed=cfg.seed, num_workers=cfg.num_workers,
                max_batches_in_flight=cfg.max_batches_in_flight,
                hot_cutoff=self.hot_cutoff, x_cold=self.x_cold,
                x_cold_scale=self.x_cold_scale,
                cold_cap=cold_cap, cold_cache=self._cold_cache,
                cold_fold=self._fold_cold,
                emit_gsrc=self.global_msg0,
                compress_dst=self.compress_dst,
                pack_wire=self.pack_wire,
                tight_spec=self.train_tight))
        self.shuffler = Shuffler(train_idx, initial_seed=cfg.seed + 2**31 - 1)

        # hot features resident in HBM, bf16
        hot = x_np if self.hot_cutoff is None else x_np[: self.hot_cutoff]
        self.features = jax.device_put(
            jnp.asarray(hot, jnp.bfloat16), self.device)
        if self._cold_cache is not None:
            self._ensure_slack(self._cold_cache.slots + 1)
        elif self._gsrc_cold:
            self._ensure_slack(self.train_sampler.cfg.cold_cap)

        self.model = make_model(
            cfg.model_name, graph.num_features, cfg.hidden_features,
            graph.num_classes, cfg.num_layers, cfg.dropout)
        self.train_step = make_train_step(
            global_msg0=self.global_msg0, fold_cold=self._fold_cold,
            fold_slack_at=(self.hot_cutoff
                           if (self._fold_cold
                               and self._cold_cache is None) else None))
        self.eval_step = make_eval_step(global_msg0=self.global_msg0)
        self.state: Optional[TrainState] = None
        self.reset()

    def _plan_cold_cache(self, train_idx, cold_cap: int, V: int) -> int:
        """cold_cache_slots == -1: compute the slot count from the
        measured H2D credit (train/cold_policy.py). Samples ONE probe
        batch through the production wire format to measure the real
        per-batch payload split (base vs cold), then sizes slots so the
        projected residual demand fits the credit. Returns 0 (cache off)
        on healthy links — where the cache measurably loses."""
        from ..sampling.cpp import BatchBuffers
        from .cold_policy import (
            estimate_batch_bytes, measure_h2d_credit, plan_cold_cache)

        cfg = self.cfg
        credit = cfg.h2d_credit_mbs
        if credit is None:
            credit = measure_h2d_credit(self.device)
        if credit is None:  # CPU backend: no link to be bound by
            self.logger.log("COLD_CACHE_PLAN", "cpu-backend", 0)
            return 0
        probe_cfg = FastSamplerConfig(
            spec=self.train_spec, batch_size=cfg.train_batch_size,
            base_seed=cfg.seed, num_workers=1,
            hot_cutoff=self.hot_cutoff, x_cold=self.x_cold,
            x_cold_scale=self.x_cold_scale, cold_cap=cold_cap,
            emit_gsrc=self.global_msg0, compress_dst=self.compress_dst,
            pack_wire=self.pack_wire)
        bufs = BatchBuffers(self.train_spec)
        bufs.attach_from_config(probe_cfg, V)
        self.native.sample_into(
            bufs, np.sort(np.asarray(train_idx)[: self.train_spec.seed_cap]),
            rng_seed=41, y_global=None)
        bufs.finalize_from_config(probe_cfg)
        pb = bufs.to_padded_batch()
        total = estimate_batch_bytes(pb)
        cold_bytes = (bufs.cold_rows.nbytes + bufs.cold_pos.nbytes
                      + (bufs.cold_scale.nbytes
                         if bufs.cold_scale is not None else 0))
        plan = plan_cold_cache(
            credit, cfg.assumed_chip_rate_eps,
            edges_per_batch=max(pb.num_real_edges(), 1),
            base_bytes_per_batch=max(total - cold_bytes, 0),
            cold_bytes_per_batch=cold_bytes,
            cold_tail_rows=V - self.hot_cutoff)
        self.cold_plan = plan
        self.logger.log("COLD_CACHE_PLAN", plan.slots,
                        "demand_mbs", plan.projected_demand_mbs,
                        "residual_mbs", plan.residual_demand_mbs,
                        "credit_mbs", round(plan.credit_mbs, 1),
                        plan.reason)
        return plan.slots

    def _calibrate_cold_cap(self, pool, spec=None, align: int = 128) -> int:
        spec = spec or self.train_spec
        rng = np.random.default_rng(self.cfg.seed + 13)
        worst = align
        for i in range(max(2, self.cfg.calibration_batches // 2)):
            take = min(spec.seed_cap, len(pool))
            seeds = np.sort(rng.choice(pool, take, replace=False))
            b = self.native.sample(spec, seeds, rng_seed=77 + i)
            n = int(b.level_sizes[-1])
            worst = max(worst, int((b.n_id[:n] >= self.hot_cutoff).sum()))
        cap = int(-(-int(worst * self.cfg.spec_safety) // align) * align)
        return min(cap, self._cold_cap_max)

    def _clamped_cold_growth(self, old_cap: int, pool) -> int:
        """Post-drop cold-budget growth: max(reprobe, 1.25x), hard-clamped
        at the whole cold tail (a batch's cold rows are unique frontier
        members, so more is impossible)."""
        return min(self._cold_cap_max,
                   max(self._calibrate_cold_cap(pool),
                       int(-(-int(old_cap * 1.25) // 128) * 128)))

    def _ensure_slack(self, n: int):
        """Grow the device table's cold slack region to ≥ n rows (gsrc+cold
        mode: rows [hot_cutoff, hot_cutoff+slack) hold the current batch's
        cold rows, written by :meth:`_cold_update` before each step)."""
        if n <= self._slack:
            return
        pad = n - self._slack
        self.features = jax.jit(lambda f: jnp.concatenate(
            [f, jnp.zeros((pad, f.shape[1]), f.dtype)]))(self.features)
        self._slack = n

    def _cold_update(self, batch):
        """Write this batch's cold rows into the slack region (donated —
        XLA aliases the buffer, so the write is in-place; the device
        executes programs in dispatch order, so the following step sees
        exactly its own batch's rows)."""
        if self._cold_update_fn is None:
            H = self.hot_cutoff

            def upd(f, rows, scale):
                if scale is not None:
                    from ..parallel.exchange import fp8_decode_rows

                    rows = fp8_decode_rows(rows, scale, f.dtype)
                return jax.lax.dynamic_update_slice(
                    f, rows.astype(f.dtype), (H, 0))

            self._cold_update_fn = jax.jit(upd, donate_argnums=(0,))
        self.features = self._cold_update_fn(
            self.features, batch.cold_rows, batch.cold_scale)

    def _cache_update(self, batch):
        """Cache mode: scatter this batch's MISS rows into their assigned
        slack slots (donated, in-place; pad positions self-drop), then
        strip the cold fields so the train/eval step sees ONE stable
        treedef across miss-bucket sizes (the updater recompiles per
        rung — a tiny program — the big step program never does)."""
        if self._cache_update_fn is None:
            def upd(f, rows, scale, pos):
                if scale is not None:
                    from ..parallel.exchange import fp8_decode_rows

                    rows = fp8_decode_rows(rows, scale, f.dtype)
                return f.at[pos].set(rows.astype(f.dtype), mode="drop")

            self._cache_update_fn = jax.jit(upd, donate_argnums=(0,))
        self.features = self._cache_update_fn(
            self.features, batch.cold_rows, batch.cold_scale,
            batch.cold_pos)
        return batch.replace(cold_rows=None, cold_pos=None,
                             cold_scale=None, cold_count=None)

    def _pre_step(self, batch, fold: bool = False):
        """Per-batch cold-tier device work, dispatched before the step.
        No-op for batches without cold payloads (all-HBM, warmup).
        ``fold`` (train path under cold_fold_update): the step program
        applies the cache update itself — ship the batch untouched."""
        if batch.cold_rows is None:
            return batch
        if fold:
            return batch  # the folded step applies the update itself
        if self._cold_cache is not None:
            return self._cache_update(batch)
        if self._gsrc_cold:
            self._cold_update(batch)
        return batch

    def run_step(self, batch):
        """_pre_step + train step under the right calling convention
        (cold_fold_update's folded step donates AND returns the feature
        table). The single entry point for every train-batch consumer
        (epoch loops, bench, warmup)."""
        batch = self._pre_step(batch, fold=self._fold_cold)
        if self._fold_cold:
            self.state, self.features, loss = self.train_step(
                self.state, self.features, batch)
        else:
            self.state, loss = self.train_step(
                self.state, self.features, batch)
        return loss

    def reset(self, trial_seed: int = 0):
        """Fresh params + optimizer (per-trial reset,
        driver/drivers/base.py:258-263)."""
        ex_seeds = self.graph.split_idx["train"][: self.cfg.train_batch_size]
        ex = self.native.sample(self.train_spec, ex_seeds,
                                rng_seed=7, y_global=None)
        ex = jax.device_put(ex, self.device)
        # init-only example: shapes matter, values don't — clamp explicitly
        # (with a hot/cold split, n_id can exceed the hot table's rows;
        # relying on silent index clamping here was flagged as a trap)
        ex_x = jnp.take(self.features,
                        jnp.minimum(ex.n_id, self.features.shape[0] - 1),
                        axis=0)
        self.state = create_train_state(
            self.model, ex_x, ex, self.cfg.lr,
            seed=self.cfg.seed + trial_seed)

    def train_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        if cfg.train_sampler == "OracleSampler":
            return self._train_epoch_oracle(epoch)
        self.train_sampler.set_epoch(self.shuffler.get_idx(epoch), epoch)
        if cfg.train_sampler == "FastPreSampler":
            return self._train_epoch_presampled(epoch)
        it = iter(self.train_sampler)
        feeder = DeviceFeeder(it, sharding=self.device,
                              depth=max(2, cfg.max_batches_in_flight // 2),
                              pipelined=not cfg.pipeline_disabled)
        losses = []
        # jax.profiler trace of the post-compile epoch (the NVTX/Nsight
        # analog, SURVEY.md §5.1); epoch 0 is compile-polluted
        profile = cfg.profile_dir is not None and epoch == 1
        if profile:
            jax.profiler.start_trace(cfg.profile_dir)
        self.collector.set_epoch(epoch)
        bno = 0
        with self.stats.region("train_epoch"):
            for batch in feeder:
                if self.collector.enabled and bno < 4:
                    self.collector.collect(
                        f"batch{bno}",
                        level_sizes=batch.level_sizes,
                        seed_count=batch.seed_count,
                        edge_counts=[e.count for e in batch.edges])
                bno += 1
                losses.append(self.run_step(batch))
            # drain async dispatch before closing the region
            jax.block_until_ready(self.state.params)
        if profile:
            jax.profiler.stop_trace()
        self.stats.add("feed_starved", feeder.starved_dur)
        self.stats.add("sampler_blocked", it.stats.total_blocked_dur)
        self.stats.end_epoch()
        spec = self.train_spec  # this epoch's caps (for waste accounting)
        if it.stats.dropped_nodes or it.stats.dropped_edges:
            # cap overflow truncated real data — grow the spec (next
            # epoch's pools/programs pick it up; one retrace, no rebuild)
            self.logger.log("SAMPLER_OVERFLOW", epoch,
                            it.stats.dropped_nodes, it.stats.dropped_edges)
            self.train_spec = self.train_spec.grown()
            self.train_sampler.cfg.spec = self.train_spec
            self.logger.log("SPEC_GROWN", self.train_spec.node_caps,
                            self.train_spec.edge_caps)
        if it.stats.dropped_cold:
            # over-budget cold rows zero-fill — grow the per-batch cold
            # buffer (reprobe; never shrink; min 1.25x, clamped at the
            # cold-tail size); the next epoch's buffer pool picks the new
            # cap up from the config
            scfg = self.train_sampler.cfg
            self.logger.log("WARNING_COLD_DROPPED", epoch,
                            it.stats.dropped_cold, "cold_cap",
                            scfg.cold_cap)
            scfg.cold_cap = self._clamped_cold_growth(
                scfg.cold_cap, self.graph.split_idx["train"])
            if self._cold_cache is not None:
                # drops can come from slot exhaustion too — grow the slot
                # space alongside the per-batch miss budget
                self._cold_cache.grow(
                    max(int(self._cold_cache.slots * 1.25), scfg.cold_cap))
                self._ensure_slack(self._cold_cache.slots + 1)
            elif self._gsrc_cold:
                self._ensure_slack(scfg.cold_cap)
            self.logger.log("COLD_CAP_GROWN", scfg.cold_cap)
        if self._cold_cache is not None:
            h, mi, dr = self._cold_cache.reset_epoch_stats()
            self.logger.log(
                "COLD_CACHE", epoch, "hits", h, "misses", mi,
                "dropped", dr, "slots", self._cold_cache.slots,
                "hit_rate", round(h / max(h + mi, 1), 4))
        # one batched D2H (device_get overlaps the copies; per-item float()
        # would cost a network round-trip each on remotely-attached TPUs)
        mean_loss = float(np.mean(jax.device_get(losses)))
        self.logger.log(
            "epoch", epoch, "loss", mean_loss,
            "sampler_blocked", round(it.stats.total_blocked_dur, 4),
            "pad_waste_nodes",
            round(it.stats.node_waste(spec.total_node_cap), 4),
            "pad_waste_edges",
            round(it.stats.edge_waste(sum(spec.edge_caps)), 4),
            "tight_frac",
            round(it.stats.tight_batches / max(it.stats.batches, 1), 4))
        return mean_loss

    def _train_epoch_presampled(self, epoch: int) -> float:
        """FastPreSampler path (--train_sampler FastPreSampler): the whole
        epoch is sampled up front, then streamed to the device
        (fast_trainer/samplers.py:402-423 parity)."""
        from ..sampling.sampler import FastPreSampler

        losses = []
        pre = FastPreSampler(self.train_sampler)
        with self.stats.region("train_epoch"):
            for bufs in pre.presample(epoch):
                batch = jax.device_put(
                    jax.tree_util.tree_map(np.array, bufs.to_padded_batch()),
                    self.device)
                losses.append(self.run_step(batch))
            jax.block_until_ready(self.state.params)
        self.stats.end_epoch()
        if pre.dropped_cold:
            scfg = self.train_sampler.cfg
            self.logger.log("WARNING_COLD_DROPPED", epoch,
                            pre.dropped_cold, "cold_cap", scfg.cold_cap)
            scfg.cold_cap = self._clamped_cold_growth(
                scfg.cold_cap, self.graph.split_idx["train"])
            if self._gsrc_cold:
                self._ensure_slack(scfg.cold_cap)
            self.logger.log("COLD_CAP_GROWN", scfg.cold_cap)
        mean_loss = float(np.mean(jax.device_get(losses)))
        self.logger.log("epoch", epoch, "loss", mean_loss)
        return mean_loss

    def _train_epoch_oracle(self, epoch: int) -> float:
        """OracleSampler path (--train_sampler OracleSampler): train
        through the independent pure-numpy sampler (sampling/oracle.py) —
        the cross-check role PyG NeighborSampler plays in the reference
        (`--train_sampler NeighborSampler`, driver/drivers/base.py:206-210,
        fast_trainer/train.py:136-220): a full accuracy curve from a
        second, independently-implemented sampler validates the native
        sampling + padding + step stack end-to-end, not just per-batch."""
        from ..sampling.oracle import multilayer_sample_np, pad_sample

        if self.hot_cutoff is not None:
            raise ValueError(
                "OracleSampler requires hbm_fraction=1 (it has no host "
                "cold tier); use it as the all-HBM cross-check path")
        cfg = self.cfg
        idx = self.shuffler.get_idx(epoch)
        y = np.asarray(self.graph.y, np.int32)
        spec = self.train_spec
        rng = np.random.default_rng(cfg.seed * 9176 + epoch)
        losses = []
        bs = cfg.train_batch_size
        with self.stats.region("train_epoch"):
            for s in range(0, len(idx) - bs + 1, bs):
                res = multilayer_sample_np(
                    self.graph.rowptr, self.graph.col,
                    np.sort(idx[s:s + bs]), spec.fanouts, rng,
                    node_caps=spec.node_caps, edge_caps=spec.edge_caps)
                batch = jax.device_put(pad_sample(res, spec, y),
                                       self.device)
                losses.append(self.run_step(batch))
            jax.block_until_ready(self.state.params)
        self.stats.end_epoch()
        mean_loss = float(np.mean(jax.device_get(losses)))
        self.logger.log("epoch", epoch, "loss", mean_loss,
                        "sampler", "oracle")
        return mean_loss

    def _eval_sampler(self, split: str) -> FastSampler:
        cfg = self.cfg
        fanouts = (cfg.final_test_fanouts if split == "test"
                   else cfg.batchwise_test_fanouts)
        key = (split, tuple(fanouts))
        if key not in self.eval_specs:
            out = calibrate_spec(
                self.native, self.graph.split_idx[split],
                cfg.test_batch_size, fanouts,
                cfg.calibration_batches, cfg.spec_safety, cfg.seed + 99,
                worst_case_probe=cfg.calibrate_worst_case,
                tight_quantile=(cfg.tight_quantile
                                if cfg.spec_buckets > 1 else None))
            self.eval_specs[key] = out if isinstance(out, tuple) \
                else (out, None)
        spec, tight = self.eval_specs[key]
        if self.hot_cutoff is not None:
            if key not in self.eval_cold_base:
                self.eval_cold_base[key] = self._calibrate_cold_cap(
                    self.graph.split_idx[split], spec)
            cold_cap = max(self.eval_cold_base[key],
                           self.eval_cold_floor.get(key, 0))
        else:
            cold_cap = 0
        # shuffle eval seeds (accuracy is order-independent): sorted split
        # slices would otherwise form degree/VIP-correlated batches that
        # need far larger caps than random ones
        eval_idx = self.graph.split_idx[split]
        eval_idx = eval_idx[np.random.default_rng(cfg.seed + 31)
                            .permutation(len(eval_idx))]
        return FastSampler(
            self.native.rowptr, self.native.col,
            np.asarray(self.graph.y, np.int32),
            FastSamplerConfig(
                spec=spec, batch_size=cfg.test_batch_size,
                base_seed=cfg.seed + 7, num_workers=cfg.num_workers,
                max_batches_in_flight=cfg.max_batches_in_flight,
                hot_cutoff=self.hot_cutoff, x_cold=self.x_cold,
                x_cold_scale=self.x_cold_scale,
                cold_cap=cold_cap, cold_cache=self._cold_cache,
                emit_gsrc=self.global_msg0,
                compress_dst=all(0 < f <= 127 for f in fanouts),
                pack_wire=(self.pack_wire
                           and spec.total_node_cap < 2**24),
                tight_spec=tight),
            idx=eval_idx)

    def evaluate(self, split: str) -> float:
        """Batchwise accuracy on a split (base.py:440-525 analog)."""
        sampler = self._eval_sampler(split)
        if self._cold_cache is not None:
            self._ensure_slack(self._cold_cache.slots + 1)
        elif self._gsrc_cold:
            # eval specs have larger frontiers → possibly a larger cold
            # budget than the train slack
            self._ensure_slack(sampler.cfg.cold_cap)
        # NOTE: the sampler was constructed with the *shuffled* split index;
        # re-installing the sorted split here would re-create the
        # degree/VIP-correlated batches the shuffle exists to avoid.
        it = iter(sampler)
        feeder = DeviceFeeder(it, sharding=self.device, depth=2)
        acc = []  # device scalars; ONE D2H per split (a per-batch int()
        #           read is a ~100ms network round-trip on remote TPUs)
        for batch in feeder:
            batch = self._pre_step(batch)
            acc.append(self.eval_step(self.state, self.features, batch))
        pairs = jax.device_get(acc)
        correct = sum(int(c) for c, _ in pairs)
        total = sum(int(t) for _, t in pairs)
        fanouts = (self.cfg.final_test_fanouts if split == "test"
                   else self.cfg.batchwise_test_fanouts)
        key = (split, tuple(fanouts))
        if it.stats.dropped_nodes or it.stats.dropped_edges:
            self.logger.log("EVAL_SAMPLER_OVERFLOW", split,
                            it.stats.dropped_nodes, it.stats.dropped_edges)
            # grow the cached eval spec so the NEXT evaluate() of this
            # split stops truncating (this split's reported accuracy was
            # computed on zero-filled rows — the log line flags it)
            spec, tight = self.eval_specs[key]
            self.eval_specs[key] = (spec.grown(), tight)
            # the grown spec has larger frontiers — recalibrate its cold cap
            self.eval_cold_base.pop(key, None)
            self.logger.log("EVAL_SPEC_GROWN", split)
        if it.stats.dropped_cold:
            # over-cold-budget rows zero-filled — raise this split's
            # persistent floor (the per-call probe already underestimated
            # once, so reprobing alone could recur the shortfall)
            cap = sampler.cfg.cold_cap
            self.logger.log("EVAL_COLD_DROPPED", split,
                            it.stats.dropped_cold, "cold_cap", cap)
            self.eval_cold_floor[key] = min(self._cold_cap_max, max(
                self.eval_cold_floor.get(key, 0),
                int(-(-int(cap * 1.25) // 128) * 128)))
            if self._cold_cache is not None:
                self._cold_cache.grow(
                    max(int(self._cold_cache.slots * 1.25),
                        self.eval_cold_floor[key]))
                self._ensure_slack(self._cold_cache.slots + 1)
            self.logger.log("EVAL_COLD_CAP_GROWN", split,
                            self.eval_cold_floor[key])
        return correct / max(total, 1)

    def evaluate_layerwise(self, splits=("valid", "test")):
        """Exact full-graph accuracy via layer-wise inference
        (models/inference.py; reference models.py:441-495 — gated out of
        the reference's own driver at base.py:430-432, first-class here).
        One pass computes every node's representation, so all splits score
        from the same embeddings. Requires fully HBM-resident features;
        falls back to batchwise eval otherwise (and for ARMA)."""
        from ..models.inference import layerwise_inference

        if self.hot_cutoff is not None:
            self.logger.log("LAYERWISE_NEEDS_FULL_HBM_FALLBACK")
            return {s: self.evaluate(s) for s in splits}
        try:
            emb = layerwise_inference(
                self.cfg.model_name, self.state.params, self.graph.rowptr,
                self.graph.col, self.features, self.cfg.num_layers,
                chunk=self.cfg.inference_chunk,
                dtype=jnp.dtype(self.cfg.compute_dtype),
                batch_stats=self.state.batch_stats)
        except NotImplementedError:
            self.logger.log("LAYERWISE_UNSUPPORTED_FALLBACK",
                            self.cfg.model_name)
            return {s: self.evaluate(s) for s in splits}
        pred = emb.argmax(-1).astype(jnp.int32)
        y = jnp.asarray(np.asarray(self.graph.y, np.int32))
        out = {}
        for s in splits:
            idx = jnp.asarray(self.graph.split_idx[s])
            out[s] = float((jnp.take(pred, idx) == jnp.take(y, idx)).mean())
            self.logger.log("layerwise_acc", s, out[s])
        return out

    # --- run_trial_impl hooks -----------------------------------------
    def _trial_reset(self, trial: int):
        self.reset(trial_seed=trial)

    def _device_snapshot(self, snapshot):
        """Host snapshot → arrays usable in the step (single host: as-is)."""
        return snapshot

    def run_trial(self, trial: int = 0,
                  checkpoint_dir: Optional[str] = None) -> TrialResult:
        """Epoch loop with best-validation tracking (driver/main.py:188-245)."""
        return run_trial_impl(self, trial, checkpoint_dir)


def run_trial_impl(trainer, trial: int = 0,
                   checkpoint_dir: Optional[str] = None) -> TrialResult:
    """THE trial loop (driver/main.py:188-245), shared by the single-host
    Trainer and the DistributedTrainer: epochs, periodic validation,
    best-snapshot tracking, collective checkpointing, RESUME=1 restart
    with cross-host min-epoch agreement, and the final test scored by
    ``final_test_mode``. One implementation — the round-2 review flagged
    the duplicated distributed copy in driver.py as drift-prone.

    ``trainer`` provides: cfg, logger, state, train_epoch(e) → float loss
    or metrics dict with "loss", evaluate(split), evaluate_layerwise(),
    _trial_reset(trial), _device_snapshot(host_snapshot).
    """
    import os

    from . import checkpoint as ckpt
    from .state import ReduceLROnPlateau

    cfg = trainer.cfg
    trainer._trial_reset(trial)
    res = TrialResult()
    best_state = None
    scheduler = (ReduceLROnPlateau(cfg.lrs_factor, cfg.effective_patience)
                 if cfg.use_lrs else None)
    start_epoch = 0
    if checkpoint_dir and os.environ.get("RESUME", "0") == "1":
        resume = ckpt.latest_epoch(checkpoint_dir, trial)
        if jax.process_count() > 1:
            # hosts must agree on the resume point, or they run different
            # numbers of collective programs and desync; min(): resume
            # only to an epoch EVERY host has
            from jax.experimental import multihost_utils

            local = -1 if resume is None else resume
            agreed = int(multihost_utils.process_allgather(
                np.asarray([local], np.int32)).min())
            if agreed != local:
                trainer.logger.log("resume_mismatch", trial, local, agreed)
            resume = agreed if agreed >= 0 else None
        if resume is not None:
            trainer.state = ckpt.restore(checkpoint_dir, trainer.state,
                                         trial, resume)
            start_epoch = resume + 1
            trainer.logger.log("resumed", trial, resume)
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        m = trainer.train_epoch(epoch)
        loss = m["loss"] if isinstance(m, dict) else m
        dt = time.perf_counter() - t0
        trainer.logger.log("epoch_time", trial, epoch, round(dt, 3))
        res.epoch_times.append(dt)
        res.losses.append(loss)
        if scheduler is not None:
            trainer.state = scheduler.step(trainer.state, loss)
        if (epoch + 1) % cfg.test_epoch_frequency == 0:
            acc = trainer.evaluate("valid")
            trainer.logger.log("valid_acc", trial, epoch, acc)
            if acc > res.best_valid_acc:
                res.best_valid_acc = acc
                res.best_epoch = epoch
                # replicated arrays are process-locally readable: snapshot
                # on EVERY process for the in-memory best-model restore
                best_state = jax.tree_util.tree_map(
                    np.asarray,
                    (trainer.state.params, trainer.state.batch_stats))
                if checkpoint_dir:
                    # Orbax save is a COLLECTIVE in a multi-controller
                    # runtime — every process must enter it; only process
                    # 0 appends the metadata line (shared-fs guard)
                    ckpt.save(checkpoint_dir, trainer.state,
                              trial=trial, epoch=epoch,
                              acc=(acc if jax.process_index() == 0
                                   else None),
                              use_async=cfg.async_checkpoint)
    if cfg.async_checkpoint:
        ckpt.wait_for_async_saves()
    if best_state is not None:
        # score the best-validation model, not the last epoch
        # (driver/main.py:220-235 reloads the best checkpoint)
        params, batch_stats = trainer._device_snapshot(best_state)
        trainer.state = trainer.state.replace(params=params,
                                              batch_stats=batch_stats)
    # final_test_mode is validated at config construction (fail-fast)
    if cfg.final_test_mode == "layerwise":
        accs = trainer.evaluate_layerwise(("valid", "test"))
        res.final_valid_acc = accs["valid"]
        res.final_test_acc = accs["test"]
    else:
        res.final_valid_acc = trainer.evaluate("valid")
        res.final_test_acc = trainer.evaluate("test")
    trainer.logger.log("trial_result", trial, res.best_epoch,
                       res.final_valid_acc, res.final_test_acc)
    return res
