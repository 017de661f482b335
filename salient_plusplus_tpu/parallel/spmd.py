"""SPMD train/eval steps over a device mesh.

Replaces the reference's DDP + NCCL layer (driver/drivers/ddp.py): one
shard_map-ped jitted program per global step containing microbatch forward/
backward, the partitioned-feature all_to_all exchange (exchange.py), and the
gradient pmean (DDP all-reduce analog, ddp.py:349-351). Every device runs
the same number of steps in the same order by construction — the invariant
the reference enforces with N9/N10 machinery.

Feature modes:
  - "replicated": features fully replicated in every device's HBM; feature
    lookup is a local gather (fits small/medium graphs).
  - "partitioned": features row-sharded by contiguous vertex ranges over the
    mesh (the DisjointPartFeatReorderedDataset layout); lookup runs the
    request/response all_to_all with optional per-device VIP cache.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling.batch import PaddedBatch
from ..train.state import TrainState
from ..train.step import decode_batch, gather_features, masked_nll
from ..ops.segment import valid_mask
from .exchange import DeviceCache, assemble_features
from .mesh import DATA_AXIS


def stack_batches(batches) -> PaddedBatch:
    """Stack per-device PaddedBatches along a new leading device axis
    (shard this axis over the mesh's data axis)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def _unstack(batch: PaddedBatch) -> PaddedBatch:
    """Inside shard_map each device sees leading dim 1 — drop it."""
    return jax.tree_util.tree_map(lambda x: x[0], batch)


def _lookup_features(features, batch: PaddedBatch, feature_mode: str,
                     part_offsets, r_cap: int, cache: Optional[DeviceCache],
                     axis_name: str, hot_size: Optional[int] = None,
                     wire_fp8: bool = False):
    if feature_mode == "replicated":
        # single-host helper: CLAMPED take (bare jnp.take NaN-fills OOB
        # ids) + the sorted MXU cold overlay when a cold tier rides along
        return gather_features(features, batch), None
    frontier_count = batch.level_sizes[-1]
    with jax.named_scope("feature_exchange"):
        x, stats = assemble_features(
            features, batch.n_id, frontier_count, part_offsets,
            axis_name, r_cap, cache, hot_size=hot_size, wire_fp8=wire_fp8)
    if batch.cold_rows is not None:
        # host-RAM tier overlay: cold frontier rows gathered by the
        # sampler thread or served by the owner's pre-step all_to_all
        # (owner-mode cold_pos is NOT sorted — per-owner slot layout —
        # so this stays a scatter, not the sorted MXU placement);
        # padded slots point past the frontier → dropped
        rows = batch.cold_rows
        if batch.cold_scale is not None:
            from .exchange import fp8_decode_rows

            rows = fp8_decode_rows(rows, batch.cold_scale, x.dtype)
        x = x.at[batch.cold_pos].set(rows.astype(x.dtype), mode="drop")
    return x, stats


def make_spmd_train_step(mesh: Mesh, feature_mode: str = "replicated",
                         r_cap: int = 1024, with_cache: bool = False,
                         axis_name: str = DATA_AXIS,
                         donate_state: bool = True,
                         hot_size: Optional[int] = None,
                         wire_fp8: bool = False):
    """Returns jitted ``step(state, features, batch, part_offsets, cache)``.

    features: replicated [V, F] or row-sharded [world·V_pad, F].
    batch: stacked PaddedBatch (leading device axis, sharded over data).
    cache: stacked DeviceCache (leading device axis) or None.
    Returns (state, loss, exchange_stats|None); state/loss replicated.
    """
    feat_spec = P() if feature_mode == "replicated" else P(axis_name)
    cache_spec = P(axis_name)

    def step(state: TrainState, features, batch, part_offsets, cache):
        b = decode_batch(_unstack(batch))
        dev_cache = (DeviceCache(cache.vertices[0], cache.features[0])
                     if cache is not None else None)
        key = jax.random.fold_in(state.dropout_key, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

        def loss_fn(params):
            x, ex_stats = _lookup_features(
                features, b, feature_mode, part_offsets, r_cap, dev_cache,
                axis_name, hot_size, wire_fp8)
            vars_in = {"params": params, "batch_stats": state.batch_stats}
            out, updates = state.apply_fn(
                vars_in, x, b, training=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            loss = masked_nll(out, b.y, b.seed_count)
            return loss, (updates.get("batch_stats", state.batch_stats),
                          ex_stats)

        (loss, (new_stats, ex_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        new_stats = jax.lax.pmean(new_stats, axis_name)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        if ex_stats is not None:
            ex_stats = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, axis_name), ex_stats)
        return state, loss, ex_stats

    in_specs = (P(), feat_spec, P(axis_name), P(),
                cache_spec if with_cache else P())
    out_specs = (P(), P(), P())  # ex_stats is None (empty) when replicated
    smapped = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,) if donate_state else ())


def make_spmd_eval_step(mesh: Mesh, feature_mode: str = "replicated",
                        r_cap: int = 1024, with_cache: bool = False,
                        axis_name: str = DATA_AXIS,
                        hot_size: Optional[int] = None,
                        wire_fp8: bool = False):
    """Jitted eval step: psum'd (correct, total, exchange_overflow) across
    the mesh (driver/drivers/base.py:517-523 all_reduce analog). The
    overflow count surfaces request-budget (r_cap) shortfalls — overflowed
    remote rows zero-fill, so an accuracy computed with overflow > 0 ran
    on corrupted features and the caller must recalibrate (the train path
    self-corrects the same way)."""
    feat_spec = P() if feature_mode == "replicated" else P(axis_name)
    cache_spec = P(axis_name)

    def step(state: TrainState, features, batch, part_offsets, cache):
        b = decode_batch(_unstack(batch))
        dev_cache = (DeviceCache(cache.vertices[0], cache.features[0])
                     if cache is not None else None)
        x, ex_stats = _lookup_features(features, b, feature_mode,
                                       part_offsets, r_cap, dev_cache,
                                       axis_name, hot_size, wire_fp8)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, b, training=False)
        pred = out.argmax(-1).astype(jnp.int32)
        mask = valid_mask(out.shape[0], b.seed_count)
        correct = jnp.where(mask, pred == b.y, False).sum()
        total = b.seed_count.astype(jnp.int32)
        overflow = (ex_stats.num_overflow if ex_stats is not None
                    else jnp.int32(0))
        return (jax.lax.psum(correct, axis_name),
                jax.lax.psum(total, axis_name),
                jax.lax.psum(overflow, axis_name))

    in_specs = (P(), feat_spec, P(axis_name), P(),
                cache_spec if with_cache else P())
    smapped = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                            out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(smapped)


def shard_features_by_partition(x_shards, mesh: Mesh,
                                axis_name: str = DATA_AXIS
                                ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Pad per-partition feature shards to equal row counts and lay them out
    row-sharded over the mesh. Returns (global array [world·V_pad, F],
    padded part_offsets [world+1] for the *padded* id space).

    NOTE: callers must relabel graph ids into the padded id space
    (data/reorder.py does this); with contiguous-range partitioning the
    relabel is just adding the per-partition pad shift.
    """
    world = len(x_shards)
    v_pad = max(s.shape[0] for s in x_shards)
    f = x_shards[0].shape[1]
    dtype = x_shards[0].dtype
    padded = np.zeros((world * v_pad, f), dtype)
    for i, s in enumerate(x_shards):
        padded[i * v_pad:i * v_pad + s.shape[0]] = s
    part_offsets = np.arange(world + 1, dtype=np.int32) * v_pad
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(padded, sharding), part_offsets
