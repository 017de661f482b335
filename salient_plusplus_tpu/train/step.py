"""Jitted train/eval step builders (single-device and SPMD variants).

The reference's barebones_train_core (fast_trainer/train.py:15-71: forward →
nll_loss → backward → Adam step) becomes one fused XLA program that also
contains the feature gather — the reference's separate CPU slicing + H2D
stage (fast_sampler.cpp:238-308) is a device gather here, fused and
overlapped by XLA.

Masked-loss convention: model output is [seed_cap, C] log-probs; only rows
< seed_count are real. Loss = mean NLL over real rows (matches
F.nll_loss(out, y) on dynamic batches).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.segment import valid_mask
from ..sampling.batch import PaddedBatch
from .state import TrainState


def gather_features(features: jnp.ndarray, batch: PaddedBatch) -> jnp.ndarray:
    """HBM gather with optional host-tier overlay.

    All-HBM path: x = features[n_id]. Hot/cold split (gpu_percent analog):
    ``features`` holds only the hot prefix; cold frontier rows arrive in the
    batch (gathered by the sampler thread) and are scattered over the
    clipped gather. Padded cold slots point past the frontier and are
    dropped by the scatter.
    """
    idx = jnp.minimum(batch.n_id, features.shape[0] - 1)
    x = jnp.take(features, idx, axis=0)
    if batch.cold_rows is not None:
        from ..ops.mxu_segment import _INTERPRET, _sorted_degrees
        from ..ops.mxu_segment import mxu_spmm_enabled, sorted_segment_sum_mxu

        if batch.cold_scale is not None:
            from ..parallel.exchange import fp8_decode_rows

            batch = batch.replace(
                cold_rows=fp8_decode_rows(batch.cold_rows,
                                          batch.cold_scale, x.dtype),
                cold_scale=None)
        if mxu_spmm_enabled():
            # single-host cold_pos is ASCENDING (fill_cold scans the
            # frontier in order), so the overlay is a sorted placement:
            # one MXU-kernel call writes the rows and a searchsorted-diff
            # builds the presence mask — no per-row scatter (~12ns/row on
            # TPU) remains in the step
            placed = sorted_segment_sum_mxu(
                batch.cold_rows.astype(x.dtype), batch.cold_pos,
                x.shape[0], interpret=_INTERPRET)
            mask = _sorted_degrees(batch.cold_pos, x.shape[0]) > 0
            x = jnp.where(mask[:, None], placed.astype(x.dtype), x)
        else:
            x = x.at[batch.cold_pos].set(batch.cold_rows.astype(x.dtype),
                                         mode="drop")
    return x


def decode_batch(batch: PaddedBatch) -> PaddedBatch:
    """Materialize wire-compressed edge fields (EdgeBlock.ddeg → dst,
    packed uint16/uint8 index halves → int32) once per step; downstream
    code sees plain int32 sorted COO."""
    batch = batch.decoded_n_id()
    if all(e.ddeg is None and e.src_lo is None for e in batch.edges):
        return batch
    return batch.replace(edges=tuple(
        e.decoded(e.cap) for e in batch.edges))


def _x_and_extra(features, batch: PaddedBatch, global_msg0: bool):
    """Frontier features + model kwargs for one step.

    With global_msg0 (single-host path, batch carries gsrc), layer 0
    aggregates straight from the HBM table, so only the level-(L-1)
    prefix of the frontier is gathered — the level-L tail (~70% of the
    frontier at [15,10,5]) is never materialized. With a hot/cold split
    the trainer has already written this batch's cold rows into the
    table's slack region (Trainer._cold_update) and the sampler remapped
    cold ids to slack slots, so the SAME single-gather path serves both
    the prefix and the layer-0 messages — no overlay scatter at all."""
    if global_msg0 and batch.gsrc is not None:
        L = batch.spec.num_hops
        pref_cap = batch.spec.node_caps[L - 1]  # n_id already prefix-only
        idx = jnp.minimum(batch.n_id[:pref_cap], features.shape[0] - 1)
        return jnp.take(features, idx, axis=0), {"features": features}
    return gather_features(features, batch), {}


def masked_nll(logp: jnp.ndarray, y: jnp.ndarray, seed_count) -> jnp.ndarray:
    cap = logp.shape[0]
    mask = valid_mask(cap, seed_count).astype(jnp.float32)
    nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return (nll * mask).sum() / jnp.maximum(seed_count.astype(jnp.float32), 1)


def make_train_step(pmean_axis: Optional[str] = None,
                    global_msg0: bool = False,
                    fold_cold: bool = False,
                    fold_slack_at: Optional[int] = None):
    """Build the jitted train step.

    With ``pmean_axis`` set the step is shard_map/pmap-ready: grads and loss
    are averaged over that axis (the DDP all-reduce analog,
    driver/drivers/ddp.py:349-351).

    ``fold_cold`` (cold_fold_update, PERF_NOTES r4 finding 5): the cold
    tier's slack-region update runs INSIDE this program — the feature
    table is donated and returned alongside the state, killing the
    separate per-batch updater dispatch (and, in cache mode, its rung
    treedef split). Cache mode (``fold_slack_at`` None) scatters miss
    rows to their assigned slots; plain-cold gsrc mode writes the
    batch's cold buffer contiguously at ``fold_slack_at`` (hot_cutoff) —
    the folded form of Trainer._cold_update. Callers must use the
    (state, features, loss) convention (Trainer.run_step).
    """

    def train_step(state: TrainState, features: jnp.ndarray,
                   batch: PaddedBatch):
        batch = decode_batch(batch)
        if fold_cold:
            rows = batch.cold_rows
            if batch.cold_scale is not None:
                from ..parallel.exchange import fp8_decode_rows

                rows = fp8_decode_rows(rows, batch.cold_scale,
                                       features.dtype)
            rows = rows.astype(features.dtype)
            # in-place either way: features is donated
            if fold_slack_at is not None:
                features = jax.lax.dynamic_update_slice(
                    features, rows, (fold_slack_at, 0))
            else:
                # miss rows land in their assigned slack slots; pad
                # positions (2^30) self-drop
                features = features.at[batch.cold_pos].set(
                    rows, mode="drop")
            batch = batch.replace(cold_rows=None, cold_pos=None,
                                  cold_scale=None, cold_count=None)
        key = jax.random.fold_in(state.dropout_key, state.step)
        if pmean_axis is not None:
            # independent dropout per data-parallel replica (state is
            # replicated, batches differ — without this fold every rank
            # draws the SAME mask; DDP parity: per-rank torch RNG)
            key = jax.random.fold_in(key, jax.lax.axis_index(pmean_axis))

        def loss_fn(params):
            with jax.named_scope("feature_gather"):
                x, extra = _x_and_extra(features, batch, global_msg0)
            vars_in = {"params": params, "batch_stats": state.batch_stats}
            with jax.named_scope("model_forward"):
                out, updates = state.apply_fn(
                    vars_in, x, batch, training=True,
                    rngs={"dropout": key}, mutable=["batch_stats"],
                    **extra)
            loss = masked_nll(out, batch.y, batch.seed_count)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            new_stats = jax.lax.pmean(new_stats, pmean_axis)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        if fold_cold:
            return state, features, loss
        return state, loss

    if pmean_axis is None:
        if fold_cold:
            return jax.jit(train_step, donate_argnums=(0, 1))
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step  # caller wraps in shard_map/pjit


def make_eval_step(psum_axis: Optional[str] = None,
                   global_msg0: bool = False):
    """Batchwise eval: (correct, total) over seed rows — the reference's
    batchwise_test core (fast_trainer/test.py:8-33), cross-rank reduction
    included when ``psum_axis`` is given (driver/drivers/base.py:517-523)."""

    def eval_step(state: TrainState, features: jnp.ndarray,
                  batch: PaddedBatch):
        batch = decode_batch(batch)
        x, extra = _x_and_extra(features, batch, global_msg0)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, batch, training=False, **extra)
        pred = out.argmax(-1).astype(jnp.int32)
        mask = valid_mask(out.shape[0], batch.seed_count)
        correct = jnp.where(mask, pred == batch.y, False).sum()
        total = batch.seed_count.astype(jnp.int32)
        if psum_axis is not None:
            correct = jax.lax.psum(correct, psum_axis)
            total = jax.lax.psum(total, psum_axis)
        return correct, total

    if psum_axis is None:
        return jax.jit(eval_step)
    return eval_step
