"""On-device distributed feature assembly (partitioned features).

The heart of the SALIENT++ capability set, re-architected for XLA. The
reference assembles distributed batches on the host (fast_sampler.cpp:
1017-1273: split frontier by owner, cache-hit separation, inverse
permutation ``perm_partition_to_mfg``) and runs three dynamic NCCL
all_to_alls (counts → ids → rows) across a 10-stage stream pipeline
(fast_trainer/transferers.py). Here the whole assembly is pure tensor code
inside the jitted shard_map step:

  1. owner[i]   = searchsorted(part_offsets, n_id[i])    (RangePartitionBook)
  2. class[i]   ∈ {local, cached, remote}                (cache = sorted ids)
  3. remote ids are packed per-owner into a static [world, R_cap] request
     matrix via one argsort (the meta/counts all_to_all of the reference
     disappears — shapes are static)
  4. one lax.all_to_all of ids, local gather for each requester, one
     lax.all_to_all of rows
  5. responses scatter back to frontier order through the inverse of the
     packing permutation (perm_partition_to_mfg equivalent); local rows and
     cache hits gather directly from HBM.

Per-destination overflow beyond R_cap is counted and those rows fall back
to zeros (observable via stats; calibrate R_cap like batch caps).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DeviceCache(NamedTuple):
    """Per-device VIP cache: sorted remote vertex ids + their feature rows
    (the reference's Cache, range_partition_book.cpp:116-195 — membership
    via binary search instead of a 200M-entry flat array)."""

    vertices: jnp.ndarray   # int32 [C] sorted global ids (padded with -1 desc? no: use INT32_MAX)
    features: jnp.ndarray   # [C, F]


class ExchangeStats(NamedTuple):
    num_local: jnp.ndarray
    num_cached: jnp.ndarray
    num_remote: jnp.ndarray
    num_overflow: jnp.ndarray
    sent_bytes: jnp.ndarray  # feature payload sent by this device


def sorted_isin(sorted_ref: jnp.ndarray, ids: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(membership mask, position) of ids in a sorted reference array."""
    pos = jnp.searchsorted(sorted_ref, ids)
    pos = jnp.clip(pos, 0, sorted_ref.shape[0] - 1)
    hit = sorted_ref[pos] == ids
    return hit, pos


_FP8_MAX = 448.0  # float8_e4m3fn largest finite


def wire_row_bytes(num_features: int, dtype, wire_fp8: bool) -> int:
    """Bytes per feature row on the response wire (used by the trainer's
    true-payload WIRE_BYTES metric). fp8 mode ships 1 byte/element plus a
    float32 per-row amax for the dequant scale."""
    if wire_fp8:
        return num_features + 4
    return num_features * jnp.dtype(dtype).itemsize


def fp8_encode_rows_np(x: "np.ndarray"):
    """Host-side one-time fp8 (e4m3) row encoding for the cold tier:
    returns (uint8 payload [N, F], float32 dequant scale [N]). Same
    per-row dynamic-range scheme as the device wire (halves the dominant
    >HBM H2D payload vs bf16 at ≤2^-3 relative error); decode with
    :func:`fp8_decode_rows`."""
    import ml_dtypes
    import numpy as np

    xf = np.asarray(x, np.float32)
    amax = np.abs(xf).max(axis=1)
    # masked divide (np.where would still EVALUATE _FP8_MAX/0 and warn)
    q_scale = np.ones_like(amax, np.float32)
    np.divide(_FP8_MAX, amax, out=q_scale, where=amax > 0)
    payload = (xf * q_scale[:, None]).astype(ml_dtypes.float8_e4m3fn)
    return payload.view(np.uint8), (amax / _FP8_MAX).astype(np.float32)


def fp8_decode_rows(rows_u8: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Device-side decode of :func:`fp8_encode_rows_np` payloads."""
    rows = jax.lax.bitcast_convert_type(rows_u8, jnp.float8_e4m3fn)
    return (rows.astype(jnp.float32) * scale[:, None]).astype(dtype)


def _fp8_wire_exchange(served: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Row all_to_all with per-row dynamic-range fp8 (e4m3) compression.

    Halves the dominant distributed payload vs bf16 (the reference ships
    fp16 rows, transferers.py:507-531; bf16 is this framework's native
    wire). Each row is scaled so its amax maps to the e4m3 max (448), cast
    to fp8 for the collective, and rescaled on the receiver — worst-case
    relative error 2^-3 per element (3 mantissa bits), zero rows exact.
    The fp8 payload crosses the wire bitcast to uint8 so the collective
    never depends on backend fp8 support.
    """
    w, r, f = served.shape
    amax = jnp.max(jnp.abs(served.astype(jnp.float32)), axis=-1,
                   keepdims=True)                          # [w, r, 1] f32
    scale = jnp.where(amax > 0, _FP8_MAX / amax, 1.0)
    rows8 = (served.astype(jnp.float32) * scale).astype(jnp.float8_e4m3fn)
    # one fused collective: [w, r, F] fp8 rows + the 4 amax bytes per row
    # (exactly the F+4 bytes/row wire_row_bytes accounts for)
    wire = jnp.concatenate(
        [jax.lax.bitcast_convert_type(rows8, jnp.uint8),
         jax.lax.bitcast_convert_type(amax, jnp.uint8).reshape(w, r, 4)],
        axis=-1)
    wire = jax.lax.all_to_all(wire, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    rows = jax.lax.bitcast_convert_type(wire[..., :f], jnp.float8_e4m3fn)
    amax = jax.lax.bitcast_convert_type(
        wire[..., f:].reshape(w, r, 1, 4), jnp.float32)  # -> [w, r, 1]
    return (rows.astype(jnp.float32) * (amax / _FP8_MAX)
            ).astype(served.dtype)


def assemble_features(
    local_shard: jnp.ndarray,     # [V_local_pad, F] this device's rows
    n_id: jnp.ndarray,            # int32 [N_cap] global frontier ids
    frontier_count,               # scalar — actual frontier size
    part_offsets: jnp.ndarray,    # int32/int64 [world+1]
    axis_name: str,
    r_cap: int,                   # static per-destination request budget
    cache: Optional[DeviceCache] = None,
    hot_size: Optional[int] = None,  # per-partition HBM-resident prefix
    wire_fp8: bool = False,       # e4m3 row compression on the wire
) -> Tuple[jnp.ndarray, ExchangeStats]:
    """``hot_size``: with the distributed host-RAM tier, each device's
    shard holds only the first hot_size rows of its partition; frontier
    rows past a partition's hot prefix are *cold* — excluded from the
    exchange entirely (zeros here) and overlaid by the caller from the
    cold payload: either host-gathered rows shipped with the batch
    (replicated-tail mode) or the owner-served pre-step cold all_to_all
    (train/dist_loop.py), the analog of the reference's CPU-tier slicing
    (fast_sampler.cpp:716-776)."""
    N_cap = n_id.shape[0]
    F = local_shard.shape[1]
    world = part_offsets.shape[0] - 1
    my = jax.lax.axis_index(axis_name)
    my_off = part_offsets[my]

    idx = jax.lax.broadcasted_iota(jnp.int32, (N_cap,), 0)
    valid = idx < frontier_count
    owner = jnp.searchsorted(part_offsets[1:], n_id, side="right"
                             ).astype(jnp.int32)
    if hot_size is not None:
        local_off = (n_id.astype(part_offsets.dtype)
                     - jnp.take(part_offsets, owner)).astype(jnp.int32)
        is_cold = valid & (local_off >= hot_size)
        valid = valid & ~is_cold
    is_local = (owner == my) & valid
    if cache is not None:
        hit, cache_pos = sorted_isin(cache.vertices, n_id)
        is_cached = hit & valid & ~is_local
    else:
        is_cached = jnp.zeros_like(valid)
        cache_pos = jnp.zeros_like(idx)
    is_remote = valid & ~is_local & ~is_cached

    # ---- pack remote ids per destination (one argsort) ----
    dest = jnp.where(is_remote, owner, world)          # non-remote sorts last
    # the composite key must fit int32 — enforce, don't assume (a wrapped
    # key would silently group requests under wrong destinations)
    assert world * (N_cap + 1) + N_cap < 2**31, (
        f"sort key overflow: world={world} x N_cap={N_cap} needs an "
        "int64 or two-key argsort")
    sort_key = dest * (N_cap + 1) + idx
    order = jnp.argsort(sort_key)                       # stable by construction
    dest_sorted = dest[order]
    counts = jax.ops.segment_sum(jnp.ones_like(dest), dest,
                                 num_segments=world + 1)[:world]
    start = jnp.concatenate([jnp.zeros(1, counts.dtype),
                             jnp.cumsum(counts)[:-1]])
    pos_sorted = idx - jnp.take(start, jnp.minimum(dest_sorted, world - 1))
    # slot in the flat [world*R_cap] request buffer for each sorted entry
    in_bounds = (dest_sorted < world) & (pos_sorted < r_cap)
    flat_slot_sorted = jnp.where(
        in_bounds, dest_sorted * r_cap + pos_sorted, world * r_cap)
    req_flat = jnp.full(world * r_cap + 1, -1, jnp.int32)
    req_flat = req_flat.at[flat_slot_sorted].set(
        jnp.where(in_bounds, n_id[order].astype(jnp.int32), -1))
    req = req_flat[:-1].reshape(world, r_cap)
    # inverse mapping: frontier slot -> flat response index
    resp_slot = jnp.full(N_cap, world * r_cap, jnp.int32)
    resp_slot = resp_slot.at[order].set(flat_slot_sorted)
    num_overflow = (is_remote.sum()
                    - (in_bounds & (dest_sorted < world)).sum())

    # ---- id exchange ----
    req_recv = jax.lax.all_to_all(req, axis_name, split_axis=0,
                                  concat_axis=0, tiled=True)
    # ---- serve: gather my local rows for each requester ----
    lrows = (req_recv.astype(part_offsets.dtype) - my_off).astype(jnp.int32)
    serve_valid = req_recv >= 0
    lrows = jnp.clip(lrows, 0, local_shard.shape[0] - 1)
    served = jnp.take(local_shard, lrows.reshape(-1), axis=0)
    served = jnp.where(serve_valid.reshape(-1)[:, None], served, 0)
    served = served.reshape(world, r_cap, F)
    # ---- row exchange back ----
    if wire_fp8:
        resp = _fp8_wire_exchange(served, axis_name)
    else:
        resp = jax.lax.all_to_all(served, axis_name, split_axis=0,
                                  concat_axis=0, tiled=True)
    resp_flat = jnp.concatenate(
        [resp.reshape(world * r_cap, F),
         jnp.zeros((1, F), local_shard.dtype)], axis=0)

    # ---- final frontier assembly ----
    local_rows = jnp.clip((n_id.astype(part_offsets.dtype) - my_off
                           ).astype(jnp.int32), 0, local_shard.shape[0] - 1)
    x_local = jnp.take(local_shard, local_rows, axis=0)
    x_remote = jnp.take(resp_flat, resp_slot, axis=0)
    x = jnp.where(is_local[:, None], x_local, x_remote)
    if cache is not None:
        x_cache = jnp.take(cache.features, cache_pos, axis=0)
        x = jnp.where(is_cached[:, None], x_cache, x)
    x = jnp.where(valid[:, None], x, 0)

    bytes_per_row = wire_row_bytes(F, local_shard.dtype, wire_fp8)
    stats = ExchangeStats(
        num_local=is_local.sum(),
        num_cached=is_cached.sum(),
        num_remote=is_remote.sum(),
        num_overflow=num_overflow,
        # float32: rows*bytes_per_row wraps int32 at ~5e5 rows of 4 KB,
        # and the caller psums this across the mesh (int64 is unavailable
        # without x64 mode); float32's ~2^-24 relative error is nothing
        # for a byte counter
        sent_bytes=serve_valid.sum().astype(jnp.float32) * bytes_per_row,
    )
    return x, stats
