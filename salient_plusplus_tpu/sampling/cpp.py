"""ctypes bindings to the native sampler (native/sampler.cpp).

One `NativeSampler` per graph; thread-safe via per-thread workspaces
(ctypes releases the GIL during the foreign call, so Python worker threads
sample in true parallel — replacing the reference's in-C++ thread pool,
fast_sampler.cpp:368-513).
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ..native.build import lib_path
from .batch import BatchSpec, EdgeBlock, PaddedBatch

_c_i32p = ctypes.POINTER(ctypes.c_int32)
_c_i64p = ctypes.POINTER(ctypes.c_int64)


def _load_lib():
    lib = ctypes.CDLL(lib_path())
    lib.sptpu_ws_create.restype = ctypes.c_void_p
    lib.sptpu_ws_create.argtypes = [ctypes.c_int64]
    lib.sptpu_ws_destroy.argtypes = [ctypes.c_void_p]
    lib.sptpu_sample_batch.restype = ctypes.c_int32
    lib.sptpu_sample_batch.argtypes = [
        ctypes.c_void_p, _c_i64p, _c_i32p, ctypes.c_int64, _c_i64p,
        ctypes.c_int32,
        _c_i32p, ctypes.c_int32, ctypes.c_uint64, _c_i32p, _c_i64p, _c_i32p,
        _c_i32p, _c_i32p, _c_i32p, _c_i32p, _c_i32p, _c_i32p,
    ]
    lib.sptpu_partition.argtypes = [
        _c_i64p, _c_i32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_uint64, ctypes.c_int32,
        _c_i32p,
    ]
    lib.sptpu_count_dst.argtypes = [
        _c_i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sptpu_take_i32_inplace.argtypes = [_c_i32p, _c_i32p, ctypes.c_int64]
    lib.sptpu_mirror_by_src.argtypes = [
        _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _c_i32p, _c_i32p, _c_i32p,
    ]
    lib.sptpu_gather_rows.argtypes = [
        ctypes.c_void_p, _c_i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.sptpu_gather_rows_i32.argtypes = [
        ctypes.c_void_p, _c_i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    return lib


_LIB = None
_LIB_LOCK = threading.Lock()


def get_lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            _LIB = _load_lib()
        return _LIB


def _ptr(a: np.ndarray, ty):
    return a.ctypes.data_as(ty)


def pack_src_maxval(spec: BatchSpec, emit_gsrc: bool,
                    num_nodes: int) -> tuple:
    """Per-hop EXCLUSIVE bound of edge-src values (attach_pack): the
    grown-frontier cap, or num_nodes for the gsrc (global-id) hop."""
    L = spec.num_hops
    return tuple(
        num_nodes if (emit_gsrc and h == L - 1) else spec.node_caps[h + 1]
        for h in range(L))


class BatchBuffers:
    """Preallocated padded output buffers for one in-flight batch."""

    def __init__(self, spec: BatchSpec):
        self.spec = spec
        L = spec.num_hops
        self.mirror_hops = L if spec.mirror_all else L - 1
        self.n_id = np.zeros(spec.total_node_cap, np.int32)
        self.level_sizes = np.zeros(L + 1, np.int32)
        total_e = sum(spec.edge_caps)
        self.edge_src = np.zeros(total_e, np.int32)
        self.edge_dst = np.zeros(total_e, np.int32)
        self.edge_counts = np.zeros(L, np.int32)
        self.edge_offsets = np.zeros(L + 1, np.int64)
        np.cumsum(np.asarray(spec.edge_caps, np.int64), out=self.edge_offsets[1:])
        self.overflow = np.zeros(2, np.int32)
        # src-sorted mirrors for hops 0..L-2 (backward aggregation runs the
        # transposed-CSR MXU kernel; the last hop feeds model layer 0 whose
        # raw-feature input carries no gradient, so it needs no mirror) —
        # or for ALL hops when spec.mirror_all (GAT/GCN/ARMA layer-0
        # gradients flow through a projection of the input)
        mh = self.mirror_hops
        self.mirror_src = np.zeros(self.edge_offsets[mh], np.int32) \
            if mh > 0 else np.zeros(0, np.int32)
        self.mirror_dst = np.zeros_like(self.mirror_src)
        self.y = np.zeros(spec.seed_cap, np.int32)
        self.seed_count = np.int32(0)
        # host-tier (cold) feature buffers; attached only when a hot/cold
        # split is configured
        self.cold_rows = None
        self.cold_pos = None
        self.cold_req = None
        self.cold_scale = None
        self.cold_count = np.int32(0)
        self.gsrc = None
        self.ddeg = None
        self.ddeg_offsets = None
        self.src_lo = None
        self.src_hi = None
        self.n_id_lo = None
        self.n_id_hi = None
        self.msrc_lo = None
        self.msrc_hi = None
        self.mdst_lo = None
        self.mdst_hi = None
        # tight bucket this batch fits (set per batch by the sampler
        # worker; consumed by to_padded_batch callers)
        self.bucket: BatchSpec | None = None

    def attach_ddeg(self):
        """Wire-compress dst: ship per-target uint8 degrees instead of the
        int32 sorted dst arrays (~45% of batch H2D at [15,10,5]); the
        device reconstructs dst with one searchsorted (EdgeBlock.decoded).
        Requires every fanout in (0, 127]."""
        spec = self.spec
        assert all(0 < f <= 127 for f in spec.fanouts), spec.fanouts
        self.ddeg_offsets = np.zeros(spec.num_hops + 1, np.int64)
        np.cumsum(np.asarray(spec.node_caps[:-1], np.int64),
                  out=self.ddeg_offsets[1:])
        self.ddeg = np.zeros(self.ddeg_offsets[-1], np.uint8)

    def fill_ddeg(self):
        lib = get_lib()
        off_e = self.edge_offsets
        for h in range(self.spec.num_hops):
            T = int(self.spec.node_caps[h])
            o = int(self.ddeg_offsets[h])
            lib.sptpu_count_dst(
                _ptr(self.edge_dst[int(off_e[h]):], _c_i32p),
                ctypes.c_int32(int(self.edge_counts[h])),
                ctypes.c_int32(T),
                self.ddeg[o:].ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint8)))

    def attach_gsrc(self):
        # zero-size marker: with gsrc mode on, the outermost hop's src
        # slot itself carries GLOBAL ids (no duplicate array on the wire)
        self.gsrc = np.zeros(0, np.int32)

    def fill_gsrc(self, hot_cutoff: int | None = None):
        """Rewrite the outermost hop's src in place to global ids
        (n_id[src]); its local ids are only ever used as gather indices
        into the frontier, which layer 0 skips in gsrc mode.

        With ``hot_cutoff`` (single-host cold tier + gsrc — round-3 review
        item #2: hbm<1 used to silently drop gsrc mode, paying ~19-23%
        more gathered rows every >HBM step), cold frontier ids are first
        remapped IN n_id to ``hot_cutoff + cold_slot`` (fill_cold's
        ascending slot order): the trainer keeps this batch's cold rows in
        a slack region of the device feature table right after the hot
        prefix, so ONE table serves both the layer-0 message gather and
        the level-(L-1) prefix gather — no overlay scatter remains."""
        if hot_cutoff is not None and self.cold_pos is not None:
            n = int(self.level_sizes[-1])
            cnt = int(self.cold_count)
            pos_all = np.flatnonzero(self.n_id[:n] >= hot_cutoff)
            self.n_id[pos_all[:cnt]] = (
                hot_cutoff + np.arange(cnt, dtype=np.int32))
            # over-budget cold rows (no slot) alias slot 0 — already
            # surfaced via dropped_cold and self-corrected by cap growth
            if len(pos_all) > cnt:
                self.n_id[pos_all[cnt:]] = hot_cutoff
        off = int(self.edge_offsets[self.spec.num_hops - 1])
        cap = int(self.spec.edge_caps[-1])
        get_lib().sptpu_take_i32_inplace(
            _ptr(self.n_id, _c_i32p),
            _ptr(self.edge_src[off:], _c_i32p), ctypes.c_int64(cap))

    def attach_pack(self, src_maxval: tuple, node_caps: tuple = None,
                    num_nodes: int = None):
        """Wire-pack the int32 index arrays: ship low uint16 halves plus a
        uint8 third byte only for hops whose value range reaches bits
        16..23 (``src_maxval[h]`` = exclusive bound of hop h's src values —
        the grown-frontier cap, or num_nodes for a gsrc hop). All values
        must be < 2^24; callers gate on that (papers100M-scale global ids
        keep int32). Cuts int32 index H2D 2x (16-bit hops) / 1.33x.

        ``node_caps`` bounds the mirrors' frontier-local values; it must be
        the caps of the spec whose 2-bucket programs these buffers feed
        (tight-bucket warm-up buffers pass the BIG spec's caps so the uint8
        field presence — part of the compiled treedef — matches worker
        buffers, which are always big-spec sized). With ``num_nodes`` (and
        num_nodes < 2^24) the global-id n_id array packs the same way."""
        spec = self.spec
        L = spec.num_hops
        node_caps = tuple(node_caps or spec.node_caps)
        # src_maxval bounds are EXCLUSIVE (max shipped value is bound-1);
        # mirror pads are INCLUSIVE (sptpu_mirror_by_src pads msrc with the
        # cap itself, sampler.cpp), so node_caps must fit 24 bits strictly
        assert all(v <= 2**24 for v in src_maxval), src_maxval
        assert all(v < 2**24 for v in node_caps), node_caps
        total_e = int(self.edge_offsets[-1])
        self.src_lo = np.zeros(total_e, np.uint16)
        self.src_hi = [
            (np.zeros(spec.edge_caps[h], np.uint8)
             if src_maxval[h] > 2**16 else None)
            for h in range(L)
        ]
        mir_len = int(self.mirror_src.shape[0])
        self.msrc_lo = np.zeros(mir_len, np.uint16)
        self.mdst_lo = np.zeros(mir_len, np.uint16)
        # mirror values are frontier-local: msrc <= node_caps[h+1] (the
        # PAD value IS the cap — inclusive, hence >=), mdst < node_caps[h]
        # (its pad is 0; mirrors exist for hops 0..mirror_hops-1)
        self.msrc_hi = [
            (np.zeros(spec.edge_caps[h], np.uint8)
             if node_caps[h + 1] >= 2**16 else None)
            for h in range(self.mirror_hops)
        ]
        self.mdst_hi = [
            (np.zeros(spec.edge_caps[h], np.uint8)
             if node_caps[h] > 2**16 else None)
            for h in range(self.mirror_hops)
        ]
        if num_nodes is not None and num_nodes <= 2**24:
            n = int(spec.total_node_cap)
            self.n_id_lo = np.zeros(n, np.uint16)
            self.n_id_hi = (np.zeros(n, np.uint8)
                            if num_nodes > 2**16 else None)

    @staticmethod
    def _pack_one(flat_i32, lo, his, edge_offsets):
        # little-endian int32 → halves via strided views (no temporaries)
        u16 = flat_i32.view(np.uint16)
        n = lo.shape[0]
        lo[:] = u16[0 : 2 * n : 2]
        u8 = flat_i32.view(np.uint8)
        for h, hi in enumerate(his):
            if hi is not None:
                o = int(edge_offsets[h])
                hi[:] = u8[o * 4 + 2 : (o + hi.shape[0]) * 4 : 4]

    def fill_pack(self):
        self._pack_one(self.edge_src, self.src_lo, self.src_hi,
                       self.edge_offsets)
        if self.n_id_lo is not None:
            u16 = self.n_id.view(np.uint16)
            self.n_id_lo[:] = u16[0::2]
            if self.n_id_hi is not None:
                self.n_id_hi[:] = self.n_id.view(np.uint8)[2::4]
        if self.msrc_lo.shape[0]:
            self._pack_one(self.mirror_src, self.msrc_lo, self.msrc_hi,
                           self.edge_offsets)
            self._pack_one(self.mirror_dst, self.mdst_lo, self.mdst_hi,
                           self.edge_offsets)

    def attach_from_config(self, cfg, num_nodes: int,
                           pack_node_caps: tuple = None):
        """Attach every auxiliary buffer a ``FastSamplerConfig`` calls for
        (cold tier / gsrc / ddeg / wire-pack) — the single source of truth
        for which features a buffer set carries; every producer
        (FastSamplerIter pool, FastPreSampler, bench warm-up) goes through
        here so the attach set can't drift between them.

        ``pack_node_caps`` overrides the mirror-bound caps for buffers of a
        spec other than the one that sets the compiled treedef (the bench's
        tight-bucket warm-up passes the BIG spec's caps)."""
        if cfg.cold_owner_mode:
            self.attach_cold_requests(cfg.cold_world, cfg.cold_r_cap)
        elif cfg.cold_cache is not None:
            pass  # cache mode: per-batch miss arrays attached by the
            #       consumer (finalize_cached) — workers ship nothing cold
        elif cfg.hot_cutoff is not None or cfg.cold_part_size is not None:
            self.attach_cold(cfg.cold_cap, cfg.x_cold.shape[1],
                             cfg.x_cold.dtype,
                             with_scale=cfg.x_cold_scale is not None)
        if cfg.emit_gsrc:
            # the gsrc rewrite replaces the outer hop's frontier-local
            # src values with global ids AFTER the mirror is built — an
            # outer-hop mirror would silently go stale
            assert not cfg.spec.mirror_all, \
                "mirror_all is incompatible with gsrc mode"
            self.attach_gsrc()
        if cfg.compress_dst:
            self.attach_ddeg()
        if cfg.pack_wire:
            # gsrc+cold encodes cold ids as hot_cutoff + slot, so the
            # shipped id space can exceed num_nodes by up to the cold cap
            # (cache mode: the slot space plus its zero row)
            idspace = num_nodes
            if cfg.emit_gsrc and cfg.hot_cutoff is not None:
                slots = (cfg.cold_cache.slots + 1
                         if cfg.cold_cache is not None else cfg.cold_cap)
                idspace = max(num_nodes, cfg.hot_cutoff + slots)
            self.attach_pack(
                pack_src_maxval(cfg.spec, cfg.emit_gsrc, idspace),
                node_caps=pack_node_caps, num_nodes=idspace)

    def finalize_from_config(self, cfg) -> int:
        """Post-:meth:`NativeSampler.sample_into` fills, in the
        load-bearing order: cold classification first (reads raw local
        ids), then ddeg, then the gsrc in-place src rewrite, then packing
        (which must see the rewritten srcs). Returns the number of dropped
        (over-cold-budget) rows, which callers must surface in stats."""
        dropped = 0
        if cfg.cold_cache is not None:
            # device cold-row cache: slot assignment must run serially in
            # batch CONSUMPTION order (eviction safety), so everything
            # after ddeg is deferred to the consumer (finalize_cached)
            if cfg.compress_dst:
                self.fill_ddeg()
            return 0
        if cfg.cold_owner_mode:
            dropped = self.fill_cold_requests(cfg.cold_part_size,
                                              cfg.cold_hot_size)
        elif cfg.cold_part_size is not None:
            dropped = self.fill_cold_partitioned(
                cfg.x_cold, cfg.cold_part_size, cfg.cold_hot_size,
                x_scale=cfg.x_cold_scale)
        elif cfg.hot_cutoff is not None:
            dropped = self.fill_cold(cfg.x_cold, cfg.hot_cutoff,
                                     x_scale=cfg.x_cold_scale)
        if cfg.compress_dst:
            self.fill_ddeg()
        if cfg.emit_gsrc:
            # single-host cold tier: remap cold ids to slack slots (the
            # distributed tiers keep gsrc off — see train/loop.py gate)
            self.fill_gsrc(cfg.hot_cutoff
                           if (cfg.hot_cutoff is not None
                               and cfg.cold_part_size is None
                               and not cfg.cold_owner_mode) else None)
        if cfg.pack_wire:
            self.fill_pack()
        return dropped

    def finalize_cached(self, cfg) -> int:
        """Consumer-side finalize for the device cold-row cache
        (cfg.cold_cache set; see sampling/cold_cache.py). Runs serially in
        batch-consumption order: assign cache slots for this batch's cold
        frontier ids, gather ONLY the miss rows (bucketed static shape —
        the cross-batch dedup that cuts the >HBM H2D wire), remap cold
        ids in n_id to ``hot_cutoff + slot``, then the gsrc src rewrite
        and wire-packing (both read the remapped n_id). Returns the
        dropped-row count (no slot / over the per-batch miss budget);
        dropped ids point at the permanent zero row ``hot_cutoff+slots``."""
        from .cold_cache import miss_rung

        H = cfg.hot_cutoff
        cache = cfg.cold_cache
        n = int(self.level_sizes[-1])
        pos_all = np.flatnonzero(self.n_id[:n] >= H)
        ids = self.n_id[pos_all].astype(np.int64) - H
        slot, miss = cache.assign(ids, max_new=cfg.cold_cap)
        dropped = int((slot < 0).sum())
        self.n_id[pos_all] = (
            H + np.where(slot >= 0, slot, cache.slots)).astype(np.int32)
        m = np.flatnonzero(miss)
        cnt = len(m)
        # fold mode: always the top rung — the step program applies the
        # update itself and must see ONE static miss-buffer shape
        rung = (cfg.cold_cap if getattr(cfg, "cold_fold", False)
                else miss_rung(cnt, cfg.cold_cap))
        F = cfg.x_cold.shape[1]
        self.cold_rows = np.zeros((rung, F), cfg.x_cold.dtype)
        # pad positions are far past any table row → scatter-dropped
        self.cold_pos = np.full(rung, 2**30, np.int32)
        if cnt:
            gather_rows(cfg.x_cold, ids[m], out=self.cold_rows[:cnt])
            self.cold_pos[:cnt] = H + slot[m]
        if cfg.x_cold_scale is not None:
            self.cold_scale = np.zeros(rung, np.float32)
            if cnt:
                self.cold_scale[:cnt] = cfg.x_cold_scale[ids[m]]
        else:
            self.cold_scale = None
        self.cold_count = np.int32(cnt)
        if cfg.emit_gsrc:
            self.fill_gsrc(None)  # n_id already slot-remapped: plain take
        if cfg.pack_wire:
            self.fill_pack()
        return dropped

    def attach_cold(self, cold_cap: int, num_features: int, dtype,
                    with_scale: bool = False):
        self.cold_rows = np.zeros((cold_cap, num_features), dtype)
        self.cold_pos = np.zeros(cold_cap, np.int32)
        self.cold_scale = (np.zeros(cold_cap, np.float32)
                           if with_scale else None)
        self.cold_count = np.int32(0)

    def attach_cold_requests(self, world: int, cold_r_cap: int):
        """Owner-served cold tier: the sampler only *classifies* cold
        frontier rows into per-owner request slots; rows are fetched from
        the owning host's RAM through a device all_to_all before the step
        (train/dist_loop.py cold exchange). Storage stays O(V/k) per host
        (reference capability: async_slice_tensors,
        fast_sampler.cpp:716-776)."""
        self.cold_req = np.full((world, cold_r_cap), -1, np.int32)
        self.cold_pos = np.zeros(world * cold_r_cap, np.int32)
        self.cold_rows = None
        self.cold_count = np.int32(0)

    def fill_cold_requests(self, part_size: int, hot_size: int) -> int:
        """Pack cold frontier vertices into the per-owner request matrix.

        Slot (o, j) of ``cold_req`` carries the j-th cold global id owned
        by partition o; ``cold_pos[o*cap+j]`` is its frontier slot (pad =
        frontier cap, self-dropping in the device overlay scatter). The
        exchanged response rows arrive in exactly this layout. Returns the
        number of dropped (over-cap) cold rows."""
        world, cap = self.cold_req.shape
        n = int(self.level_sizes[-1])
        ids = self.n_id[:n].astype(np.int64)
        local = ids % part_size
        pos = np.flatnonzero(local >= hot_size).astype(np.int32)
        owner = (ids[pos] // part_size).astype(np.int32)
        order = np.argsort(owner, kind="stable")
        pos, owner = pos[order], owner[order]
        cnt = np.bincount(owner, minlength=world)[:world]
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
        rank = np.arange(len(owner)) - starts[owner]
        keep = rank < cap
        slot = owner[keep] * cap + rank[keep]
        self.cold_req.fill(-1)
        self.cold_pos.fill(self.n_id.shape[0])
        self.cold_req.reshape(-1)[slot] = ids[pos[keep]].astype(np.int32)
        self.cold_pos[slot] = pos[keep]
        self.cold_count = np.int32(int(keep.sum()))
        return int(len(owner) - int(keep.sum()))

    def _fill_cold_rows(self, x_cold, pos: np.ndarray,
                        cold_idx: np.ndarray, x_scale=None) -> int:
        cap = self.cold_pos.shape[0]
        dropped = max(0, len(pos) - cap)
        pos, cold_idx = pos[:cap], cold_idx[:cap]
        cnt = len(pos)
        self.cold_pos[:cnt] = pos
        # pad slots point past every frontier cap → dropped by the device
        # scatter overlay
        self.cold_pos[cnt:] = self.n_id.shape[0]
        idx64 = cold_idx.astype(np.int64)
        gather_rows(x_cold, idx64, out=self.cold_rows[:cnt])
        self.cold_rows[cnt:] = 0
        if self.cold_scale is not None:
            # fp8 wire: the per-row dequant scales ride along
            self.cold_scale[:cnt] = x_scale[idx64]
            self.cold_scale[cnt:] = 0
        self.cold_count = np.int32(cnt)
        return dropped

    def fill_cold(self, x_cold: np.ndarray, hot_cutoff: int,
                  x_scale=None) -> int:
        """Gather host-resident rows for frontier vertices ≥ hot_cutoff
        (single-host tier: one global hot prefix). Returns dropped count."""
        n = int(self.level_sizes[-1])
        ids = self.n_id[:n]
        pos = np.flatnonzero(ids >= hot_cutoff).astype(np.int32)
        return self._fill_cold_rows(x_cold, pos, ids[pos] - hot_cutoff,
                                    x_scale)

    def fill_cold_partitioned(self, x_cold: np.ndarray, part_size: int,
                              hot_size: int, x_scale=None) -> int:
        """Distributed tier: every partition keeps its first ``hot_size``
        rows in HBM; ``x_cold`` concatenates every partition's cold tail
        (replicated on each host). Global id → cold row:
        (id // S)·(S−H) + (id mod S) − H."""
        n = int(self.level_sizes[-1])
        ids = self.n_id[:n].astype(np.int64)
        local = ids % part_size
        pos = np.flatnonzero(local >= hot_size).astype(np.int32)
        cold_idx = ((ids[pos] // part_size) * (part_size - hot_size)
                    + local[pos] - hot_size)
        return self._fill_cold_rows(x_cold, pos, cold_idx, x_scale)

    def fits(self, spec: BatchSpec) -> bool:
        """Does the sampled batch fit a (tighter) spec's caps?"""
        L = self.spec.num_hops
        ls = self.level_sizes
        return (all(int(ls[i]) <= spec.node_caps[i] for i in range(L + 1))
                and all(int(self.edge_counts[h]) <= spec.edge_caps[h]
                        for h in range(L)))

    def to_padded_batch(self, bucket: BatchSpec | None = None) -> PaddedBatch:
        """Zero-copy view as a PaddedBatch (hops reversed to processing
        order).

        With ``bucket`` (a tighter spec the batch :meth:`fits` — the
        2-bucket padding recovery, SURVEY §7): every region is instead a
        contiguous PREFIX view at the bucket's caps. All real data sits at
        the front of each per-hop slice, and every pad convention survives
        because this spec's pad values (its caps) fall strictly AFTER the
        bucket caps used as num_segments on device — pads still self-drop.
        No bytes are copied either way; the smaller views shrink H2D and
        the device program."""
        spec = bucket or self.spec
        assert spec is self.spec or (
            spec.fanouts == self.spec.fanouts
            and spec.seed_cap == self.spec.seed_cap)
        L = spec.num_hops
        off = self.edge_offsets  # the BIG layout's offsets; prefix-sliced
        do = self.ddeg_offsets
        packed = self.src_lo is not None

        def sl(a, h):
            return a[off[h]:off[h] + spec.edge_caps[h]]

        def hi(parts, h):
            p = parts[h] if parts is not None and h < len(parts) else None
            return p[: spec.edge_caps[h]] if p is not None else None

        edges = tuple(
            EdgeBlock(
                src=None if packed else sl(self.edge_src, h),
                dst=(sl(self.edge_dst, h)
                     if self.ddeg is None else None),
                count=self.edge_counts[h],
                msrc=(sl(self.mirror_src, h)
                      if h < self.mirror_hops and not packed else None),
                mdst=(sl(self.mirror_dst, h)
                      if h < self.mirror_hops and not packed else None),
                ddeg=(self.ddeg[do[h]:do[h] + spec.node_caps[h]]
                      if self.ddeg is not None else None),
                src_lo=sl(self.src_lo, h) if packed else None,
                src_hi=hi(self.src_hi, h) if packed else None,
                msrc_lo=(sl(self.msrc_lo, h)
                         if packed and h < self.mirror_hops else None),
                msrc_hi=(hi(self.msrc_hi, h)
                         if packed and h < self.mirror_hops else None),
                mdst_lo=(sl(self.mdst_lo, h)
                         if packed and h < self.mirror_hops else None),
                mdst_hi=(hi(self.mdst_hi, h)
                         if packed and h < self.mirror_hops else None),
            )
            for h in reversed(range(L))
        )
        # gsrc mode: only the level-(L-1) prefix of the frontier is ever
        # gathered on device (layer 0 reads the global table directly), so
        # the tail never rides H2D
        n_cap = (spec.total_node_cap if self.gsrc is None
                 else spec.node_caps[L - 1])
        pack_nid = self.n_id_lo is not None
        return PaddedBatch(
            n_id=None if pack_nid else self.n_id[:n_cap],
            n_id_lo=self.n_id_lo[:n_cap] if pack_nid else None,
            n_id_hi=(self.n_id_hi[:n_cap]
                     if pack_nid and self.n_id_hi is not None else None),
            level_sizes=self.level_sizes, edges=edges,
            y=self.y, seed_count=self.seed_count, overflow=self.overflow,
            gsrc=self.gsrc,
            cold_rows=self.cold_rows, cold_pos=self.cold_pos,
            cold_count=self.cold_count if self.cold_pos is not None else None,
            cold_scale=self.cold_scale,
            spec=spec,
        )


class NativeSampler:
    """Stateless-per-call native sampler over one graph's CSR."""

    def __init__(self, rowptr: np.ndarray, col: np.ndarray):
        assert rowptr.dtype == np.int64 and col.dtype == np.int32
        self.rowptr = np.ascontiguousarray(rowptr)
        self.col = np.ascontiguousarray(col)
        self.lib = get_lib()
        self._local = threading.local()

    def _mirror_ws(self, in_cap: int) -> np.ndarray:
        ws = getattr(self._local, "mirror_ws", None)
        if ws is None or ws.shape[0] < in_cap + 1:
            ws = np.empty(in_cap + 1, np.int32)
            self._local.mirror_ws = ws
        return ws

    def _workspace(self, max_nodes: int):
        ws = getattr(self._local, "ws", None)
        if ws is None or self._local.ws_nodes < max_nodes:
            if ws is not None:
                self.lib.sptpu_ws_destroy(ws)
            ws = self.lib.sptpu_ws_create(ctypes.c_int64(max_nodes))
            self._local.ws = ws
            self._local.ws_nodes = max_nodes
        return ws

    def sample_into(
        self,
        bufs: BatchBuffers,
        seeds: np.ndarray,
        rng_seed: int,
        y_global: np.ndarray | None = None,
    ) -> None:
        spec = bufs.spec
        seeds = np.ascontiguousarray(seeds, dtype=np.int64)
        fanouts = np.asarray(spec.fanouts, np.int32)
        node_caps = np.asarray(spec.node_caps, np.int32)
        edge_caps = np.asarray(spec.edge_caps, np.int32)
        ws = self._workspace(spec.total_node_cap)
        rc = self.lib.sptpu_sample_batch(
            ws,
            _ptr(self.rowptr, _c_i64p), _ptr(self.col, _c_i32p),
            ctypes.c_int64(self.rowptr.shape[0] - 1),
            _ptr(seeds, _c_i64p), ctypes.c_int32(len(seeds)),
            _ptr(fanouts, _c_i32p), ctypes.c_int32(spec.num_hops),
            ctypes.c_uint64(rng_seed & (2**64 - 1)),
            _ptr(node_caps, _c_i32p),
            _ptr(bufs.edge_offsets, _c_i64p), _ptr(edge_caps, _c_i32p),
            _ptr(bufs.n_id, _c_i32p), _ptr(bufs.level_sizes, _c_i32p),
            _ptr(bufs.edge_src, _c_i32p), _ptr(bufs.edge_dst, _c_i32p),
            _ptr(bufs.edge_counts, _c_i32p), _ptr(bufs.overflow, _c_i32p),
        )
        if rc != 0:
            raise RuntimeError(f"sptpu_sample_batch failed rc={rc} "
                               f"(1=too many seeds, 2=duplicate seeds, "
                               f"3=seed out of range)")
        # src-sorted mirrors for all but the outermost hop (every hop
        # when spec.mirror_all)
        for h in range(bufs.mirror_hops):
            in_cap = int(node_caps[h + 1])
            ws = self._mirror_ws(in_cap)
            off = int(bufs.edge_offsets[h])
            self.lib.sptpu_mirror_by_src(
                _ptr(bufs.edge_src[off:], _c_i32p),
                _ptr(bufs.edge_dst[off:], _c_i32p),
                ctypes.c_int32(int(bufs.edge_counts[h])),
                ctypes.c_int32(int(spec.edge_caps[h])),
                ctypes.c_int32(in_cap),
                _ptr(ws, _c_i32p),
                _ptr(bufs.mirror_src[off:], _c_i32p),
                _ptr(bufs.mirror_dst[off:], _c_i32p))
        bufs.seed_count = np.int32(len(seeds))
        if y_global is not None:
            ns = len(seeds)
            bufs.y[:ns] = y_global[bufs.n_id[:ns]]
            bufs.y[ns:] = 0

    def sample(self, spec: BatchSpec, seeds: np.ndarray, rng_seed: int,
               y_global: np.ndarray | None = None) -> PaddedBatch:
        bufs = BatchBuffers(spec)
        self.sample_into(bufs, seeds, rng_seed,
                         y_global if y_global is not None else None)
        return bufs.to_padded_batch()


def gather_rows(src: np.ndarray, idx: np.ndarray, out: np.ndarray | None = None):
    """Native row gather (serial_index analog) for host-tier features."""
    lib = get_lib()
    assert src.flags["C_CONTIGUOUS"]
    row_bytes = src.strides[0]
    if out is None:
        out = np.empty((len(idx), *src.shape[1:]), src.dtype)
    if idx.dtype == np.int64:
        lib.sptpu_gather_rows(
            src.ctypes.data_as(ctypes.c_void_p),
            _ptr(np.ascontiguousarray(idx), _c_i64p),
            ctypes.c_int64(len(idx)), ctypes.c_int64(row_bytes),
            out.ctypes.data_as(ctypes.c_void_p))
    else:
        lib.sptpu_gather_rows_i32(
            src.ctypes.data_as(ctypes.c_void_p),
            _ptr(np.ascontiguousarray(idx, np.int32), _c_i32p),
            ctypes.c_int64(len(idx)), ctypes.c_int64(row_bytes),
            out.ctypes.data_as(ctypes.c_void_p))
    return out
