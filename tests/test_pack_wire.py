"""Wire-packed index arrays (EdgeBlock.src_lo/src_hi etc.) are a pure
encoding: decode_batch restores bit-identical int32 arrays, and training
with pack_wire on/off is loss-bit-equal."""

import numpy as np
import pytest

from salient_plusplus_tpu.config import RunConfig
from salient_plusplus_tpu.data import synthetic
from salient_plusplus_tpu.sampling.batch import BatchSpec
from salient_plusplus_tpu.sampling.sampler import (
    FastSampler, FastSamplerConfig)
from salient_plusplus_tpu.train.step import decode_batch


def _graph(v=70_000, deg=8, seed=3):
    # > 2^16 nodes so the gsrc (global-id) hop exercises the uint8 third
    # byte; frontier-local hops stay pure uint16
    return synthetic.powerlaw_graph(
        name="packw", num_nodes=v, avg_degree=deg, num_features=16,
        num_classes=5, seed=seed)


def _sampler(g, pack, gsrc, spec=None):
    spec = spec or BatchSpec.worst_case(64, [4, 3])
    return FastSampler(
        np.asarray(g.rowptr, np.int64), np.asarray(g.col, np.int32),
        np.asarray(g.y, np.int32),
        FastSamplerConfig(spec=spec, batch_size=64, base_seed=11,
                          num_workers=2, emit_gsrc=gsrc, compress_dst=True,
                          pack_wire=pack),
        idx=np.asarray(g.split_idx["train"][:512], np.int64))


@pytest.mark.parametrize("gsrc", [False, True])
def test_pack_roundtrip_bit_equal(gsrc):
    g = _graph()
    batches = {}
    for pack in (False, True):
        s = _sampler(g, pack, gsrc)
        it = iter(s)
        got = []
        for b in it:
            got.append(b.to_padded_batch(b.bucket))
            # NOT recycled: keep buffers alive for comparison
        batches[pack] = got
    assert len(batches[True]) == len(batches[False]) > 0
    saw_hi = False
    for plain, packed in zip(batches[False], batches[True]):
        assert packed.edges[0].src is None  # actually shipped packed
        assert packed.n_id is None and packed.n_id_lo is not None
        dec = decode_batch(packed)
        np.testing.assert_array_equal(plain.n_id, np.asarray(dec.n_id))
        for ep, ed in zip(plain.edges, dec.edges):
            np.testing.assert_array_equal(ep.src, np.asarray(ed.src))
            if ep.msrc is not None:
                np.testing.assert_array_equal(ep.msrc, np.asarray(ed.msrc))
                np.testing.assert_array_equal(ep.mdst, np.asarray(ed.mdst))
        saw_hi |= any(e.src_hi is not None for e in packed.edges)
    # the gsrc hop ships global ids < 70_000 > 2^16 → needs the third byte
    assert saw_hi == gsrc


def test_mirror_hi_byte_roundtrip():
    """Mirror arrays with values beyond 2^16 (node caps > 65536) must take
    the uint8 third-byte path — not reachable from small e2e graphs."""
    from salient_plusplus_tpu.sampling.cpp import BatchBuffers

    spec = BatchSpec(fanouts=(2, 2), seed_cap=128,
                     node_caps=(128, 70_000, 140_000),
                     edge_caps=(512, 512))
    bufs = BatchBuffers(spec)
    rng = np.random.default_rng(0)
    bufs.edge_src[:] = rng.integers(0, 140_000, bufs.edge_src.shape)
    bufs.mirror_src[:] = rng.integers(0, 70_000, bufs.mirror_src.shape)
    bufs.mirror_dst[:] = rng.integers(0, 128, bufs.mirror_dst.shape)
    bufs.attach_pack(src_maxval=(70_000, 140_000), num_nodes=200_000)
    bufs.fill_pack()
    b = bufs.to_padded_batch()
    assert b.edges[0].src_hi is not None     # hop 1 (processing order 0)
    assert b.edges[1].src_hi is not None
    assert b.edges[1].msrc_hi is not None    # msrc < 70_000 > 2^16
    assert b.edges[1].mdst_hi is None        # mdst < 128
    dec = decode_batch(b)
    np.testing.assert_array_equal(
        bufs.edge_src[512:], np.asarray(dec.edges[0].src))
    np.testing.assert_array_equal(
        bufs.edge_src[:512], np.asarray(dec.edges[1].src))
    np.testing.assert_array_equal(
        bufs.mirror_src[:512], np.asarray(dec.edges[1].msrc))
    np.testing.assert_array_equal(
        bufs.mirror_dst[:512], np.asarray(dec.edges[1].mdst))
    np.testing.assert_array_equal(bufs.n_id, np.asarray(dec.n_id))


def test_mirror_pad_at_pow2_boundary():
    """Node cap exactly 2^16: the msrc PAD value equals the cap itself
    (sptpu_mirror_by_src pads inclusively), which needs the 17th bit even
    though every real value fits 16. Regression: an exclusive-bound test
    (> 2^16) dropped the hi byte here and pads decoded to 0 — landing pad
    edges in segment 0 of the backward aggregation."""
    from salient_plusplus_tpu.sampling.cpp import BatchBuffers

    cap = 2**16
    spec = BatchSpec(fanouts=(2, 2), seed_cap=128,
                     node_caps=(128, cap, cap + 128),
                     edge_caps=(512, 512))
    bufs = BatchBuffers(spec)
    rng = np.random.default_rng(1)
    # per-hop exclusive src bounds: hop 0 < node_caps[1], hop 1 < node_caps[2]
    bufs.edge_src[:512] = rng.integers(0, cap, 512)
    bufs.edge_src[512:] = rng.integers(0, cap + 128, 512)
    bufs.mirror_src[:400] = rng.integers(0, cap, 400)
    bufs.mirror_src[400:512] = cap          # pad slots: msrc == in_cap
    bufs.mirror_dst[:] = rng.integers(0, 128, bufs.mirror_dst.shape)
    bufs.attach_pack(src_maxval=(cap, cap + 128), num_nodes=cap + 1000)
    bufs.fill_pack()
    b = bufs.to_padded_batch()
    assert b.edges[1].msrc_hi is not None   # pad value needs bit 16
    dec = decode_batch(b)
    np.testing.assert_array_equal(
        bufs.mirror_src[:512], np.asarray(dec.edges[1].msrc))
    assert int(np.asarray(dec.edges[1].msrc)[-1]) == cap  # pads survive
    np.testing.assert_array_equal(
        bufs.mirror_dst[:512], np.asarray(dec.edges[1].mdst))
    np.testing.assert_array_equal(
        bufs.edge_src[:512], np.asarray(dec.edges[1].src))


def test_pack_wire_mirror_all_outer_hop_roundtrip():
    """pack_wire + mirror_all through the REAL sampler path (ADVICE r4):
    the outermost hop's msrc/mdst — emitted only under mirror_all
    (GAT/GCN/ARMA specs) — must round-trip the wire packing bit-exactly,
    including the inclusive pad value node_caps[L], with node caps
    straddling 2^16 so both hi-byte thresholds (msrc >=, mdst >) fire."""
    import dataclasses

    g = _graph(v=70_000, deg=8)
    # inflated caps: in-cap of the outer hop = 2^16 exactly (the msrc pad
    # value needs bit 16 even though real values fit), out-cap 70_016
    spec = dataclasses.replace(
        BatchSpec(fanouts=(4, 3), seed_cap=64,
                  node_caps=(64, 2**16, 70_016), edge_caps=(512, 1024)),
        mirror_all=True)
    batches = {}
    for pack in (False, True):
        s = _sampler(g, pack, gsrc=False, spec=spec)
        batches[pack] = [b.to_padded_batch(b.bucket) for b in iter(s)]
    assert len(batches[True]) == len(batches[False]) > 0
    for plain, packed in zip(batches[False], batches[True]):
        # outer hop (processing order 0) really shipped packed mirrors
        assert packed.edges[0].msrc is None
        assert packed.edges[0].msrc_lo is not None
        # in-cap 70_016 > 2^16 → msrc needs the third byte; out-cap
        # 2^16 >= 2^16 → mdst of the outer hop needs none (mdst_hi
        # threshold is exclusive >) but the INNER hop's msrc pad == 2^16
        # needs bit 16 (inclusive >=)
        assert packed.edges[0].msrc_hi is not None
        assert packed.edges[0].mdst_hi is None
        assert packed.edges[1].msrc_hi is not None
        dec = decode_batch(packed)
        for hop, (ep, ed) in enumerate(zip(plain.edges, dec.edges)):
            assert ep.msrc is not None, hop  # mirror_all: every hop
            np.testing.assert_array_equal(ep.msrc, np.asarray(ed.msrc))
            np.testing.assert_array_equal(ep.mdst, np.asarray(ed.mdst))
            # pads survive the wire: msrc pad == the hop's in-level cap
            cnt = int(ep.count)
            in_cap = spec.node_caps[len(plain.edges) - hop]
            if cnt < ep.msrc.shape[0]:
                assert (np.asarray(ed.msrc)[cnt:] == in_cap).all()


def test_train_losses_bit_equal_with_packing():
    from salient_plusplus_tpu.train.loop import Trainer

    g = _graph(v=70_000, deg=6)
    losses = {}
    for pack in (False, True):
        cfg = RunConfig(train_batch_size=128, train_fanouts=[5, 3],
                        hidden_features=32, num_layers=2, epochs=1,
                        num_workers=2, calibration_batches=4,
                        pack_wire=pack, model_name="SAGE")
        tr = Trainer(cfg, g)
        assert tr.pack_wire == pack
        tr.train_sampler.set_epoch(g.split_idx["train"][:1024], 0)
        losses[pack] = tr.train_epoch(0)
    assert losses[True] == losses[False]
