"""Layer-wise full-graph inference.

Reference parity: layerwise_inference (driver/models.py:441-495) — compute
every node's representation one layer at a time using *all* edges, instead
of per-seed multi-hop sampling. The reference streams batches through a
CUDA write-back stream; here each chunk is one jitted step that gathers the
previous layer's embeddings, aggregates the chunk's full neighborhoods, and
functionally scatters the chunk's outputs into the next layer's embedding
matrix (XLA overlaps the steps).

The reference only implements it for the SAGE family and GAT
(driver/models.py: SAGE:52, SAGEClassic:87, GAT:226; GIN/GCN/JKNet/
SAGEResInception say "not implemented yet"). This framework supports the
whole zoo except ARMA (broken in the reference itself, driver/main.py:93):
BatchNorm layers run in eval mode off the trained running statistics
(pass ``batch_stats``), and multi-layer aggregators (JK max-pool, the
inception concat head) keep per-layer full-graph embeddings.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..sampling.batch import BatchSpec, EdgeBlock
from ..sampling.cpp import NativeSampler
from .layers import (
    GATConv, GCNConv, GINConv, MLP, MaskedBatchNorm, SAGEConv,
)

SUPPORTED = ("SAGE", "SAGEClassic", "GAT", "GIN", "GCN", "JKNet",
             "SAGEResInception")
# models whose layerwise path needs trained BN running statistics
_NEEDS_BATCH_STATS = ("GIN", "GCN", "JKNet", "SAGEResInception")


def _chunk_spec(rowptr: np.ndarray, chunk: int, align: int = 128) -> BatchSpec:
    """Static caps for 1-hop full-expansion chunks: the worst chunk's total
    degree bounds the edge cap; frontier ≤ chunk + edges."""
    V = len(rowptr) - 1
    deg = np.diff(rowptr)
    worst_edges = 0
    for s in range(0, V, chunk):
        worst_edges = max(worst_edges, int(deg[s:s + chunk].sum()))
    e_cap = int(-(-worst_edges // align) * align) + align
    n_cap = int(-(-(chunk + worst_edges) // align) * align) + align
    return BatchSpec((-1,), chunk, (chunk, n_cap), (e_cap,))


def _feat_dim(conv_params: Dict) -> int:
    """Output width of a conv from its parameter shapes."""
    for key in ("lin_l", "lin_src", "lin", "fc1"):
        if key in conv_params:
            return int(np.asarray(conv_params[key]["kernel"]).shape[1])
    raise KeyError(f"cannot infer feature dim from {list(conv_params)}")


def _dense(p: Dict, x, dtype):
    return nn.Dense(int(np.asarray(p["kernel"]).shape[1]),
                    use_bias="bias" in p, dtype=dtype).apply(
        {"params": p}, x)


def _bn(p: Dict, stats: Dict, x, dtype):
    return MaskedBatchNorm(dtype=dtype).apply(
        {"params": p, "batch_stats": stats}, x,
        use_running_average=True)


class LocalEngine:
    """Single-device chunked full-expansion propagation (the default
    layerwise engine). The SPMD engine (train/dist_inference.py) provides
    the same interface over a sharded mesh — the zoo dispatch below is
    engine-agnostic."""

    def __init__(self, graph_rowptr, graph_col, chunk: int):
        self.V = len(graph_rowptr) - 1
        self.native = NativeSampler(np.asarray(graph_rowptr, np.int64),
                                    np.asarray(graph_col, np.int32))
        self.spec = _chunk_spec(graph_rowptr, chunk)
        self.chunk = chunk
        self.seed_cap = self.spec.seed_cap

    def full(self, fn, *arrays):
        """Apply a full-graph (non-neighborhood) op — dense heads, JK
        pooling, residuals. The sharded engine jit-wraps this so XLA keeps
        the arrays sharded; locally a plain call suffices."""
        return fn(*arrays)

    def propagate(self, core, emb, feat_out):
        """One full-graph layer: chunked 1-hop full expansion, functional
        scatter of each chunk's rows into the [V, feat_out] output (padded
        seed ids point at V → dropped by the scatter)."""
        V, seed_cap = self.V, self.seed_cap

        # donate out_buf: without it XLA copies the whole [V, feat]
        # matrix on every chunk (O(V^2·F/chunk) HBM traffic at scale)
        @functools.partial(jax.jit, donate_argnums=(6,))
        def chunk_fn(emb, n_id, seed_ids, src, dst, count, out_buf):
            x = jnp.take(emb, n_id, axis=0)
            eb = EdgeBlock(src=src, dst=dst, count=count)
            h = core(x, eb)
            return out_buf.at[seed_ids].set(h.astype(out_buf.dtype))

        out = jnp.zeros((V, feat_out), emb.dtype)
        for s in range(0, V, self.chunk):
            ids = np.arange(s, min(s + self.chunk, V), dtype=np.int64)
            b = self.native.sample(self.spec, ids, rng_seed=1)
            assert b.overflow.tolist() == [0, 0]
            pad_ids = np.full(seed_cap, V, np.int32)
            pad_ids[: len(ids)] = ids
            eb = b.edges[0]
            out = chunk_fn(emb, jnp.asarray(b.n_id), jnp.asarray(pad_ids),
                           jnp.asarray(eb.src), jnp.asarray(eb.dst),
                           jnp.asarray(eb.count), out)
        return out


def layerwise_inference(
    model_name: str,
    params: Dict,
    graph_rowptr: np.ndarray,
    graph_col: np.ndarray,
    x_all: jnp.ndarray,          # [V, F] initial features (device)
    num_layers: int,
    chunk: int = 4096,
    dtype=jnp.bfloat16,
    device=None,
    batch_stats: Optional[Dict] = None,
) -> jnp.ndarray:
    """Returns final-layer representations for all V nodes (log-probs for
    the classification head layer, matching the reference's usage)."""
    eng = LocalEngine(graph_rowptr, graph_col, chunk)
    return run_layerwise_zoo(model_name, params, num_layers, x_all, eng,
                             dtype=dtype, batch_stats=batch_stats)


def run_layerwise_zoo(
    model_name: str,
    params: Dict,
    num_layers: int,
    x_all: jnp.ndarray,
    eng,                          # LocalEngine or the SPMD ShardedEngine
    dtype=jnp.bfloat16,
    batch_stats: Optional[Dict] = None,
) -> jnp.ndarray:
    """Model-zoo dispatch for layerwise inference over any propagation
    engine (single device or mesh-sharded)."""
    if model_name not in SUPPORTED:
        raise NotImplementedError(
            f"layerwise inference not implemented for {model_name} "
            "(ARMA is broken in the reference itself, driver/main.py:93)")
    if model_name in _NEEDS_BATCH_STATS and not batch_stats:
        raise ValueError(
            f"{model_name} has BatchNorm layers: pass batch_stats "
            "(the trained running statistics) for layerwise inference")
    bs = batch_stats or {}
    seed_cap = eng.seed_cap
    propagate = eng.propagate

    def finish(x):
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)

    emb = x_all

    if model_name in ("SAGE", "SAGEClassic", "GAT"):
        use_bias = model_name == "SAGEClassic"
        for i in range(num_layers):
            p = params[f"conv{i}"]
            feat = _feat_dim(p)
            last = i == num_layers - 1
            if model_name == "GAT":
                conv = GATConv(feat, heads=1, use_bias=False, dtype=dtype)
            else:
                conv = SAGEConv(feat, use_bias=use_bias, dtype=dtype)

            def core(x, eb, conv=conv, p=p, last=last):
                h = conv.apply({"params": p}, x, x[:seed_cap], eb, seed_cap)
                return h if last else nn.relu(h)

            emb = propagate(core, emb, feat)
        return eng.full(finish, emb)

    if model_name == "GIN":
        for i in range(num_layers):
            p, st = params[f"conv{i}"], bs[f"conv{i}"]
            feat = _feat_dim(p)
            conv = GINConv(feat, dtype=dtype)

            def core(x, eb, conv=conv, p=p, st=st):
                return conv.apply({"params": p, "batch_stats": st},
                                  x, x[:seed_cap], eb, seed_cap,
                                  valid_count=None, training=False)

            emb = propagate(core, emb, feat)

        def gin_head(e):
            h = nn.relu(_dense(params["lin1"], e, dtype))
            return finish(_dense(params["lin2"], h, dtype))

        return eng.full(gin_head, emb)

    if model_name == "GCN":
        for i in range(num_layers):
            p = params[f"conv{i}"]
            feat = _feat_dim(p)
            last = i == num_layers - 1
            conv = GCNConv(feat, dtype=dtype)
            pbn = None if last else params[f"bn{i}"]
            sbn = None if last else bs[f"bn{i}"]

            def core(x, eb, conv=conv, p=p, pbn=pbn, sbn=sbn, last=last):
                h = conv.apply({"params": p}, x, eb, seed_cap)
                if last:
                    return h
                return nn.relu(_bn(pbn, sbn, h, dtype))

            emb = propagate(core, emb, feat)
        return eng.full(finish, emb)

    if model_name == "JKNet":
        pooled = None  # JK 'max' mode as a running accumulator: O(V·H)
        #               instead of keeping all L full-graph embeddings
        for i in range(num_layers):
            p, pbn = params[f"conv{i}"], params[f"bn{i}"]
            sbn = bs[f"bn{i}"]
            feat = _feat_dim(p)
            conv = SAGEConv(feat, use_bias=False, dtype=dtype)

            def core(x, eb, conv=conv, p=p, pbn=pbn, sbn=sbn):
                h = conv.apply({"params": p}, x, x[:seed_cap], eb, seed_cap)
                return nn.relu(_bn(pbn, sbn, h, dtype))

            emb = propagate(core, emb, feat)
            pooled = emb if pooled is None else eng.full(
                jnp.maximum, pooled, emb)
        return eng.full(
            lambda e: finish(_dense(params["lin"], e, dtype)), pooled)

    assert model_name == "SAGEResInception"
    x0 = eng.full(lambda a: a.astype(dtype), x_all)
    collect = [x0]
    emb = x0
    for i in range(num_layers):
        p, pbn = params[f"conv{i}"], params[f"bn{i}"]
        sbn = bs[f"bn{i}"]
        feat = _feat_dim(p)
        conv = SAGEConv(feat, use_bias=False, dtype=dtype)

        def core(x, eb, conv=conv, p=p, pbn=pbn, sbn=sbn):
            h = conv.apply({"params": p}, x, x[:seed_cap], eb, seed_cap)
            return nn.leaky_relu(_bn(pbn, sbn, h, dtype), 0.01)

        h_all = propagate(core, emb, feat)
        collect.append(h_all)
        if i == 0:
            emb = eng.full(
                lambda h, e: h + _dense(params["res0"], e, dtype),
                h_all, emb)
        else:
            emb = eng.full(jnp.add, h_all, emb)
    mlp_p = params["mlp"]
    out_f = int(np.asarray(mlp_p["fc1"]["kernel"]).shape[1])
    hid_f = int(np.asarray(mlp_p["fc0"]["kernel"]).shape[1])
    head = MLP(hidden_dim=hid_f, embed_dim=out_f, num_layers=2, bn=True,
               end_up_with_fc=True, act="leakyrelu", dtype=dtype)

    def sri_head(*coll):
        return finish(head.apply({"params": mlp_p},
                                 jnp.concatenate(coll, axis=-1),
                                 training=False))

    return eng.full(sri_head, *collect)
