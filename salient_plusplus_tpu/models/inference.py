"""Layer-wise full-graph inference.

Reference parity: layerwise_inference (driver/models.py:441-495) — compute
every node's representation one layer at a time using *all* edges, instead
of per-seed multi-hop sampling. The reference streams batches through a
CUDA write-back stream; here each chunk is one jitted step that gathers the
previous layer's embeddings, aggregates the chunk's full neighborhoods, and
functionally scatters the chunk's outputs into the next layer's embedding
matrix (XLA overlaps the steps).

As in the reference, only the SAGE family and GAT implement it
(driver/models.py: SAGE:52, SAGEClassic:87, GAT:226; others say "not
implemented yet").
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..sampling.batch import BatchSpec
from ..sampling.cpp import NativeSampler
from .layers import GATConv, SAGEConv

SUPPORTED = ("SAGE", "SAGEClassic", "GAT")


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
) -> jnp.ndarray:
    """Returns final-layer representations for all V nodes (log-probs for
    the classification head layer, matching the reference's usage)."""
    if model_name not in SUPPORTED:
        raise NotImplementedError(
            f"layerwise inference not implemented for {model_name} "
            f"(reference parity: driver/models.py marks it unimplemented)")
    V = len(graph_rowptr) - 1
    native = NativeSampler(np.asarray(graph_rowptr, np.int64),
                           np.asarray(graph_col, np.int32))
    spec = _chunk_spec(graph_rowptr, chunk)

    use_bias = model_name == "SAGEClassic"

    def make_layer_fn(i: int, feat: int, last: bool):
        if model_name == "GAT":
            conv = GATConv(feat, heads=1, use_bias=False, dtype=dtype)
        else:
            conv = SAGEConv(feat, use_bias=use_bias, dtype=dtype)

        @jax.jit
        def layer_fn(conv_params, emb, n_id, seed_ids, edge_src, edge_dst,
                     edge_count, out_buf):
            x = jnp.take(emb, n_id, axis=0)
            x_target = x[:spec.seed_cap]
            from ..sampling.batch import EdgeBlock

            eb = EdgeBlock(src=edge_src, dst=edge_dst, count=edge_count)
            h = conv.apply({"params": conv_params}, x, x_target, eb,
                           spec.seed_cap)
            if not last:
                h = jax.nn.relu(h)
            return out_buf.at[seed_ids].set(h.astype(out_buf.dtype))

        return layer_fn

    emb = x_all
    for i in range(num_layers):
        conv_params = params[f"conv{i}"]
        lin = conv_params.get("lin_l") or conv_params.get("lin_src")
        feat = int(np.asarray(lin["kernel"]).shape[1])
        last = i == num_layers - 1
        layer_fn = make_layer_fn(i, feat, last)
        out = jnp.zeros((V, feat), emb.dtype)
        for s in range(0, V, chunk):
            ids = np.arange(s, min(s + chunk, V), dtype=np.int64)
            b = native.sample(spec, ids, rng_seed=1)
            assert b.overflow.tolist() == [0, 0]
            # pad scatter targets with V: out-of-bounds updates are dropped
            # by jax's scatter, so padded rows never clobber node 0
            pad_ids = np.full(spec.seed_cap, V, np.int32)
            pad_ids[: len(ids)] = ids
            eb = b.edges[0]
            out = layer_fn(conv_params, emb, jnp.asarray(b.n_id),
                           jnp.asarray(pad_ids), jnp.asarray(eb.src),
                           jnp.asarray(eb.dst), jnp.asarray(eb.count), out)
        emb = out
    return jax.nn.log_softmax(emb.astype(jnp.float32), axis=-1)
