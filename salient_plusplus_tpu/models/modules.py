"""The model zoo — 8 architectures with reference-parity hyperparameters.

Mirrors driver/models.py (reference): SAGE (:19-56), SAGEClassic (:59-91),
SAGEResInception (:128-192), GAT (:195-231), GIN (:234-283), JKNet
(:286-340), GCN (:343-388), ARMA (:391-436, broken in the reference per
driver/main.py:93). All share the bipartite multi-hop forward convention
``x_target = x[:out_rows]; x = conv((x, x_target), edges[i])`` over a
PaddedBatch, with static row capacities from the batch spec and masked
BatchNorm where the reference uses BatchNorm1d.

Call convention:
    variables = model.init(rngs, x, batch, training=False)
    out = model.apply(variables, x, batch, training=True,
                      rngs={"dropout": k}, mutable=["batch_stats"])
``out`` is float32 log-probabilities [seed_cap, num_classes] (log_softmax,
as the reference returns); only rows < batch.seed_count are valid.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..sampling.batch import PaddedBatch
from .layers import (
    ARMAConv, GATConv, GCNConv, GINConv, MLP, MaskedBatchNorm, SAGEConv,
)

Dtype = Any


class _GNNBase(nn.Module):
    in_features: int
    hidden_features: int
    out_features: int
    num_layers: int
    dropout: float = 0.5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _final(self, x, batch: PaddedBatch):
        """Slice to seed rows, fp32 log_softmax (reference returns
        log_softmax; loss is nll)."""
        out = x[: batch.spec.seed_cap].astype(jnp.float32)
        return nn.log_softmax(out, axis=-1)


def _layer0_inputs(x, batch: PaddedBatch, features, out_cap, dtype):
    """(msg_source, edge) for layer 0.

    With ``features`` (the HBM table) and ``batch.gsrc`` present, layer 0
    aggregates straight from the global table via global src ids — the
    level-L frontier tail (only ever a message source) is then never
    gathered, shrinking the trainer's frontier gather to the level-(L-1)
    prefix (train/step.py). Raw features carry no gradient, so the
    aggregation needs no backward mirror either way."""
    e0 = batch.edges[0]
    if features is not None and batch.gsrc is not None:
        # gsrc mode: e0.src already carries GLOBAL ids (sampler rewrote
        # them in place; batch.gsrc is the zero-size mode marker). Avoid
        # casting the whole table in-step — the trainer stores it bf16.
        f = features if features.dtype == dtype else features.astype(dtype)
        return f, e0
    return x, e0


class SAGE(_GNNBase):
    """3-layer default GraphSAGE, bias-free convs (driver/models.py:19-56)."""

    use_bias: bool = False

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False,
                 features=None):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            feat = (self.out_features if i == L - 1 else self.hidden_features)
            x_target = x[:out_cap]
            if i == 0:
                x, edge = _layer0_inputs(x, batch, features, out_cap,
                                         self.dtype)
            else:
                edge = batch.edges[i]
            x = SAGEConv(feat, use_bias=self.use_bias, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"conv{i}")(
                x, x_target, edge, out_cap)
            if i != L - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return self._final(x, batch)


class SAGEClassic(SAGE):
    """SAGE with default-bias convs (driver/models.py:59-91)."""

    use_bias: bool = True


class SAGEResInception(_GNNBase):
    """Residual + inception SAGE with BN and an MLP head over concatenated
    per-hop outputs (driver/models.py:128-192). Dropout 0.1 throughout;
    first residual is a Linear(in→hidden), later ones identity; the head is
    MLP(in + hidden·L → 2·out → out) of plain Linears (end_up_with_fc)."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        end_cap = batch.spec.node_caps[0]
        seed_n = batch.level_sizes[0]
        drop = lambda v: nn.Dropout(0.1, deterministic=not training)(v)

        collect = []
        x = drop(x)
        collect.append(x[:end_cap])
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            x_target = x[:out_cap]
            h = SAGEConv(self.hidden_features, use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"conv{i}")(
                drop(x), drop(x_target), batch.edges[i], out_cap)
            h = MaskedBatchNorm(dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"bn{i}")(
                h, batch.level_sizes[L - i - 1],
                use_running_average=not training)
            h = nn.leaky_relu(h, 0.01)
            h = drop(h)
            collect.append(h[:end_cap])
            if i == 0:
                res = nn.Dense(self.hidden_features, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="res0")(x_target)
            else:
                res = x_target
            x = h + res
        out = MLP(hidden_dim=2 * self.out_features,
                  embed_dim=self.out_features, num_layers=2, bn=True,
                  end_up_with_fc=True, act="leakyrelu", dtype=self.dtype,
                  param_dtype=self.param_dtype, name="mlp")(
            jnp.concatenate(collect, axis=-1), seed_n, training)
        return self._final(out, batch)


class GAT(_GNNBase):
    """Single-head GAT, bias-free (driver/models.py:195-231)."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            feat = (self.out_features if i == L - 1 else self.hidden_features)
            x_target = x[:out_cap]
            x = GATConv(feat, heads=1, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(
                x, x_target, batch.edges[i], out_cap)
            if i != L - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return self._final(x, batch)


class GIN(_GNNBase):
    """GIN with 2-layer BN MLPs per conv + 2-layer head
    (driver/models.py:234-283)."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False,
                 features=None):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            valid = batch.level_sizes[L - i - 1]
            x_target = x[:out_cap]
            if i == 0:
                x, edge = _layer0_inputs(x, batch, features, out_cap,
                                         self.dtype)
            else:
                edge = batch.edges[i]
            x = GINConv(self.hidden_features, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(
                x, x_target, edge, out_cap, valid, training)
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="lin1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="lin2")(x)
        return self._final(x, batch)


class JKNet(_GNNBase):
    """Jumping-knowledge net, max-pool mode (driver/models.py:286-340)."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        end_cap = batch.spec.node_caps[0]
        xs = []
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            x_target = x[:out_cap]
            x = SAGEConv(self.hidden_features, use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"conv{i}")(x, x_target, batch.edges[i], out_cap)
            x = MaskedBatchNorm(dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"bn{i}")(
                x, batch.level_sizes[L - i - 1],
                use_running_average=not training)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            xs.append(x[:end_cap])
        x = jnp.max(jnp.stack(xs, axis=0), axis=0)   # JK 'max' mode
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="lin")(x)
        return self._final(x, batch)


class GCN(_GNNBase):
    """GCN with normalize=False, bias-free convs, BN between layers
    (driver/models.py:343-388). The reference passes the full x (not a
    bipartite pair) so conv outputs keep the input row count."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            feat = (self.out_features if i == L - 1 else self.hidden_features)
            h = GCNConv(feat, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(
                x, batch.edges[i], out_cap)
            # keep input row count like the reference (rows ≥ out_cap → 0)
            x = jnp.zeros((in_cap, feat), self.dtype).at[:out_cap].set(h)
            if i != L - 1:
                x = MaskedBatchNorm(dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"bn{i}")(
                    x, batch.level_sizes[L - i],
                    use_running_average=not training)
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return self._final(x, batch)


class ARMA(_GNNBase):
    """ARMA_1 stack (driver/models.py:391-436). NOTE: flagged broken in the
    reference (driver/main.py:93) — provided for API-surface parity; the
    final conv keeps hidden width exactly as the reference does."""

    @nn.compact
    def __call__(self, x, batch: PaddedBatch, training: bool = False):
        x = x.astype(self.dtype)
        L = batch.num_layers
        assert L == self.num_layers, (L, self.num_layers)
        for i in range(L):
            in_cap, out_cap = batch.layer_caps(i)
            x = ARMAConv(self.hidden_features, dropout=self.dropout,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"conv{i}")(
                x, batch.edges[i], out_cap, training)
            if i != L - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return self._final(x, batch)


MODEL_REGISTRY = {
    "SAGE": SAGE,
    "SAGEClassic": SAGEClassic,
    "SAGEResInception": SAGEResInception,
    "GAT": GAT,
    "GIN": GIN,
    "JKNet": JKNet,
    "GCN": GCN,
    "ARMA": ARMA,
}


def make_model(name: str, in_features: int, hidden_features: int,
               out_features: int, num_layers: int, dropout: float = 0.5,
               dtype=jnp.bfloat16) -> nn.Module:
    """Factory matching the reference's model_type(in, hidden, out, layers)
    instantiation (driver/drivers/base.py:229-236)."""
    cls = MODEL_REGISTRY[name]
    return cls(in_features=in_features, hidden_features=hidden_features,
               out_features=out_features, num_layers=num_layers,
               dropout=dropout, dtype=dtype)
