"""Graph convolution layers over padded bipartite COO hops.

Functional equivalents of the PyG convs the reference instantiates
(driver/models.py:19-436: SAGEConv, GATConv, GINConv, GCNConv, ARMAConv),
built from masked segment ops so every shape is static. Convention matches
the reference's bipartite forward (`x_target = x[:size[1]]`,
driver/models.py:41-50): a layer takes the input-level features ``x``
[in_cap, F], the hop's EdgeBlock (src→x rows, dst→target rows), and the
static target row capacity ``out_cap``; padded rows flow through as finite
garbage and are masked at the loss / BN / collect points.

Compute dtype is bfloat16 (MXU-native) with float32 params and float32
matmul accumulation; the reference's fp16-storage→fp32-compute cast
(driver/models.py:42) becomes bf16 storage → bf16 compute here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mxu_segment import mxu_spmm_enabled, spmm_agg
from ..ops.segment import (
    gather_rows,
    masked_segment_mean,
    masked_segment_softmax,
    masked_segment_sum,
    valid_mask,
)
from ..sampling.batch import EdgeBlock

Dtype = Any


def _agg(x, edge: EdgeBlock, out_cap: int, mean: bool):
    """Gather-and-aggregate one hop: MXU one-hot-matmul kernel path
    (scatter-free fwd + mirrored bwd, ops/mxu_segment.py) on TPU, XLA
    segment ops elsewhere."""
    if mxu_spmm_enabled():
        return spmm_agg(x, edge, out_cap, mean=mean)
    msg = gather_rows(x, edge.src)
    if mean:
        return masked_segment_mean(msg, edge.dst, edge.count, out_cap,
                                   sorted_dst=True)
    return masked_segment_sum(msg, edge.dst, edge.count, out_cap,
                              sorted_dst=True)


def _dense(feat, use_bias, dtype, param_dtype, name):
    return nn.Dense(feat, use_bias=use_bias, dtype=dtype,
                    param_dtype=param_dtype, name=name,
                    kernel_init=nn.initializers.xavier_uniform())


class SAGEConv(nn.Module):
    """GraphSAGE mean-aggregation conv (PyG SAGEConv semantics:
    out = lin_l(mean_{j∈N(i)} x_j) + lin_r(x_i); bias only in lin_l)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_target, edge: EdgeBlock, out_cap: int):
        agg = _agg(x, edge, out_cap, mean=True)
        out = _dense(self.features, self.use_bias, self.dtype,
                     self.param_dtype, "lin_l")(agg)
        out = out + _dense(self.features, False, self.dtype,
                           self.param_dtype, "lin_r")(x_target)
        return out


class GATConv(nn.Module):
    """Graph attention conv (PyG GATConv semantics, concat heads).

    ``add_self_loops`` mirrors PyG's default: the reference's GATConv
    receives the bipartite MFG as a SparseTensor and PyG's
    add_self_loops path calls ``set_diag`` on it (gat_conv.py), so every
    target ALSO attends to itself (input row i < T is target i under the
    prefix convention). Round-3 review item #4 flagged exactly this class
    of silent attention-normalization divergence."""

    features: int            # per-head output features
    heads: int = 1
    use_bias: bool = False
    negative_slope: float = 0.2
    add_self_loops: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_target, edge: EdgeBlock, out_cap: int):
        from ..ops.segment import segment_softmax_self

        H, C = self.heads, self.features
        w_src = _dense(H * C, False, self.dtype, self.param_dtype, "lin_src")
        xs = w_src(x).reshape(-1, H, C)
        xt = w_src(x_target).reshape(-1, H, C)
        a_src = self.param("att_src", nn.initializers.xavier_uniform(),
                           (1, H, C), self.param_dtype).astype(self.dtype)
        a_dst = self.param("att_dst", nn.initializers.xavier_uniform(),
                           (1, H, C), self.param_dtype).astype(self.dtype)
        alpha_src = (xs * a_src).sum(-1)            # [N_in, H]
        alpha_dst = (xt * a_dst).sum(-1)            # [N_out, H]
        from ..ops.gat_agg import gat_custom_agg_enabled

        if (self.add_self_loops and mxu_spmm_enabled()
                and gat_custom_agg_enabled()
                and getattr(edge, "msrc", None) is not None):
            # OPT-IN (SPTPU_GAT_CUSTOM_VJP=1): scatter-free fwd AND bwd,
            # attention recomputed in mirror order from per-target
            # (max, denom) residuals (ops/gat_agg.py). Measured SLOWER
            # than the autodiff path below on real v5e (2.6x at the
            # outer hop — see gat_custom_agg_enabled); default is the
            # autodiff backward despite its unsorted d_xs scatter.
            from ..ops.gat_agg import gat_attention_agg

            out = gat_attention_agg(
                out_cap, self.negative_slope, xs, xt,
                alpha_src.astype(jnp.float32),
                alpha_dst.astype(jnp.float32),
                edge.src, edge.dst, edge.count, edge.msrc, edge.mdst,
            ).reshape(-1, H * C).astype(self.dtype)
            if self.use_bias:
                out = out + self.param(
                    "bias", nn.initializers.zeros,
                    (H * C,), self.param_dtype).astype(self.dtype)
            return out
        logits = alpha_src[edge.src] + alpha_dst[edge.dst]   # [E, H]
        logits = nn.leaky_relu(logits, self.negative_slope)
        if self.add_self_loops:
            self_logit = nn.leaky_relu(alpha_src[:out_cap] + alpha_dst,
                                       self.negative_slope)
            att, self_att = segment_softmax_self(
                logits.astype(jnp.float32), edge.dst, edge.count, out_cap,
                self_logit.astype(jnp.float32),
                sorted_dst=True)  # sampler layout → scan-based
            att = att.astype(self.dtype)
        else:
            att = masked_segment_softmax(
                logits.astype(jnp.float32), edge.dst, edge.count, out_cap,
                sorted_dst=True,
            ).astype(self.dtype)                    # [E, H]
            self_att = None
        msg = xs[edge.src] * att[:, :, None]        # [E, H, C]
        if mxu_spmm_enabled():
            # scatter-free forward; dst is target-grouped with pads ==
            # out-level cap (the sampler layout), exactly the kernel's
            # contract — backward is a masked gather
            from ..ops.mxu_segment import sorted_segment_sum

            out = sorted_segment_sum(
                out_cap, msg.reshape(-1, H * C), edge.dst).astype(self.dtype)
        else:
            out = masked_segment_sum(
                msg.reshape(-1, H * C), edge.dst, edge.count, out_cap)
        if self_att is not None:
            out = out + (xt * self_att.astype(self.dtype)[:, :, None]
                         ).reshape(-1, H * C)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (H * C,), self.param_dtype).astype(self.dtype)
        return out


class GINConv(nn.Module):
    """Graph isomorphism conv: mlp((1+eps)·x_i + Σ_{j∈N(i)} x_j).

    The MLP is the exact shape the reference wraps in every GINConv
    (driver/models.py:249-261): Linear → BN → ReLU → Linear → ReLU,
    with the BN masked to the valid row prefix.
    """

    features: int
    eps: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_target, edge: EdgeBlock, out_cap: int,
                 valid_count=None, training: bool = False):
        agg = _agg(x, edge, out_cap, mean=False)
        h = (1.0 + self.eps) * x_target + agg.astype(x.dtype)
        h = _dense(self.features, True, self.dtype, self.param_dtype,
                   "fc0")(h)
        h = MaskedBatchNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="bn")(h, valid_count,
                                       use_running_average=not training)
        h = nn.relu(h)
        h = _dense(self.features, True, self.dtype, self.param_dtype,
                   "fc1")(h)
        return nn.relu(h)


class GCNConv(nn.Module):
    """PyG GCNConv with normalize=False, bias=False as instantiated by the
    reference (driver/models.py:345): out = Σ_{j∈N(i)} (x W)_j, computed
    over the *input* node set (the reference passes the full x, not a
    bipartite pair — rows without in-edges come out zero)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge: EdgeBlock, out_rows: int):
        h = _dense(self.features, False, self.dtype, self.param_dtype,
                   "lin")(x)
        return _agg(h, edge, out_rows, mean=False).astype(h.dtype)


class ARMAConv(nn.Module):
    """ARMA_1 conv (1 stack, 1 layer, unshared weights, as the reference
    instantiates at driver/models.py:391-436 — flagged broken there,
    driver/main.py:93; provided for API parity):
    out = act( norm_adj · (x W) + dropout(x) V ), over the input node set,
    with symmetric degree normalization computed on the batch subgraph."""

    features: int
    dropout: float = 0.5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge: EdgeBlock, out_rows: int,
                 training: bool = False):
        mask = valid_mask(edge.dst.shape[0], edge.count)
        ones = mask.astype(self.dtype)
        deg_dst = masked_segment_sum(ones, edge.dst, edge.count, out_rows)
        deg_src = masked_segment_sum(ones, edge.src, edge.count, x.shape[0])
        inv_sqrt_dst = jax.lax.rsqrt(jnp.maximum(deg_dst, 1.0))
        inv_sqrt_src = jax.lax.rsqrt(jnp.maximum(deg_src, 1.0))
        h = _dense(self.features, False, self.dtype, self.param_dtype,
                   "w")(x)
        msg = gather_rows(h * inv_sqrt_src[:, None], edge.src)
        prop = masked_segment_sum(msg, edge.dst, edge.count, out_rows)
        prop = prop * inv_sqrt_dst[:, None]
        root = nn.Dropout(self.dropout, deterministic=not training)(x)
        root = _dense(self.features, False, self.dtype, self.param_dtype,
                      "v")(root)
        out = jnp.zeros((x.shape[0], self.features), self.dtype)
        out = out.at[:out_rows].set(prop)
        return nn.relu(out + root)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid row prefix only.

    The reference's BatchNorm1d sees exactly the real rows (batches are
    dynamic); with padding, unmasked statistics would be polluted by
    garbage rows, so mean/var are computed over rows < valid_count.
    Torch-compatible defaults (momentum 0.1 torch-style, eps 1e-5).
    """

    momentum: float = 0.9   # decay of the running stat (torch momentum=0.1)
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_count=None, use_running_average: bool = True):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if valid_count is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                mean = xf.mean(0)
                var = ((xf - mean) ** 2).mean(0)
            else:
                m = valid_mask(x.shape[0], valid_count).astype(jnp.float32)
                n = jnp.maximum(m.sum(), 1.0)
                mean = (xf * m[:, None]).sum(0) / n
                var = (((xf - mean) ** 2) * m[:, None]).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                # torch tracks unbiased running var
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Reference MLP helper (driver/models.py:95-125): Linear(+BN)(+act)
    stacks; ``end_up_with_fc`` drops BN/act after every layer."""

    hidden_dim: int
    embed_dim: int
    num_layers: int
    act: str = "relu"
    bn: bool = False
    end_up_with_fc: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_count=None, training: bool = False):
        acts = {"relu": nn.relu,
                "leakyrelu": lambda v: nn.leaky_relu(v, 0.01)}
        act = acts[self.act.lower()]
        for i in range(self.num_layers):
            d_out = (self.embed_dim if i == self.num_layers - 1
                     else self.hidden_dim)
            x = _dense(d_out, self.use_bias, self.dtype, self.param_dtype,
                       f"fc{i}")(x)
            if self.end_up_with_fc:
                continue
            if self.bn:
                x = MaskedBatchNorm(dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"bn{i}")(
                    x, valid_count, use_running_average=not training)
            x = act(x)
        return x
