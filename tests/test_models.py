import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salient_plusplus_tpu.models import MODEL_REGISTRY, make_model
from salient_plusplus_tpu.sampling import BatchSpec, multilayer_sample_np, pad_sample


@pytest.fixture(scope="module")
def batch_and_x(small_graph):
    g = small_graph
    seeds = g.split_idx["train"][:32]
    fanouts = [5, 3]
    spec = BatchSpec.worst_case(32, fanouts)
    s = multilayer_sample_np(g.rowptr, g.col, seeds, fanouts,
                             np.random.default_rng(0))
    b = pad_sample(s, spec, g.y)
    x = jnp.asarray(np.asarray(g.x, np.float32)[np.asarray(b.n_id)])
    return g, b, x


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_model_forward_all(name, batch_and_x):
    g, b, x = batch_and_x
    model = make_model(name, g.num_features, 32, g.num_classes, 2)
    variables = model.init(jax.random.key(0), x, b, training=False)
    out = model.apply(variables, x, b, training=False)
    assert out.shape[0] == b.spec.seed_cap
    assert out.dtype == jnp.float32
    n = int(b.seed_count)
    valid = np.asarray(out)[:n]
    assert np.isfinite(valid).all()
    if name != "ARMA":  # reference-broken model keeps hidden width
        assert out.shape[1] == g.num_classes
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(valid).sum(-1), 1.0, atol=1e-3)


@pytest.mark.parametrize("name", ["SAGE", "GIN", "SAGEResInception", "JKNet"])
def test_model_train_mode_mutates_stats(name, batch_and_x):
    g, b, x = batch_and_x
    model = make_model(name, g.num_features, 32, g.num_classes, 2)
    variables = model.init(jax.random.key(0), x, b, training=False)
    out, updates = model.apply(
        variables, x, b, training=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)[: int(b.seed_count)]).all()
    if "batch_stats" in variables:
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_sage_matches_numpy_oracle(batch_and_x):
    """SAGE forward vs an independent numpy implementation of
    mean-SAGEConv, using the flax params."""
    g, b, x = batch_and_x
    model = make_model("SAGE", g.num_features, 16, g.num_classes, 2,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(2), x, b, training=False)
    out = np.asarray(model.apply(variables, x, b, training=False))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    xs = np.asarray(x, np.float64)
    L = 2
    h = xs
    for i in range(L):
        eb = b.edges[i]
        out_cap = b.spec.node_caps[L - i - 1]
        e = int(eb.count)
        dst, src = np.asarray(eb.dst[:e]), np.asarray(eb.src[:e])
        agg = np.zeros((out_cap, h.shape[1]))
        deg = np.zeros(out_cap)
        np.add.at(agg, dst, h[src])
        np.add.at(deg, dst, 1)
        agg /= np.maximum(deg, 1)[:, None]
        W_l = p[f"conv{i}"]["lin_l"]["kernel"]
        W_r = p[f"conv{i}"]["lin_r"]["kernel"]
        h = agg @ W_l + h[:out_cap] @ W_r
        if i != L - 1:
            h = np.maximum(h, 0)
    logp = h - np.log(np.exp(h).sum(-1, keepdims=True))
    n = int(b.seed_count)
    np.testing.assert_allclose(out[:n], logp[: b.spec.seed_cap][:n],
                               rtol=2e-4, atol=2e-4)


def test_model_jit_and_grad(batch_and_x):
    g, b, x = batch_and_x
    model = make_model("SAGE", g.num_features, 32, g.num_classes, 2)
    variables = model.init(jax.random.key(0), x, b, training=False)

    @jax.jit
    def loss_fn(params, x, batch):
        out = model.apply({"params": params}, x, batch, training=False)
        n = batch.seed_count
        mask = (jax.lax.broadcasted_iota(jnp.int32, (batch.spec.seed_cap,), 0)
                < n)
        nll = -jnp.take_along_axis(out, batch.y[:, None], axis=-1)[:, 0]
        return jnp.where(mask, nll, 0).sum() / n

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"], x, b)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g_)).all() for g_ in flat)
    assert any(np.abs(np.asarray(g_)).sum() > 0 for g_ in flat)
