"""Train state: params + optimizer + BN stats + PRNG + progress counters.

The reference checkpoints only the model state_dict (driver/main.py:201-211);
this state carries everything needed for true resume (optimizer moments,
PRNG key, epoch/step) — the gap SURVEY.md §5.4 flags. Orbax handles the
(optionally async, multi-host) checkpoint IO in train/checkpoint.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    dropout_key: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
        )


def get_learning_rate(state: "TrainState") -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: "TrainState", lr: float) -> "TrainState":
    """Functionally update the injected learning-rate hyperparameter
    (Adam moments untouched — ReduceLROnPlateau semantics)."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_opt = state.opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=new_opt)


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch ReduceLROnPlateau parity as the
    reference configures it: factor 0.8, stepped with the epoch's
    cross-rank mean loss — fast_trainer/train.py:351-356)."""

    def __init__(self, factor: float = 0.8, patience: int = 10,
                 min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, state: "TrainState", loss: float) -> "TrainState":
        if loss < self.best - 1e-8:
            self.best = loss
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            new_lr = max(self.min_lr,
                         get_learning_rate(state) * self.factor)
            return set_learning_rate(state, new_lr)
        return state


def create_train_state(model, example_x, example_batch, lr: float,
                       seed: int = 0,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    """Init params with a throwaway forward (reference resets Adam fresh per
    trial, driver/drivers/base.py:254-263 — same here via fresh opt_state)."""
    init_key, dropout_key = jax.random.split(jax.random.key(seed))
    variables = model.init(init_key, example_x, example_batch, training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    # inject_hyperparams keeps the learning rate as optimizer state so the
    # plateau scheduler can scale it without resetting Adam moments
    tx = tx if tx is not None else optax.inject_hyperparams(optax.adam)(
        learning_rate=lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        dropout_key=dropout_key,
        tx=tx,
        apply_fn=model.apply,
    )
