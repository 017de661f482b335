"""Checkpoint / resume via Orbax.

Extends the reference's model-only best-checkpointing
(driver/main.py:201-211: state_dict + metadata.txt) to full train state
(params, optimizer moments, BN stats, PRNG key, step/epoch) so training can
actually resume — the gap called out in SURVEY.md §5.4. Metadata lines are
kept reference-compatible (``epoch,acc`` appended per improvement).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_path(directory: str, trial: int, epoch: int) -> str:
    return os.path.join(os.path.abspath(directory),
                        f"model_{trial}_{epoch}")


_ASYNC_SAVER: Optional[ocp.AsyncCheckpointer] = None


def _async_saver() -> ocp.AsyncCheckpointer:
    global _ASYNC_SAVER
    if _ASYNC_SAVER is None:
        _ASYNC_SAVER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_SAVER


def save(directory: str, state: TrainState, trial: int, epoch: int,
         acc: Optional[float] = None, use_async: bool = False) -> str:
    """Checkpoint the full train state. ``use_async=True`` returns as soon
    as the on-device state is snapshotted; IO overlaps the next epoch
    (Orbax async multi-host checkpointing — the §5.4 upgrade over the
    reference's blocking torch.save)."""
    os.makedirs(directory, exist_ok=True)
    path = _ckpt_path(directory, trial, epoch)
    if use_async:
        saver = _async_saver()
        saver.save(path, args=ocp.args.StandardSave(_saveable(state)),
                   force=True)
    else:
        with ocp.StandardCheckpointer() as saver:
            saver.save(path, _saveable(state), force=True)
    if acc is not None:
        with open(os.path.join(directory, "metadata.txt"), "a") as f:
            # trial-qualified (the reference's 2-field `epoch,acc` lines
            # mix trials together; best_epoch() parses both forms)
            f.write(f"{trial},{epoch},{acc}\n")
    return path


def wait_for_async_saves() -> None:
    if _ASYNC_SAVER is not None:
        _ASYNC_SAVER.wait_until_finished()


def _saveable(state: TrainState):
    return {
        "step": state.step,
        "epoch": state.epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "dropout_key": jax.random.key_data(state.dropout_key),
    }


def restore(directory: str, state: TrainState, trial: int,
            epoch: int) -> TrainState:
    """Restore into a template state (shapes/treedef must match)."""
    path = _ckpt_path(directory, trial, epoch)
    template = _saveable(state)
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(path, template)
    return state.replace(
        step=restored["step"],
        epoch=restored["epoch"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        dropout_key=jax.random.wrap_key_data(restored["dropout_key"]),
    )


def latest_epoch(directory: str, trial: int = 0) -> Optional[int]:
    """Highest checkpointed epoch for a trial (resume-from-latest)."""
    if not os.path.isdir(directory):
        return None
    best = None
    prefix = f"model_{trial}_"
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                e = int(name[len(prefix):])
            except ValueError:
                continue
            best = e if best is None else max(best, e)
    return best


def best_epoch(directory: str, trial: int = 0) -> Optional[int]:
    """Parse metadata.txt for THIS trial's best-acc epoch (reference reads
    it for its final-inference reload, driver/main.py:220-235 — but its
    2-field lines mix trials; we write `trial,epoch,acc` and accept the
    legacy 2-field form as trial 0)."""
    meta = os.path.join(directory, "metadata.txt")
    if not os.path.exists(meta):
        return None
    best, best_acc = None, -1.0
    with open(meta) as f:
        for line in f:
            parts = line.strip().split(",")
            t, e, a = (0, *parts) if len(parts) == 2 else parts
            if int(t) != trial:
                continue
            if float(a) > best_acc:
                best, best_acc = int(e), float(a)
    return best
