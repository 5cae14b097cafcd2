"""Checkpoint save/restore with best-copy semantics
(reference: utils.py:34-42 save_checkpoint; cifar.py:415-430 resume).

Serialized with flax msgpack; stores {epoch, best_acc, params,
batch_stats, opt_state}.  '<Model>_last_ckpt' plus a '<Model>_best_ckpt'
copy when the accuracy improves.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Tuple

from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "restore_state"]


def save_checkpoint(state, model_name: str, save_dir: str, epoch: int,
                    best_acc: float, is_best: bool,
                    keep_epoch_file: bool = False) -> str:
    os.makedirs(save_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "best_acc": float(best_acc),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": int(state.step),
    }
    path = os.path.join(save_dir, f"{model_name}_last_ckpt")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    if keep_epoch_file:
        shutil.copyfile(path, os.path.join(save_dir,
                                           f"{model_name}_ckpt_{epoch}"))
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir,
                                           f"{model_name}_best_ckpt"))
    return path


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def restore_state(path: str, state) -> Tuple[Any, int, float]:
    """Restore a TrainState from a checkpoint file; returns
    (state, start_epoch, best_acc)."""
    template = {
        "epoch": 0,
        "best_acc": 0.0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": 0,
    }
    payload = load_checkpoint(path, template)
    state = state.replace(params=payload["params"],
                          batch_stats=payload["batch_stats"],
                          opt_state=payload["opt_state"],
                          step=payload["step"])
    return state, int(payload["epoch"]), float(payload["best_acc"])
