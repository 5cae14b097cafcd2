"""Learning-rate schedules, matching the reference drivers.

  * per-step cosine annealing to an absolute floor of 1e-6
    (cifar.py:87-90,408-413);
  * ImageNet step decay ÷10 every epochs//3 with linear batch-size lr
    scaling (imagenet.py:92-104);
  * polynomial decay for segmentation (segmentation/util/util.py poly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _stepf(step):
    """Step index as the canonical float dtype (f32 normally; f64 under
    x64 so lockstep parity tests aren't limited by f32 LR rounding)."""
    return jnp.asarray(step, jax.dtypes.canonicalize_dtype(jnp.float64))

__all__ = ["cosine_lr", "imagenet_step_lr", "poly_lr"]


def cosine_lr(base_lr: float, total_steps: int, lr_min: float = 1e-6):
    """lr(step) = lr_min + (base−lr_min)/... — exactly the reference's
    LambdaLR(get_lr(step, total, 1, 1e-6/base)) · base."""

    def schedule(step):
        frac = 1e-6 / base_lr
        mult = frac + (1.0 - frac) * 0.5 * (1.0 + jnp.cos(
            _stepf(step) / total_steps * jnp.pi))
        return base_lr * mult

    return schedule


def imagenet_step_lr(base_lr: float, epochs: int, batch_size: int,
                     steps_per_epoch: int):
    """÷10 at epochs//3 and 2·epochs//3; lr linearly scaled by batch/256."""
    b = batch_size / 256.0
    k = max(epochs // 3, 1)

    def schedule(step):
        # reference caps the multiplier at 0.01 (imagenet.py:92-104:
        # m = 1 / 0.1 / 0.01 for epoch < k / < 2k / else) — a 3-level
        # staircase, NOT unbounded 0.1**(epoch//k) decay.
        epoch = step // steps_per_epoch
        return base_lr * b * jnp.power(0.1, jnp.minimum(epoch // k, 2))

    return schedule


def poly_lr(base_lr: float, max_iter: int, power: float = 0.9):
    """Per-iteration poly decay (segmentation/util/util.py:102-105).

    The reference assigns ``poly(i+1)`` AFTER ``optimizer.step()``
    (train_cnsn.py:319-349), so that LR only takes effect at the NEXT
    update; with the optimizer constructed at ``base_lr``
    (train_cnsn.py:148-158), 0-based update ``s`` therefore runs at
    ``poly(s)`` with ``poly(0) = base_lr`` — exactly optax's 0-based
    schedule count.  (No +1: shifting would both skip the base-LR first
    update and waste the final update at lr=0.)"""
    def schedule(step):
        return base_lr * (1.0 - _stepf(step) / max_iter) ** power

    return schedule


def step_lr(base_lr: float, step_epoch: int, steps_per_epoch: int,
            multiplier: float = 0.1):
    """÷10 every ``step_epoch`` epochs (segmentation/util/util.py
    step_learning_rate)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * multiplier ** (epoch // step_epoch)

    return schedule
