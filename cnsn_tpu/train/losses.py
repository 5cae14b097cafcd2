"""Losses: cross-entropy and the JSD consistency regularizer.

Parity with the reference's loss math (cifar.py:173-186, 239-245;
imagenet.py:373-380): softmax over (clean, aug1, aug2); mixture
clamped to [1e-7, 1] before log; mean of three batchmean-KL terms;
cross-entropy computed on clean logits only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy", "jsd_consistency", "softmax_probs", "error_topk"]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch (torch F.cross_entropy default reduction)."""
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def softmax_probs(logits: jax.Array) -> jax.Array:
    return jax.nn.softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)


def _kl_batchmean(p: jax.Array, log_q: jax.Array) -> jax.Array:
    """torch F.kl_div(log_q, p, reduction='batchmean') =
    sum(p * (log p - log q)) / B, with 0·log0 := 0."""
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.sum(plogp - p * log_q) / p.shape[0]


def jsd_consistency(p_clean: jax.Array, p_aug1: jax.Array,
                    p_aug2: jax.Array) -> jax.Array:
    """Jensen-Shannon-style consistency among three predicted
    distributions (AugMix JSD).  Inputs are probabilities."""
    p_mix = jnp.clip((p_clean + p_aug1 + p_aug2) / 3.0, 1e-7, 1.0)
    log_mix = jnp.log(p_mix)
    return (_kl_batchmean(p_clean, log_mix)
            + _kl_batchmean(p_aug1, log_mix)
            + _kl_batchmean(p_aug2, log_mix)) / 3.0


def error_topk(logits: jax.Array, labels: jax.Array, k: int = 1) -> jax.Array:
    """Top-k error in percent (imagenet.py:107-122 ``error``)."""
    topk = jnp.argsort(-logits, axis=-1)[:, :k]
    correct = jnp.any(topk == labels[:, None], axis=-1)
    return 100.0 * (1.0 - jnp.mean(correct.astype(jnp.float32)))
