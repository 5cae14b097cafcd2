"""Jitted train/eval steps for the reference's training regimes.

Each regime of the reference drivers becomes a pair of XLA programs
selected host-side by the stochastic CN gate (SURVEY §7: two jitted
step functions instead of a lax.cond over the whole model):

  CIFAR (cifar.py):
    plain          — train            (:93-114)
    cn             — train_cn         (:117-145): aug forward w/ random
                     active-site mask
    cn_consistency — train_cn_consistency (:148-208): clean CE + 2 aug
                     forwards + consist_wt·JSD
    cn_augmix      — train_cn_augmix  (:211-272): 3-view forward + 12·JSD
                     (+ gated 2 aug forwards + consist_wt·JSD)

  ImageNet (imagenet.py): image-space CrossNorm on the input batch
    cn_image          (:195-250)
    cn_image_consist  (:253-334)
    cn_image_augmix   (:337-406): CN applied to the whole 3B concat

The per-batch Bernoulli(cn_prob) gate stays on host (numpy), matching
the reference's np.random.rand gate; everything else is device-side
jax.random threaded through the step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..ops.crossnorm import cross_norm_2ins
from .losses import cross_entropy, error_topk, jsd_consistency, softmax_probs

__all__ = ["TrainState", "create_train_state", "sample_cn_mask", "StepFns"]


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, rng, input_shape, tx) -> TrainState:
    x = jnp.zeros(input_shape, jnp.float32)
    rngs = {"params": rng, "crossnorm": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    variables = model.init(rngs, x, False, None)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx)


def sample_cn_mask(key: jax.Array, cn_num: int, active_num: int) -> jax.Array:
    """Boolean mask with exactly ``active_num`` of ``cn_num`` sites on,
    sampled without replacement (reference _enable_cross_norm,
    e.g. models/cifar/wideresnet_cnsn.py:199-203)."""
    perm = jax.random.permutation(key, cn_num)
    return jnp.zeros((cn_num,), bool).at[perm[:active_num]].set(True)


def make_sgd(schedule, momentum: float = 0.9, weight_decay: float = 5e-4,
             nesterov: bool = True) -> optax.GradientTransformation:
    """torch.optim.SGD parity: L2 decay added to the gradient *before*
    the momentum buffer (decay applies to every parameter, BN included,
    as in the reference)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum,
                  nesterov=nesterov))


class StepFns:
    """Jitted step functions bound to one model + knob set."""

    def __init__(self, model, *, active_num: int = 1,
                 consist_wt: float = 0.0, image_crop: str = "neither",
                 image_beta: float = 1.0, num_groups: int = 1,
                 jsd_wt: float = 12.0, donate: bool = False):
        self.model = model
        self.cn_num = getattr(model, "cn_num", 0)
        self.active_num = active_num
        self.consist_wt = consist_wt
        self.image_crop = image_crop
        self.image_beta = image_beta
        self.num_groups = num_groups
        # AugMix JSD weight — the reference hardcodes 12 (cifar.py:246,
        # imagenet.py:373); a knob here so harnesses can mutate it
        self.jsd_wt = jsd_wt

        # donate=True invalidates the input state each call (use in the
        # steady-state train loop / bench for buffer reuse on HBM).
        dn = (0,) if donate else ()
        self.plain = jax.jit(self._plain, donate_argnums=dn)
        self.cn = jax.jit(self._cn, donate_argnums=dn)
        self.cn_consistency = jax.jit(self._cn_consistency, donate_argnums=dn)
        self.augmix = jax.jit(self._augmix, donate_argnums=dn)
        self.augmix_cn = jax.jit(self._augmix_cn, donate_argnums=dn)
        self.cn_image = jax.jit(self._cn_image, donate_argnums=dn)
        self.cn_image_consist = jax.jit(self._cn_image_consist, donate_argnums=dn)
        self.cn_image_augmix = jax.jit(self._cn_image_augmix, donate_argnums=dn)
        self.augmix_plain = self.augmix  # same program (no-CN AugMix)
        self.eval_step = jax.jit(self._eval)
        self.eval_sum = jax.jit(self._eval_sum)

    # ----- forward helpers ---------------------------------------------

    def _apply(self, params, batch_stats, images, mask, rng):
        """One train-mode forward; returns (logits, new_batch_stats)."""
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"crossnorm": rng, "dropout": jax.random.fold_in(rng, 17)}
        logits, mut = self.model.apply(
            variables, images, True, mask, rngs=rngs, mutable=["batch_stats"])
        return logits, mut["batch_stats"]

    def _finish(self, state: TrainState, grads, new_stats, metrics):
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    def _image_cn(self, images, rng):
        return cross_norm_2ins(images, rng, crop=self.image_crop,
                               beta=self.image_beta,
                               num_groups=self.num_groups)

    # ----- regimes ------------------------------------------------------

    def _plain(self, state, images, labels, rng):
        def loss_fn(params):
            logits, stats = self._apply(params, state.batch_stats, images,
                                        None, rng)
            loss = cross_entropy(logits, labels)
            return loss, (stats, logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss,
                             "err1": error_topk(logits, labels, 1)})

    def _cn(self, state, images, labels, rng):
        k_mask, k_fwd = jax.random.split(rng)
        mask = sample_cn_mask(k_mask, self.cn_num, self.active_num)

        def loss_fn(params):
            logits, stats = self._apply(params, state.batch_stats, images,
                                        mask, k_fwd)
            loss = cross_entropy(logits, labels)
            return loss, (stats, logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss,
                             "err1": error_topk(logits, labels, 1)})

    def _cn_consistency(self, state, images, labels, rng):
        k1m, k1f, k2m, k2f, kc = jax.random.split(rng, 5)
        mask1 = sample_cn_mask(k1m, self.cn_num, self.active_num)
        mask2 = sample_cn_mask(k2m, self.cn_num, self.active_num)

        def loss_fn(params):
            logits_clean, s1 = self._apply(params, state.batch_stats, images,
                                           None, kc)
            logits_a1, s2 = self._apply(params, s1, images, mask1, k1f)
            logits_a2, s3 = self._apply(params, s2, images, mask2, k2f)
            ce = cross_entropy(logits_clean, labels)
            jsd = jsd_consistency(softmax_probs(logits_clean),
                                  softmax_probs(logits_a1),
                                  softmax_probs(logits_a2))
            loss = ce + self.consist_wt * jsd
            return loss, (s3, logits_clean, ce, jsd)

        (loss, (stats, logits, ce, jsd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss, "ce": ce, "jsd": jsd,
                             "err1": error_topk(logits, labels, 1)})

    def _augmix_common(self, state, images3, labels, rng, with_cn):
        """images3: (3, B, H, W, C) stacked (clean, aug1, aug2) views."""
        b = images3.shape[1]
        images_all = images3.reshape((-1,) + images3.shape[2:])

        if with_cn:
            k1m, k1f, k2m, k2f, kc = jax.random.split(rng, 5)
            mask1 = sample_cn_mask(k1m, self.cn_num, self.active_num)
            mask2 = sample_cn_mask(k2m, self.cn_num, self.active_num)
        else:
            kc = rng

        def loss_fn(params):
            logits_all, stats = self._apply(params, state.batch_stats,
                                            images_all, None, kc)
            lc, l1, l2 = (logits_all[:b], logits_all[b:2 * b],
                          logits_all[2 * b:])
            ce = cross_entropy(lc, labels)
            p_clean = softmax_probs(lc)
            jsd = jsd_consistency(p_clean, softmax_probs(l1),
                                  softmax_probs(l2))
            loss = ce + self.jsd_wt * jsd
            if with_cn:
                lcn1, stats = self._apply(params, stats, images3[0], mask1, k1f)
                lcn2, stats = self._apply(params, stats, images3[0], mask2, k2f)
                cn_jsd = jsd_consistency(p_clean, softmax_probs(lcn1),
                                         softmax_probs(lcn2))
                loss = loss + self.consist_wt * cn_jsd
            return loss, (stats, lc, ce, jsd)

        (loss, (stats, logits, ce, jsd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss, "ce": ce, "jsd": jsd,
                             "err1": error_topk(logits, labels, 1)})

    def _augmix(self, state, images3, labels, rng):
        return self._augmix_common(state, images3, labels, rng, False)

    def _augmix_cn(self, state, images3, labels, rng):
        return self._augmix_common(state, images3, labels, rng, True)

    # ----- ImageNet image-space CrossNorm regimes -----------------------

    def _cn_image(self, state, images, labels, rng):
        k_cn, k_fwd = jax.random.split(rng)
        images = self._image_cn(images, k_cn)

        def loss_fn(params):
            logits, stats = self._apply(params, state.batch_stats, images,
                                        None, k_fwd)
            loss = cross_entropy(logits, labels)
            return loss, (stats, logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss,
                             "err1": error_topk(logits, labels, 1)})

    def _cn_image_consist(self, state, images, labels, rng):
        kc, ka1, ka2, kf1, kf2 = jax.random.split(rng, 5)
        images_a1 = self._image_cn(images, ka1)
        images_a2 = self._image_cn(images, ka2)

        def loss_fn(params):
            logits_clean, s1 = self._apply(params, state.batch_stats, images,
                                           None, kc)
            logits_a1, s2 = self._apply(params, s1, images_a1, None, kf1)
            logits_a2, s3 = self._apply(params, s2, images_a2, None, kf2)
            ce = cross_entropy(logits_clean, labels)
            jsd = jsd_consistency(softmax_probs(logits_clean),
                                  softmax_probs(logits_a1),
                                  softmax_probs(logits_a2))
            loss = ce + self.consist_wt * jsd
            return loss, (s3, logits_clean, ce, jsd)

        (loss, (stats, logits, ce, jsd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss, "ce": ce, "jsd": jsd,
                             "err1": error_topk(logits, labels, 1)})

    def _cn_image_augmix(self, state, images3, labels, rng):
        """CN (when gated on host) applies to the whole 3B concat
        (imagenet.py:357-358)."""
        b = images3.shape[1]
        k_cn, k_fwd = jax.random.split(rng)
        images_all = images3.reshape((-1,) + images3.shape[2:])
        images_all = self._image_cn(images_all, k_cn)

        def loss_fn(params):
            logits_all, stats = self._apply(params, state.batch_stats,
                                            images_all, None, k_fwd)
            lc, l1, l2 = (logits_all[:b], logits_all[b:2 * b],
                          logits_all[2 * b:])
            ce = cross_entropy(lc, labels)
            jsd = jsd_consistency(softmax_probs(lc), softmax_probs(l1),
                                  softmax_probs(l2))
            loss = ce + self.jsd_wt * jsd
            return loss, (stats, lc, ce, jsd)

        (loss, (stats, logits, ce, jsd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return self._finish(state, grads, stats,
                            {"loss": loss, "ce": ce, "jsd": jsd,
                             "err1": error_topk(logits, labels, 1)})

    # ----- evaluation ----------------------------------------------------

    def _eval(self, state, images, labels):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = self.model.apply(variables, images, False, None)
        loss = cross_entropy(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return {"loss": loss, "correct": correct, "logits": logits}

    def _eval_sum(self, state, images, labels):
        """Sharded-eval step: labels < 0 mark padding rows (masked out).

        Returns small device scalars only — no logits — so the caller
        accumulates across batches on device and host-syncs once per
        loader instead of once per batch (reference eval loop semantics,
        cifar.py:275-289, with DataParallel batch scatter)."""
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = self.model.apply(variables, images, False, None)
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        ce = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        n = jnp.sum(valid)
        loss = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(n, 1)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) & valid)
        return {"loss": loss, "correct": correct, "n": n}
