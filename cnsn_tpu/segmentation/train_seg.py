"""Segmentation training: jitted steps, poly LR with 10x head groups,
ignore-aware CE, and histogram mIoU metrics.

Parity with the reference trainer (segmentation/tool/train_cnsn.py):
  * loss = CE(main) + aux_weight·CE(aux), ignore_label masked
    (:317-321, aux_weight 0.4 from gtav yaml);
  * poly lr per iteration, 10x for the head param groups
    (:345-349, util.py poly_learning_rate);
  * per-batch Bernoulli(mix_prob) toggles the CrossNorm aug forward
    (:305-311) — here two jitted programs selected on host;
  * metrics via intersection/union histograms reduced across devices
    (util.py intersectionAndUnionGPU + dist.all_reduce → psum by GSPMD).
"""
from __future__ import annotations

import inspect
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.training import train_state

from ..train.schedules import poly_lr

__all__ = ["SegTrainState", "make_seg_optimizer", "SegStepFns",
           "masked_cross_entropy", "masked_nll_sum", "seg_metrics"]


class SegTrainState(train_state.TrainState):
    batch_stats: Any = None


def masked_nll_sum(logits: jax.Array, labels: jax.Array,
                   ignore_label: int = 255):
    """(sum of per-pixel NLL over non-ignored pixels, valid count) —
    the single home of the ignore-masked CE math; mean (train loss) and
    sum (device-accumulated eval) call sites both build on it."""
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)), jnp.sum(valid)


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         ignore_label: int = 255) -> jax.Array:
    """Mean CE over non-ignored pixels (torch CrossEntropyLoss
    ignore_index semantics)."""
    nll_sum, n_valid = masked_nll_sum(logits, labels, ignore_label)
    return nll_sum / jnp.maximum(n_valid, 1)


def seg_metrics(pred: jax.Array, target: jax.Array, num_classes: int,
                ignore_label: int = 255):
    """(intersection, union, target_area) histograms, each (K,) —
    reference util.py intersectionAndUnionGPU."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    pred = jnp.where(target == ignore_label, ignore_label, pred)
    match = pred == target

    def hist(v, mask):
        oh = jax.nn.one_hot(v, num_classes, dtype=jnp.float32)
        return jnp.sum(oh * mask[:, None].astype(jnp.float32), axis=0)

    inter = hist(pred, match & (pred != ignore_label))
    area_p = hist(pred, pred != ignore_label)
    area_t = hist(target, target != ignore_label)
    return inter, area_p + area_t - inter, area_t


def make_seg_optimizer(params, base_lr: float, max_iter: int,
                       power: float = 0.9, momentum: float = 0.9,
                       weight_decay: float = 1e-4,
                       head_prefixes: Tuple[str, ...] = (
                           "classifier", "aux_classifier",
                           "ppm", "cls", "aux", "psa", "psa_reduce",
                           "psa_bn", "psa_attn")):
    """SGD + poly schedule; head param groups get 10x lr (applied after
    the momentum trace, matching torch per-group lr)."""
    sched = poly_lr(base_lr, max_iter, power)
    head_scale = optax.masked(optax.scale(10.0),
                              lambda p: label_mask(p, head_prefixes))
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_schedule(lambda step: -sched(step)),
        head_scale,
    )


def label_mask(params, head_prefixes):
    flat = traverse_util.flatten_dict(params)
    mask = {k: (k[0] in head_prefixes) for k in flat}
    return traverse_util.unflatten_dict(mask)


class SegStepFns:
    """Jitted train/eval steps bound to one FCNCNSN model."""

    def __init__(self, model, *, num_classes: int, active_num: int = 1,
                 aux_weight: float = 0.4, ignore_label: int = 255,
                 donate: bool = False, lowres_ce: Optional[bool] = None):
        self.model = model
        self.num_classes = num_classes
        self.active_num = active_num
        self.aux_weight = aux_weight
        self.ignore_label = ignore_label
        self.cn_num = model.cn_num
        # class-major fused upsample+CE (segmentation/upsample.py):
        # avoids the lane-padded full-res class-minor logits (43% of
        # the 713² step, perf/r3_seg_trace.txt).  Default ON — measured
        # 23.15 → 41.1 img/s (+78%) at the gtav recipe shape
        # (perf/r3_seg_ce.jsonl); CNSN_SEG_CE=resize restores the
        # jax.image.resize NHWC path.  Only for models whose __call__
        # accepts upsample=.
        if lowres_ce is None:
            lowres_ce = (os.environ.get("CNSN_SEG_CE", "matmul") == "matmul")
        self.lowres_ce = bool(lowres_ce and hasattr(model, "apply")
                              and "upsample" in inspect.signature(
                                  type(model).__call__).parameters)
        # FCN resizes half-pixel (jax.image.resize); PSP/PSA heads use
        # torch align_corners=True — the fused matrices must match
        self.align_corners = bool(getattr(model, "UPSAMPLE_ALIGN_CORNERS",
                                          False))
        dn = (0,) if donate else ()
        self.plain = jax.jit(self._make_step(False), donate_argnums=dn)
        self.aug = jax.jit(self._make_step(True), donate_argnums=dn)
        self.eval_step = jax.jit(self._eval)
        self.eval_sum = jax.jit(self._eval_sum)

    def _make_step(self, aug: bool):
        def step(state, images, labels, rng):
            masks = (None, None)
            if aug:
                k_mask, rng = jax.random.split(rng)
                if self.cn_num > 0:
                    from ..train.steps import sample_cn_mask
                    cn_mask = sample_cn_mask(k_mask, self.cn_num,
                                             self.active_num)
                else:
                    cn_mask = None
                img_on = jnp.asarray(True) if self.model.has_img_cn else None
                masks = (cn_mask, img_on)

            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                kw = {"upsample": False} if self.lowres_ce else {}
                (out, auxl), mut = self.model.apply(
                    variables, images, True, masks[0], masks[1],
                    rngs={"crossnorm": rng,
                          "dropout": jax.random.fold_in(rng, 11)},
                    mutable=["batch_stats"], **kw)
                main = self._ce(out, labels)
                aux_loss = self._ce(auxl, labels)
                loss = main + self.aux_weight * aux_loss
                return loss, (mut["batch_stats"], out, main, aux_loss)

            (loss, (stats, out, main, aux_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=stats)
            pred = self._pred(out, labels)
            inter, union, target = seg_metrics(pred, labels,
                                               self.num_classes,
                                               self.ignore_label)
            return state, {"loss": loss, "main_loss": main,
                           "aux_loss": aux_loss, "intersection": inter,
                           "union": union, "target": target}

        return step

    def _ce(self, logits, labels):
        """Mean masked CE; class-major fused upsample+CE when the step
        runs on low-res head logits."""
        if self.lowres_ce:
            from .upsample import upsample_nll_sum
            s, n = upsample_nll_sum(logits, labels, self.ignore_label,
                                    self.align_corners)
            return s / jnp.maximum(n, 1)
        return masked_cross_entropy(logits, labels, self.ignore_label)

    def _pred(self, logits, labels):
        if self.lowres_ce:
            from .upsample import upsample_argmax
            return upsample_argmax(logits, labels.shape[1],
                                   labels.shape[2], self.align_corners)
        return jnp.argmax(logits, axis=-1)

    def _eval(self, state, images, labels):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        kw = {"upsample": False} if self.lowres_ce else {}
        out, auxl = self.model.apply(variables, images, False, None, None,
                                     **kw)
        loss = self._ce(out, labels)
        pred = self._pred(out, labels)
        inter, union, target = seg_metrics(pred, labels, self.num_classes,
                                           self.ignore_label)
        return {"loss": loss, "pred": pred, "intersection": inter,
                "union": union, "target": target}

    def _eval_sum(self, state, images, labels):
        """Padding-aware summing eval: results are device-side SUMS so
        the whole val loader accumulates on device and costs one host
        sync (the pattern evaluation/classify.py::evaluate ships for
        classification).  Padded rows carry all-ignore_label labels and
        contribute nothing to any sum (reference per-batch validate:
        segmentation/tool/train_cnsn.py:388-451)."""
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        kw = {"upsample": False} if self.lowres_ce else {}
        out, _ = self.model.apply(variables, images, False, None, None, **kw)
        if self.lowres_ce:
            from .upsample import upsample_nll_sum
            nll_sum, n_valid = upsample_nll_sum(out, labels,
                                                self.ignore_label,
                                                self.align_corners)
        else:
            nll_sum, n_valid = masked_nll_sum(out, labels,
                                              self.ignore_label)
        pred = self._pred(out, labels)
        inter, union, target = seg_metrics(pred, labels, self.num_classes,
                                           self.ignore_label)
        return {"nll_sum": nll_sum,
                "valid_px": n_valid.astype(jnp.float32),
                "intersection": inter, "union": union, "target": target}
