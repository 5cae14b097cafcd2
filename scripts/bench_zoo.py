"""Secondary benchmarks across the zoo (train + serving/eval).

Prints one JSON line per entry; bench.py remains the driver's single
headline metric.  Run: python scripts/bench_zoo.py [entries...]
entries ∈ {r50_eval, wrn_train, wrn_augmix, ibn_augmix, seg_train}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, sync, iters, warmup):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def r50_eval():
    """Serving throughput: ResNet-50+CNSN eval forward, bf16, b256."""
    from cnsn_tpu.models import build_model
    model = build_model("resnet50", num_classes=1000, pos="residual",
                        cnsn_type="cnsn", crop="neither", beta=1.0,
                        dtype=jnp.bfloat16)
    x = jnp.zeros((256, 224, 224, 3), jnp.float32)
    v = model.init({"params": jax.random.key(0)}, x, False, None)
    f = jax.jit(lambda x: model.apply(v, x, False, None))
    dt = timed(lambda: f(x), lambda o: float(jnp.sum(o)), 20, 3)
    return {"metric": "resnet50_cnsn_eval_throughput",
            "value": round(256 / dt, 2), "unit": "images/sec/chip"}


def wrn_train():
    """WRN-40-2+CNSN CIFAR train step (cifar100 run-cnsn recipe knobs)."""
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd
    model = build_model("wideresnet", num_classes=100, pos="post",
                        cnsn_type="cnsn", crop="both", beta=1.0,
                        dtype=jnp.bfloat16)
    tx = make_sgd(cosine_lr(0.1, 10_000))
    state = [create_train_state(model, jax.random.key(0),
                                (1024, 32, 32, 3), tx)]
    steps = StepFns(model, active_num=2, donate=True)
    x = jnp.zeros((1024, 32, 32, 3), jnp.float32)
    y = jnp.zeros((1024,), jnp.int32)

    def fn():
        state[0], m = steps.cn(state[0], x, y, jax.random.key(1))
        return m

    dt = timed(fn, lambda m: float(m["loss"]), 20, 3)
    return {"metric": "wrn40_2_cnsn_train_throughput",
            "value": round(1024 / dt, 2), "unit": "images/sec/chip"}


def wrn_augmix():
    """WRN AugMix 3-view JSD step incl. on-device AugMix generation."""
    from cnsn_tpu.data.augmix_jax import augmix_batch
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd
    model = build_model("wideresnet", num_classes=100, pos="post",
                        cnsn_type="cnsn", crop="both", beta=1.0,
                        dtype=jnp.bfloat16)
    tx = make_sgd(cosine_lr(0.1, 10_000))
    state = [create_train_state(model, jax.random.key(0),
                                (256, 32, 32, 3), tx)]
    steps = StepFns(model, active_num=2, consist_wt=10.0, donate=True)
    imgs = jnp.zeros((256, 32, 32, 3), jnp.uint8)
    y = jnp.zeros((256,), jnp.int32)

    def fn():
        views = augmix_batch(jax.random.key(2), imgs)
        state[0], m = steps.augmix(state[0], views, y, jax.random.key(3))
        return m

    dt = timed(fn, lambda m: float(m["loss"]), 10, 2)
    return {"metric": "wrn_augmix_jsd_ondevice_train_throughput",
            "value": round(256 / dt, 2), "unit": "images/sec/chip"}


def ibn_augmix():
    """The 4th headline recipe (run-cnsn-augmix.sh, 22.3 top-1 err):
    ResNet-50-IBN-b + in-network SN (pos=residual) + image-space CN on
    the 3B AugMix concat + JSD.  Reference batch is 256 over 8 GPUs
    (32/GPU); measured here at b64/chip, 3 views."""
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd
    model = build_model("resnet50_ibn_b", num_classes=1000, pos="residual",
                        cnsn_type="sn", crop="neither", beta=1.0,
                        dtype=jnp.bfloat16)
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    b = int(os.environ.get("IBN_BATCH", "64"))
    state = [create_train_state(model, jax.random.key(0),
                                (b, 224, 224, 3), tx)]
    steps = StepFns(model, active_num=1, image_crop="neither",
                    image_beta=1.0, donate=True)
    views = jnp.zeros((3, b, 224, 224, 3), jnp.float32)
    y = jnp.zeros((b,), jnp.int32)

    def fn():
        state[0], m = steps.cn_image_augmix(state[0], views, y,
                                            jax.random.key(3))
        return m

    dt = timed(fn, lambda m: float(m["loss"]), 10, 2)
    # samples/s (pre-view-tripling), matching the wrn_augmix convention
    return {"metric": "ibn_b_sn_augmix_train_throughput",
            "value": round(b / dt, 2), "unit": "images/sec/chip"}


def ibn_augmix_ondevice():
    """ibn_augmix + the full on-device AugMix chain (train_geom loader
    feeds uint8 geometry; augmix_batch generates the 3 views at 224²
    with torchvision normalization on the TPU).  Directly comparable to
    ibn_augmix, whose views arrive premade — the delta is the true
    in-graph cost of AugMix generation, which on the host would be
    3 PIL chains × 224² per sample."""
    from cnsn_tpu.data.augmix_jax import augmix_batch
    from cnsn_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd
    model = build_model("resnet50_ibn_b", num_classes=1000, pos="residual",
                        cnsn_type="sn", crop="neither", beta=1.0,
                        dtype=jnp.bfloat16)
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    b = int(os.environ.get("IBN_BATCH", "64"))
    state = [create_train_state(model, jax.random.key(0),
                                (b, 224, 224, 3), tx)]
    steps = StepFns(model, active_num=1, image_crop="neither",
                    image_beta=1.0, donate=True)
    u8 = jnp.zeros((b, 224, 224, 3), jnp.uint8)
    y = jnp.zeros((b,), jnp.int32)
    mean = tuple(map(float, IMAGENET_MEAN))
    std = tuple(map(float, IMAGENET_STD))

    def fn():
        views = augmix_batch(jax.random.key(2), u8, severity=1.0,
                             mean=mean, std=std)
        state[0], m = steps.cn_image_augmix(state[0], views, y,
                                            jax.random.key(3))
        return m

    dt = timed(fn, lambda m: float(m["loss"]), 10, 2)
    return {"metric": "ibn_b_sn_augmix_ondevice_train_throughput",
            "value": round(b / dt, 2), "unit": "images/sec/chip"}


def seg_train():
    """FCN-CNSN train step (bf16); SEG_SIZE/SEG_BATCH env — the shipped
    gtav recipe shape is 713x713, batch 16.  No remat by default: with
    the fused class-major CE the step fits HBM un-rematerialized and
    that measures fastest (48.79 vs 48.5 remat='1_2' vs 41.04
    remat-all, perf/r3_seg_remat.jsonl); SEG_REMAT=1|1_2|... opts in."""
    from cnsn_tpu.segmentation import (SegStepFns, SegTrainState, fcn_cnsn,
                                       make_seg_optimizer)
    rm = os.environ.get("SEG_REMAT", "0")
    remat = False if rm == "0" else (True if rm == "1" else rm)
    model = fcn_cnsn(classes=19, block_idxs="1_2_3_4", pos="residual",
                     cn_pos="post", cnsn_type="cnsn", crop="style",
                     beta=1.0, dtype=jnp.bfloat16, remat=remat)
    b = int(os.environ.get("SEG_BATCH", "8"))
    hw = int(os.environ.get("SEG_SIZE", "513"))  # gtav recipe: 713, b16
    x = jnp.zeros((b, hw, hw, 3), jnp.float32)
    yl = jnp.zeros((b, hw, hw), jnp.int32)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
            "dropout": jax.random.key(2)}
    v = model.init(rngs, x[:2], False, None, None)
    tx = make_seg_optimizer(v["params"], 0.01, 10_000)
    state = [SegTrainState.create(apply_fn=model.apply, params=v["params"],
                                  batch_stats=v["batch_stats"], tx=tx)]
    steps = SegStepFns(model, num_classes=19, active_num=1, donate=True)

    def fn():
        state[0], m = steps.aug(state[0], x, yl, jax.random.key(4))
        return m

    dt = timed(fn, lambda m: float(m["loss"]), 10, 2)
    return {"metric": "fcn_cnsn_seg_train_throughput",
            "value": round(b / dt, 2), "unit": "images/sec/chip"}


ENTRIES = {"r50_eval": r50_eval, "wrn_train": wrn_train,
           "wrn_augmix": wrn_augmix, "ibn_augmix": ibn_augmix,
           "ibn_augmix_ondevice": ibn_augmix_ondevice,
           "seg_train": seg_train}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ENTRIES)
    for name in names:
        try:
            print(json.dumps(ENTRIES[name]()))
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"metric": name, "error": str(e)[:200]}))
