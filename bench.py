"""Throughput benchmark: ResNet-50+CNSN training step on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: an A100 trains ResNet-50 (synthetic, AMP) at ~2800 img/s;
BASELINE.json's north star is >= 2x that per chip on v5e.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_IMG_PER_SEC = 2800.0


def main():
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    size = int(os.environ.get("BENCH_SIZE", "224"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))

    import jax.numpy as jnp
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    cnsn_type = os.environ.get("BENCH_CNSN", "cnsn")
    if cnsn_type == "none":
        model = build_model("resnet50", num_classes=1000, dtype=dtype)
    else:
        model = build_model("resnet50", num_classes=1000, pos="residual",
                            cnsn_type=cnsn_type, crop="neither", beta=1.0,
                            dtype=dtype,
                            remat=os.environ.get("BENCH_REMAT") == "1")
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    state = create_train_state(model, jax.random.key(0),
                               (batch, size, size, 3), tx)
    steps = StepFns(model, active_num=1, donate=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, batch))

    # steady-state CN training step (the flagship regime)
    step_fn = (steps.plain if os.environ.get("BENCH_REGIME") == "plain"
               or model.cn_num == 0 else steps.cn)
    for i in range(warmup):
        state, metrics = step_fn(state, images, labels, jax.random.key(i))
    # force full completion with a host transfer (block_until_ready can be
    # a no-op on tunneled device buffers)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, images, labels,
                                 jax.random.key(100 + i))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "resnet50_cnsn_train_throughput",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / A100_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
