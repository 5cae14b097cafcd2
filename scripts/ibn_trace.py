"""Trace the IBN-b AugMix recipe step (the 594 img/s zoo row).

Compiles the exact ibn_augmix zoo workload (ResNet-50-IBN-b + SN,
cn_image_augmix on premade (3,B,224,224,3) views, b64 bf16), traces one
execution, prints per-op-class attribution — answers where the step
sits relative to the naive 3x-flagship bound (790 img/s): JSD, the
image-space CN on the 3B concat, and IBN's InstanceNorm stat passes are
the candidates.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/jax_trace_ibn"


def main():
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd
    model = build_model("resnet50_ibn_b", num_classes=1000, pos="residual",
                        cnsn_type="sn", crop="neither", beta=1.0,
                        dtype=jnp.bfloat16)
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    b = int(os.environ.get("IBN_BATCH", "64"))
    state = create_train_state(model, jax.random.key(0),
                               (b, 224, 224, 3), tx)
    steps = StepFns(model, active_num=1, image_crop="neither",
                    image_beta=1.0, donate=True)
    views = jnp.zeros((3, b, 224, 224, 3), jnp.float32)
    y = jnp.zeros((b,), jnp.int32)

    print("compiling...", flush=True)
    compiled = steps.cn_image_augmix.lower(
        state, views, y, jax.random.key(3)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"flops/step: {float(ca.get('flops', 0)) / 1e12:.2f} TF")

    for i in range(3):
        state, m = compiled(state, views, y, jax.random.key(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(10):
        state, m = compiled(state, views, y, jax.random.key(10 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"step {dt * 1e3:.1f} ms -> {b / dt:.2f} samples/s")

    with jax.profiler.trace(TRACE_DIR):
        state, m = compiled(state, views, y, jax.random.key(99))
        float(m["loss"])
    print(f"trace written to {TRACE_DIR}")

    sys.argv = ["trace_attr", TRACE_DIR]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "trace_attr", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "trace_attr.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


if __name__ == "__main__":
    main()
