"""Trace the segmentation train step at the shipped recipe shape.

Builds the gtav_fcn50_cnsn workload (713², batch 16, bf16, remat — the
23.2 img/s zoo row), compiles the aug step, traces one execution, and
prints the per-op-class attribution (same aggregation as
scripts/trace_attr.py).  Env: SEG_SIZE, SEG_BATCH, SEG_REMAT=0.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/jax_trace_seg"


def main():
    from cnsn_tpu.segmentation import (SegStepFns, SegTrainState, fcn_cnsn,
                                       make_seg_optimizer)
    b = int(os.environ.get("SEG_BATCH", "16"))
    hw = int(os.environ.get("SEG_SIZE", "713"))
    remat = os.environ.get("SEG_REMAT", "1") == "1"
    model = fcn_cnsn(classes=19, block_idxs="1_2_3_4", pos="residual",
                     cn_pos="post", cnsn_type="cnsn", crop="style",
                     beta=1.0, dtype=jnp.bfloat16, remat=remat)
    x = jnp.zeros((b, hw, hw, 3), jnp.float32)
    yl = jnp.zeros((b, hw, hw), jnp.int32)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
            "dropout": jax.random.key(2)}
    v = model.init(rngs, x[:2], False, None, None)
    tx = make_seg_optimizer(v["params"], 0.01, 10_000)
    state = SegTrainState.create(apply_fn=model.apply, params=v["params"],
                                 batch_stats=v["batch_stats"], tx=tx)
    steps = SegStepFns(model, num_classes=19, active_num=1, donate=True)

    print("compiling...", flush=True)
    compiled = steps.aug.lower(state, x, yl, jax.random.key(3)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"flops/step: {float(ca.get('flops', 0)) / 1e12:.2f} TF")

    # warm + time
    for i in range(3):
        state, m = compiled(state, x, yl, jax.random.key(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(5):
        state, m = compiled(state, x, yl, jax.random.key(10 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 5
    print(f"step {dt * 1e3:.1f} ms -> {b / dt:.2f} img/s")

    with jax.profiler.trace(TRACE_DIR):
        state, m = compiled(state, x, yl, jax.random.key(99))
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
