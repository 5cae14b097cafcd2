"""A/B the segmentation CE lowering at the shipped gtav recipe shape.

Measures the FCN-CNSN aug train step (713², b16, bf16, remat) with the
default resize+NHWC cross-entropy vs the class-major fused upsample+CE
(segmentation/upsample.py, CNSN_SEG_CE=matmul).  Both programs compile
in ONE process (remote-compile relay: each new process recompiles).

Appends JSONL rows to perf/r3_seg_ce.jsonl.  Env: SEG_SIZE, SEG_BATCH,
SEG_WINDOWS (default 3), SEG_ITERS (default 8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "perf", "r3_seg_ce.jsonl")


def build():
    from cnsn_tpu.segmentation import (SegStepFns, SegTrainState, fcn_cnsn,
                                       make_seg_optimizer)
    b = int(os.environ.get("SEG_BATCH", "16"))
    hw = int(os.environ.get("SEG_SIZE", "713"))
    model = fcn_cnsn(classes=19, block_idxs="1_2_3_4", pos="residual",
                     cn_pos="post", cnsn_type="cnsn", crop="style",
                     beta=1.0, dtype=jnp.bfloat16, remat=True)
    x = jnp.zeros((b, hw, hw, 3), jnp.float32)
    yl = jnp.zeros((b, hw, hw), jnp.int32)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
            "dropout": jax.random.key(2)}
    v = model.init(rngs, x[:2], False, None, None)
    tx = make_seg_optimizer(v["params"], 0.01, 10_000)
    state = SegTrainState.create(apply_fn=model.apply, params=v["params"],
                                 batch_stats=v["batch_stats"], tx=tx)
    return model, state, x, yl, b, hw


def measure(tag, step, state, x, yl, b):
    iters = int(os.environ.get("SEG_ITERS", "8"))
    windows = int(os.environ.get("SEG_WINDOWS", "3"))
    t0 = time.perf_counter()
    s = state
    for i in range(2):
        s, m = step(s, x, yl, jax.random.key(i))
    float(m["loss"])
    compile_s = time.perf_counter() - t0
    vals = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            s, m = step(s, x, yl, jax.random.key(100 * w + i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        vals.append(b / dt)
    vals.sort()
    row = {"metric": "fcn_cnsn_seg_train_throughput", "tag": tag,
           "value": round(vals[len(vals) // 2], 2),
           "unit": "images/sec/chip", "windows": [round(v, 2) for v in vals],
           "loss": float(m["loss"]), "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    from cnsn_tpu.segmentation import SegStepFns
    model, state, x, yl, b, hw = build()
    print(f"devices: {jax.devices()}  shape {b}x{hw}", flush=True)
    for tag, lowres in (("ce_resize", False), ("ce_matmul", True)):
        steps = SegStepFns(model, num_classes=19, active_num=1,
                           donate=False, lowres_ce=lowres)
        measure(tag, steps.aug, state, x, yl, b)


if __name__ == "__main__":
    main()
