"""A/B remat granularity for the seg step at the gtav recipe shape.

With the fused class-major CE now default (perf/r3_seg_ce.jsonl), this
sweeps rematerialization policies of the dilated backbone: all stages
(shipped default), early-only ('1_2' — the big 179²/90² activations),
late-only ('3_4'), and none (may OOM at b16; caught and reported).
One process, all programs (remote-compile relay).  Appends to
perf/r3_seg_remat.jsonl.  Ends with a trace of the best policy for the
README attribution.  Env: SEG_SIZE, SEG_BATCH, SEG_ITERS, SEG_WINDOWS,
SEG_TRACE=0.
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
                   "perf", "r3_seg_remat.jsonl")
TRACE_DIR = "/tmp/jax_trace_seg_r2"


def build(remat):
    from cnsn_tpu.segmentation import (SegStepFns, SegTrainState, fcn_cnsn,
                                       make_seg_optimizer)
    b = int(os.environ.get("SEG_BATCH", "16"))
    hw = int(os.environ.get("SEG_SIZE", "713"))
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
    steps = SegStepFns(model, num_classes=19, active_num=1, donate=False)
    return steps.aug, state, x, yl, b


def measure(tag, remat):
    iters = int(os.environ.get("SEG_ITERS", "8"))
    windows = int(os.environ.get("SEG_WINDOWS", "3"))
    try:
        step, state, x, yl, b = build(remat)
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
            vals.append(b / ((time.perf_counter() - t0) / iters))
        vals.sort()
        row = {"metric": "fcn_cnsn_seg_train_throughput", "tag": tag,
               "value": round(vals[len(vals) // 2], 2),
               "unit": "images/sec/chip",
               "windows": [round(v, 2) for v in vals],
               "loss": float(m["loss"]), "compile_s": round(compile_s, 1)}
    except Exception as e:
        row = {"metric": "fcn_cnsn_seg_train_throughput", "tag": tag,
               "error": str(e)[:300]}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for tag, remat in (("remat_all", True), ("remat_12", "1_2"),
                       ("remat_34", "3_4"), ("remat_none", False)):
        results[tag] = measure(tag, remat)

    if os.environ.get("SEG_TRACE", "1") == "1":
        ok = {t: r for t, r in results.items() if "value" in r}
        best = max(ok, key=lambda t: ok[t]["value"])
        spec = {"remat_all": True, "remat_12": "1_2", "remat_34": "3_4",
                "remat_none": False}[best]
        step, state, x, yl, b = build(spec)
        state, m = step(state, x, yl, jax.random.key(0))
        float(m["loss"])
        with jax.profiler.trace(TRACE_DIR):
            state, m = step(state, x, yl, jax.random.key(1))
            float(m["loss"])
        print(f"traced best={best} to {TRACE_DIR}", flush=True)
        sys.argv = ["trace_attr", TRACE_DIR]
        import importlib.util
        spec_ = importlib.util.spec_from_file_location(
            "trace_attr",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "trace_attr.py"))
        mod = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(mod)
        mod.main()


if __name__ == "__main__":
    main()
