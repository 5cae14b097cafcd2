"""Flagship-recipe batch-size A/B on the real chip, one process.

Round 2's batch sweep (b64/128/256/512, perf/r2_matrix*.jsonl) ran on
the *innet* recipe; the flagship recipe (run-cnsn.sh: in-network SN +
image-space CN gated at cn_prob=0.5) has a different stats/conv mix,
so its own sweep is the one untested cell in the single-chip matrix
(VERDICT r3).  This compiles and times the flagship step pair at
several batch sizes in ONE process (each new process recompiles
through the remote relay, 3-8 min/program — CLAUDE.md).

Usage: python scripts/flagship_batch_ab.py [--batches 128,192,256]
                                           [--out perf/r4_flagship_batch.jsonl]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def bench_batch(batch, size=224, iters=20, warmup=5, windows=3,
                cn_prob=0.5):
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd

    # tuned flagship defaults (README perf table): bf16, s2d stem,
    # dot-lowered 1x1s — bench.py's exact model config
    model = build_model("resnet50", num_classes=1000, dtype=jnp.bfloat16,
                        pos="post", cnsn_type="sn", crop="neither", beta=1.0,
                        stem="s2d")
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    state = create_train_state(model, jax.random.key(0),
                               (batch, size, size, 3), tx)
    steps = StepFns(model, active_num=1, donate=True,
                    image_crop="neither", image_beta=1.0)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, batch))

    total = warmup + windows * iters
    gates = np.random.RandomState(7).rand(total) < cn_prob

    key0 = jax.random.key(0)
    t0 = time.perf_counter()
    compiled_aug = steps.cn_image.lower(state, images, labels, key0).compile()
    compiled_plain = steps.plain.lower(state, images, labels, key0).compile()
    compile_s = time.perf_counter() - t0

    keys = list(jax.random.split(key0, total))
    jax.block_until_ready(keys[-1])

    def run(i):
        fn = compiled_aug if gates[i] else compiled_plain
        return fn(state, images, labels, keys[i])

    metrics = None
    for i in range(warmup):
        state, metrics = run(i)
    float(metrics["loss"])  # host transfer: tunnel block_until_ready no-op

    rates = []
    for w in range(windows):
        lo = warmup + w * iters
        t1 = time.perf_counter()
        for i in range(lo, lo + iters):
            state, metrics = run(i)
        float(metrics["loss"])
        dt = time.perf_counter() - t1
        rates.append(batch * iters / dt)

    med = sorted(rates)[len(rates) // 2]
    return {"recipe": "flagship", "batch": batch, "size": size,
            "img_per_sec": round(med, 2),
            "ms_per_step": round(batch / med * 1e3, 2),
            "windows": [round(r, 2) for r in rates],
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,192,256")
    ap.add_argument("--out", default="perf/r4_flagship_batch.jsonl")
    args = ap.parse_args()

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        row = bench_batch(b)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
