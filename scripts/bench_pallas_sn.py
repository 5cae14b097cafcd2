"""On-chip A/B: fused Pallas eval-SelfNorm vs XLA's fused jnp version.

Shapes = the ResNet-50 serving sites (post-residual, b128/b256) and a
WRN site.  Appends JSON lines to perf/pallas_sn.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from cnsn_tpu.ops.pallas.selfnorm import (selfnorm_infer_pallas,
                                          selfnorm_infer_reference)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "perf", "pallas_sn.jsonl")

SHAPES = [
    ("r50_l1_b128", (128, 56, 56, 256)),
    ("r50_l2_b128", (128, 28, 28, 512)),
    ("r50_l3_b128", (128, 14, 14, 1024)),
    ("r50_l4_b128", (128, 7, 7, 2048)),
    ("wrn_b256", (256, 32, 32, 160)),
]


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))  # force host sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    dt = jnp.bfloat16 if os.environ.get("SN_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    ref = jax.jit(selfnorm_infer_reference)
    results = []
    for tag, shape in SHAPES:
        rng = np.random.RandomState(0)
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape), dt)
        w = jnp.asarray(rng.randn(c, 2), jnp.float32)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c), jnp.float32)

        t_xla = timeit(ref, x, w, a, b)
        t_pl = timeit(selfnorm_infer_pallas, x, w, a, b)
        # bandwidth roofline: 1 read + 1 write of x at element size
        bytes_min = 2 * int(np.prod(shape)) * x.dtype.itemsize
        rec = {"tag": tag, "shape": shape, "dtype": str(dt.__name__),
               "xla_us": round(t_xla, 1), "pallas_us": round(t_pl, 1),
               "speedup": round(t_xla / t_pl, 3),
               "roofline_us_819GBps": round(bytes_min / 819e9 * 1e6, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
