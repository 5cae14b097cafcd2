"""On-chip A/B: streaming Pallas BN-stats kernel vs XLA's fused reduce.

Shapes = the ResNet-50 BN sites at b128 (the trace showed XLA's
convert_reduce_fusion ops at ~4x the HBM roofline).  Appends JSON lines
to perf/bn_stats.jsonl.
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

from cnsn_tpu.ops.pallas.bn_stats import bn_sums_pallas

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "perf", "bn_stats.jsonl")

SHAPES = [
    ("r50_stem_b128", (128, 112, 112, 64)),
    ("r50_l1_b128", (128, 56, 56, 256)),
    ("r50_l1_mid_b128", (128, 56, 56, 64)),
    ("r50_l2_b128", (128, 28, 28, 512)),
    ("r50_l3_b128", (128, 14, 14, 1024)),
    ("r50_l4_b128", (128, 7, 7, 2048)),
]


@jax.jit
def xla_sums(x, m0):
    d = x.astype(jnp.float32) - m0
    return jnp.sum(d, axis=(0, 1, 2)), jnp.sum(d * d, axis=(0, 1, 2))


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))  # force host sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / iters * 1e6  # us


@jax.jit
def xla_ins_stats(x):
    xf = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    mean = jnp.mean(xf, axis=(1, 2))
    var = (jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(mean))
    var = var * (n / (n - 1))
    return mean, jnp.sqrt(var + 1e-5)


def main():
    from cnsn_tpu.ops.pallas.ins_stats import (ins_stats_pallas,
                                               ins_stats_v2,
                                               ins_stats_v2_fits)
    dt = jnp.bfloat16 if os.environ.get("BN_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    results = []
    for tag, shape in SHAPES:
        rng = np.random.RandomState(0)
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape), dt)
        m0 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

        t_xla = timeit(xla_sums, x, m0)
        t_pl = timeit(bn_sums_pallas, x, m0)
        # bandwidth roofline: one read of x
        bytes_min = int(np.prod(shape)) * x.dtype.itemsize
        rec = {"tag": tag, "shape": shape, "dtype": str(dt.__name__),
               "xla_us": round(t_xla, 1), "pallas_us": round(t_pl, 1),
               "speedup": round(t_xla / t_pl, 3),
               "roofline_us_819GBps": round(bytes_min / 819e9 * 1e6, 1)}
        # instance-stats A/B on the same shape (SN-site reduction)
        rec["ins_xla_us"] = round(timeit(xla_ins_stats, x), 1)
        if ins_stats_v2_fits(shape[1], shape[2], c, x.dtype.itemsize):
            rec["ins_v2_us"] = round(timeit(ins_stats_v2, x), 1)
        try:
            rec["ins_v1_us"] = round(timeit(ins_stats_pallas, x), 1)
        except Exception as e:
            rec["ins_v1_us"] = repr(e)[:80]
        results.append(rec)
        print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
