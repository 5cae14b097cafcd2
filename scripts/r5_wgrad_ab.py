"""Round-5 wave 1: batch-tiled Pallas wgrad vs XLA's conv-backward
custom-call, kernel level, on the real chip.

The r3 one-image kernel lost 29% end-to-end; its post-mortem named the
fix (batch-tiled grid, B folded into the contraction) — this measures
that diagnosed variant per R50 3x3 shape before any end-to-end run.

Timing protocol: each variant runs inside one jitted lax.scan of N
iterations (per-iteration dy scaling defeats loop-invariant hoisting;
the scaling traffic is identical across variants), so the ~600 us/call
tunnel dispatch overhead (CLAUDE.md) amortizes out.  Reported
ms/call = wall / N.  Appends JSON rows to perf/r5_wgrad_tiled.jsonl.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r5_wgrad_tiled.jsonl")

import sys
sys.path.insert(0, REPO)

from cnsn_tpu.ops.pallas.conv_wgrad import (wgrad3x3_fits, wgrad3x3_pallas,
                                            wgrad3x3_tile_plan,
                                            wgrad3x3_tiled)

# the four R50 3x3 conv shapes at the flagship batch
SHAPES = [
    (128, 56, 56, 64, 64),
    (128, 28, 28, 128, 128),
    (128, 14, 14, 256, 256),
    (128, 7, 7, 512, 512),
]
N = int(os.environ.get("WGRAD_AB_ITERS", "16"))
DTYPE = jnp.bfloat16


def xla_wgrad(x, dy):
    # same-dtype conv (the model's bf16 compute path); the transpose
    # rule emits the conv-backward-filter custom-call this A/B targets
    def fwd(k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k0 = jnp.zeros((3, 3, x.shape[-1], dy.shape[-1]), x.dtype)
    _, pb = jax.vjp(fwd, k0)
    return pb(dy.astype(x.dtype))[0].astype(jnp.float32)


def timed(fn, x, dy, n=N):
    @jax.jit
    def loop(scales):
        def body(c, s):
            dw = fn(x, dy * s)
            return c + dw.astype(jnp.float32).sum(), None
        return lax.scan(body, jnp.float32(0.0), scales)[0]

    scales = jnp.linspace(1.0, 1.01, n).astype(DTYPE)
    float(loop(scales))                      # compile + warm (host xfer)
    t0 = time.time()
    v = float(loop(scales))                  # forced host transfer
    dt = time.time() - t0
    return dt * 1000.0 / n, v


def main():
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rows = []
    for (b, h, w, cin, cout) in SHAPES:
        kx, kd = jax.random.split(jax.random.key(b + h))
        x = jax.random.normal(kx, (b, h, w, cin), DTYPE)
        dy = jax.random.normal(kd, (b, h, w, cout), DTYPE)
        plan = wgrad3x3_tile_plan(b, h, w, cin, cout, 2)
        variants = {"xla_custom_call": functools.partial(xla_wgrad)}
        if plan is not None:
            variants["pallas_tiled"] = functools.partial(
                wgrad3x3_tiled, padding=1, plan=plan)
        if wgrad3x3_fits(h, w, cin, cout, 2):
            variants["pallas_oneimg"] = functools.partial(
                wgrad3x3_pallas, padding=1)
        row = {"shape": [b, h, w, cin, cout], "plan": plan, "iters": N}
        for name, fn in variants.items():
            try:
                ms, v = timed(fn, x, dy)
                row[name + "_ms"] = round(ms, 3)
                row[name + "_chk"] = v
            except Exception as e:  # record, keep measuring
                row[name + "_error"] = repr(e)[:300]
            print(json.dumps({k: row[k] for k in row}), flush=True)
        rows.append(row)
    with open(OUT, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
