"""Dump + summarize the optimized HLO of the bench train step.

Uses the same lowering as bench.py (compile cache hit if the matrix ran
first).  Prints: op-kind histogram, the largest fusions by output bytes,
every convolution shape, and (optionally) attempts a device trace.

Env: same knobs as bench.py; HLO_TRACE=1 to attempt jax.profiler.
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def build_compiled():
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    size = int(os.environ.get("BENCH_SIZE", "224"))
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bf16")]
    recipe = os.environ.get("BENCH_RECIPE", "flagship")
    kw = dict(num_classes=1000, dtype=dtype,
              remat=os.environ.get("BENCH_REMAT") == "1")
    if os.environ.get("BENCH_STEM"):
        kw["stem"] = os.environ["BENCH_STEM"]
    if recipe == "flagship":
        cnsn_type = "sn"
        kw.update(pos="post", cnsn_type="sn", crop="neither", beta=1.0)
    else:
        cnsn_type = os.environ.get("BENCH_CNSN", "cnsn")
        if cnsn_type != "none":
            kw.update(pos="residual", cnsn_type=cnsn_type, crop="neither",
                      beta=1.0)
    model = build_model("resnet50", **kw)
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    state = create_train_state(model, jax.random.key(0),
                               (batch, size, size, 3), tx)
    steps = StepFns(model, active_num=1, donate=True,
                    image_crop="neither", image_beta=1.0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, batch))
    if recipe == "flagship":
        # HLO_PROG=plain inspects the non-CN half of the recipe mix
        fn = (steps.plain if os.environ.get("HLO_PROG") == "plain"
              else steps.cn_image)
    else:
        fn = steps.plain if cnsn_type == "none" else steps.cn
    compiled = fn.lower(state, images, labels, jax.random.key(0)).compile()
    return compiled, state, images, labels


_SHAPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1}


def shape_bytes(sig: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", sig)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _SHAPE_BYTES.get(dt, 4)


def main():
    compiled, state, images, labels = build_compiled()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars")

    # isolate the ENTRY computation (top-level schedule; ops inside
    # fused computations don't individually touch HBM)
    start = txt.index("ENTRY ")
    entry = txt[start:]

    op_rx = re.compile(
        r"^\s*(?:ROOT )?%[\w.\-]+ = \(?([a-z0-9]+)\[([\d,]*)\][^ ]* ([\w\-]+)\(")
    kinds = collections.Counter()
    bytes_by_kind = collections.Counter()
    biggest = []
    for line in entry.splitlines():
        m = op_rx.match(line)
        if not m:
            continue
        dt, dims, op = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _SHAPE_BYTES.get(dt, 4)
        kinds[op] += 1
        bytes_by_kind[op] += nbytes
        biggest.append((nbytes, op, line.strip()[:150]))

    print("\n== entry op kinds (count, output MB) ==")
    for k, v in kinds.most_common(25):
        print(f"  {k:22s} {v:5d}  {bytes_by_kind[k]/1e6:10.1f} MB")

    print("\n== top entry ops by output bytes ==")
    for b, op, line in sorted(biggest, key=lambda t: -t[0])[:25]:
        print(f"  {b/1e6:8.1f} MB {op:12s} {line[:120]}")

    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f"{attr}: {v/1e6:.1f} MB")

    if os.environ.get("HLO_TRACE") == "1":
        print("\nattempting device trace...")
        try:
            with jax.profiler.trace("/tmp/jax_trace"):
                s2, m = compiled(state, images, labels, jax.random.key(1))
                float(m["loss"])
            print("trace written to /tmp/jax_trace")
        except Exception as e:  # noqa: BLE001
            print("trace failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
