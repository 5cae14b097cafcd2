"""A/B the tensor-parallel mappings by compiled-HLO collective counts.

Compiles the CN train step over the (data=4, model=2) mesh on 8 virtual
CPU devices for each rule set in `parallel/tensor.py`:

  * minimal — round 2's conv1/bn1/conv2-only mapping (conv3, downsample
    and fc computed redundantly on every model-parallel device);
  * full    — the tuned full-bottleneck mapping (conv3/downsample/fc
    column-sharded; the residual add runs channel-sharded).

For each it reports the GSPMD collectives in the compiled module
(all-reduce / all-gather / reduce-scatter / collective-permute /
all-to-all counts) and the fraction of conv+fc kernel parameters left
replicated over 'model' — the redundant-FLOPs proxy the full mapping
is built to remove.  No multi-chip hardware is reachable from this
container, so compiled-program structure is the measurable evidence
(CLAUDE.md: bench runs single-chip; the mesh path is validated on the
virtual CPU mesh).

Usage: python scripts/tp_hlo_stats.py [--out perf/tp_hlo_stats.jsonl]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
               "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "f32": 4,
               "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16}


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string — `bf16[128,56,56,64]{3,2,1,0}`
    or a tuple `(f32[10]{0}, f32[20]{0})` (components summed)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_counts(hlo_text: str) -> dict:
    """Per-collective op counts AND result bytes in a compiled module.

    Matches op names like `%all-gather.123` / `all-reduce-start.4`; the
    result shape may be a TUPLE with spaces — e.g. `%all-reduce.2 =
    (f32[...], f32[...]) all-reduce(...)` — when XLA combines
    collectives, so a bare `\\S+` shape pattern undercounts (ADVICE r3:
    94 counted vs 217 present on the full-rules module)."""
    out = {}
    for name in COLLECTIVES:
        shapes = re.findall(
            rf"= ((?:\([^)]*\)|\S+)) {name}(?:-start)?\.?\d*\(", hlo_text)
        out[name] = {"count": len(shapes),
                     "bytes": sum(shape_bytes(s) for s in shapes)}
    return out


def replicated_matmul_fraction(state, rules) -> float:
    """Fraction of conv/fc kernel params (a FLOPs proxy at fixed spatial
    size) whose compute is replicated over the 'model' axis."""
    total = 0
    repl = 0
    def visit(path_parts, leaf):
        nonlocal total, repl
        parts = []
        for p in path_parts:
            for a in ("key", "name", "idx"):
                if hasattr(p, a):
                    parts.append(str(getattr(p, a)))
                    break
        path = "/".join(parts)
        if path.endswith("/kernel") or path == "fc/kernel":
            total += leaf.size
            if rules(path, leaf.ndim) is None:
                repl += leaf.size
        return leaf
    jax.tree_util.tree_map_with_path(visit, state.params)
    return repl / max(total, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cnsn_tpu.models import build_model
    from cnsn_tpu.parallel import TensorParallel, make_mesh
    from cnsn_tpu.parallel.tensor import (resnet_tp_rules,
                                          resnet_tp_rules_minimal)
    from cnsn_tpu.train import (StepFns, cosine_lr, create_train_state,
                                make_sgd)

    model = build_model("resnet50", num_classes=10, pos="post",
                        cnsn_type="sn", crop="neither", beta=1.0)
    tx = make_sgd(cosine_lr(0.1, 100), weight_decay=1e-4, nesterov=False)
    state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3), tx)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    lbls = jnp.asarray(rng.randint(0, 10, 8))

    rows = []
    for name, rules in (("minimal", resnet_tp_rules_minimal),
                        ("full", resnet_tp_rules)):
        tp = TensorParallel(make_mesh(8, ("data", "model"), (4, 2)),
                            rules=rules)
        st = tp.shard_state(state)
        steps = StepFns(model, active_num=1, image_crop="neither",
                        image_beta=1.0, num_groups=4)
        compiled = steps.cn_image.lower(st, *tp.shard_inputs(imgs, lbls),
                                        jax.random.key(2)).compile()
        text = compiled.as_text()
        row = {"rules": name,
               "collectives": collective_counts(text),
               "replicated_matmul_param_fraction":
                   round(replicated_matmul_fraction(state, rules), 4)}
        rows.append(row)
        print(json.dumps(row))

    if args.out:
        # 'w', not 'a': the script always emits both rows, so appending
        # would silently accumulate duplicates across reruns (ADVICE r3)
        with open(args.out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
