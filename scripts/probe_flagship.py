"""Per-program timing probe for the flagship recipe: where do the
62.8 ms go?  Times steps.plain vs steps.cn_image on the SN model, and
the raw image-space cross_norm_2ins op on (B,224,224,3).  Appends to
perf/flagship_probe.jsonl."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "perf", "flagship_probe.jsonl")


def timeit(fn, sync, *args, iters=30, warmup=4):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from cnsn_tpu.models import build_model
    from cnsn_tpu.ops.crossnorm import cross_norm_2ins
    from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd

    batch = 128
    model = build_model("resnet50", num_classes=1000, dtype=jnp.bfloat16,
                        pos="post", cnsn_type="sn", crop="neither", beta=1.0)
    tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
    state = create_train_state(model, jax.random.key(0),
                               (batch, 224, 224, 3), tx)
    steps = StepFns(model, active_num=1, image_crop="neither",
                    image_beta=1.0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 224, 224, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, batch))
    key = jax.random.key(1)

    recs = []

    def sync_step(out):
        float(out[1]["loss"])

    t_plain = timeit(steps.plain, sync_step, state, images, labels, key)
    recs.append({"tag": "sn_plain_step_ms", "ms": round(t_plain, 2)})
    print(recs[-1], flush=True)

    t_cni = timeit(steps.cn_image, sync_step, state, images, labels, key)
    recs.append({"tag": "sn_cn_image_step_ms", "ms": round(t_cni, 2)})
    print(recs[-1], flush=True)

    # raw op: image-space CN on the input batch
    op = jax.jit(lambda x, k: cross_norm_2ins(x, k, crop="neither"))

    def sync_op(out):
        float(jnp.sum(out))

    t_op = timeit(op, sync_op, images, key)
    recs.append({"tag": "image_cn_op_ms", "ms": round(t_op, 2)})
    print(recs[-1], flush=True)

    # same op, channels-second layout (lane-rich minor dims)
    imn = jnp.moveaxis(images, 3, 1)  # (B, 3, H, W)

    def cn_nchw(x, k):
        from cnsn_tpu.ops.crossnorm import grouped_permutation
        n = x.shape[0]
        perm = grouped_permutation(jax.random.split(k, 4)[0], n, 1)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
        var = jnp.sum((xf - mean) ** 2, axis=(2, 3), keepdims=True) / (
            x.shape[2] * x.shape[3] - 1)
        std = jnp.sqrt(var + 1e-5)
        s_mean = jnp.take(mean, perm, axis=0)
        s_std = jnp.take(std, perm, axis=0)
        return ((xf - mean) / std * s_std + s_mean).astype(x.dtype)

    opn = jax.jit(cn_nchw)
    t_opn = timeit(opn, sync_op, imn, key)
    recs.append({"tag": "image_cn_op_nchw_ms", "ms": round(t_opn, 2)})
    print(recs[-1], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
