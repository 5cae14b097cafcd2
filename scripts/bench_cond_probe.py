"""Probe: is the cn-regime slowdown the lax.cond structure itself or the
swap branch content?  Monkeypatches the swap branch to identity while
keeping the 16 conditionals, then times the cn step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cnsn_tpu.nn.cnsn as cnsn_mod

MODE = os.environ.get("PROBE_MODE", "empty")  # empty | real | nocond

if MODE == "empty":
    cnsn_mod.cross_norm_2ins = lambda x, key, **kw: x  # keep cond, empty branch
elif MODE == "nocond":
    # branchless: no cond at all, swap never computed
    class _NoCond(cnsn_mod.CrossNorm):
        def __call__(self, x, active=None):
            return x
    cnsn_mod.CrossNorm.__call__ = _NoCond.__call__

from cnsn_tpu.models import build_model
from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd

batch, size = 128, 224
model = build_model("resnet50", num_classes=1000, pos="residual",
                    cnsn_type="cn", crop="neither", beta=1.0,
                    dtype=jnp.bfloat16)
tx = make_sgd(cosine_lr(0.1, 10_000), weight_decay=1e-4, nesterov=False)
state = create_train_state(model, jax.random.key(0), (batch, size, size, 3), tx)
steps = StepFns(model, active_num=int(os.environ.get("PROBE_ACTIVE", "1")),
                donate=True)

rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
labels = jnp.asarray(rng.randint(0, 1000, batch))

for i in range(5):
    state, metrics = steps.cn(state, images, labels, jax.random.key(i))
float(metrics["loss"])
t0 = time.perf_counter()
iters = 20
for i in range(iters):
    state, metrics = steps.cn(state, images, labels, jax.random.key(100 + i))
float(metrics["loss"])
dt = time.perf_counter() - t0
print(f"mode={MODE}: {batch * iters / dt:.1f} img/s  ({dt / iters * 1e3:.1f} ms/step)")
