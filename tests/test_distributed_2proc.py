"""Real 2-process jax.distributed exercise on CPU.

Every other distributed test simulates process slicing in one process;
this one actually spawns two processes joined through a localhost
coordinator (4 virtual CPU devices each → one 8-device global mesh),
runs `initialize` + `process_batch_slice` + `global_batch_array` + one
in-network CrossNorm train step, and asserts the loss equals a
single-process 8-device run of the identical batch — the multi-host
seam the reference crosses with mp.spawn + NCCL
(segmentation/tool/train_cnsn.py:95-122).

Skips gracefully if this jax build refuses multi-process CPU
collectives.  Doubles as the child driver:
``python tests/test_distributed_2proc.py <port> <pid>``.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GLOBAL_BATCH = 16
SKIP_MARKERS = ("UNIMPLEMENTED", "Unimplemented", "not supported",
                "does not support", "NotImplementedError",
                "unavailable", "UNAVAILABLE")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_loss():
    import jax
    import jax.numpy as jnp
    from cnsn_tpu.parallel import DataParallel, make_mesh
    model, state, steps, (images, labels) = _build()
    dp = DataParallel(make_mesh(8))
    state = dp.replicate(state)
    im, lb = dp.shard_inputs(jnp.asarray(images), jnp.asarray(labels))
    _, m = steps.cn(state, im, lb, jax.random.key(2))
    return float(m["loss"])


def _build():
    """Model/state/steps/data — identical in every process (same seed)."""
    import jax
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import (StepFns, cosine_lr, create_train_state,
                                make_sgd)
    model = build_model("allconv", num_classes=10, cnsn_type="cn",
                        pos=1, crop="neither", beta=1.0)
    tx = make_sgd(cosine_lr(0.1, 100))
    state = create_train_state(model, jax.random.key(0),
                               (8, 32, 32, 3), tx)
    steps = StepFns(model)
    rng = np.random.RandomState(1)
    images = rng.randn(GLOBAL_BATCH, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 10, GLOBAL_BATCH)
    return model, state, steps, (images, labels)


def test_two_process_cn_step(tmp_path):
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append((p.returncode, out))
    if any(rc != 0 for rc, _ in outs):
        blob = "\n".join(o for _, o in outs)
        if any(m in blob for m in SKIP_MARKERS):
            pytest.skip("jax build refuses multi-process CPU collectives: "
                        + blob[-500:])
        raise AssertionError(blob[-3000:])

    recs = []
    for rc, out in outs:
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        recs.append(json.loads(line))
    assert [r["process_count"] for r in recs] == [2, 2]
    assert [r["device_count"] for r in recs] == [8, 8]
    assert {r["slice_start"] for r in recs} == {0, 8}
    # both controllers must observe the identical replicated loss
    assert recs[0]["loss"] == pytest.approx(recs[1]["loss"], rel=1e-6)
    # and it must equal the single-process 8-device run of the same data
    ref = _single_process_loss()
    assert recs[0]["loss"] == pytest.approx(ref, rel=1e-5)


# ---------------------------------------------------------------------------
# subprocess driver (one jax.distributed process)
# ---------------------------------------------------------------------------

def _driver(port, pid):
    import jax
    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from cnsn_tpu.parallel.distributed import (global_batch_array,
                                               initialize,
                                               process_batch_slice)
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=2, process_id=pid)

    from jax.sharding import Mesh
    model, state, steps, (images, labels) = _build()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a))
        if hasattr(a, "shape") else a, state)

    start, size = process_batch_slice(GLOBAL_BATCH)
    ga_im = global_batch_array(mesh, images[start:start + size])
    ga_lb = global_batch_array(mesh, labels[start:start + size])
    _, m = steps.cn(state, ga_im, ga_lb, jax.random.key(2))
    print(json.dumps({"loss": float(m["loss"]),
                      "process_count": jax.process_count(),
                      "device_count": jax.device_count(),
                      "slice_start": start}))


if __name__ == "__main__":
    _driver(int(sys.argv[1]), int(sys.argv[2]))
