"""Corruption-evaluation harness tests with synthetic CIFAR-C arrays and
checkpoint/orbax round-trips."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.evaluation import (ALEXNET_ERR, CORRUPTIONS, compute_mce,
                                 evaluate, evaluate_cifar_c)
from cnsn_tpu.models import build_model
from cnsn_tpu.train import StepFns, cosine_lr, create_train_state, make_sgd


@pytest.fixture(scope="module")
def small_model_state():
    model = build_model("allconv", num_classes=10, pos="1", cnsn_type="cn",
                        crop="neither", beta=1.0)
    tx = make_sgd(cosine_lr(0.1, 10))
    state = create_train_state(model, jax.random.key(0), (2, 32, 32, 3), tx)
    return model, state, StepFns(model, active_num=1)


def test_evaluate_cifar_c_synthetic(tmp_path, small_model_state):
    model, state, steps = small_model_state
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 10, 50).astype(np.int64)
    np.save(tmp_path / "labels.npy", labels)
    for c in CORRUPTIONS[:3]:
        np.save(tmp_path / f"{c}.npy",
                rng.randint(0, 256, (50, 32, 32, 3)).astype(np.uint8))
    mean_acc, accs = evaluate_cifar_c(steps.eval_sum, state, str(tmp_path),
                                      10, batch_size=25,
                                      corruptions=CORRUPTIONS[:3],
                                      verbose=False)
    assert 0.0 <= mean_acc <= 1.0 and len(accs) == 3


def test_sharded_eval_matches_single_device(small_model_state):
    """evaluate() over an 8-device mesh == single-device evaluate, incl.
    a short (padded) final batch (VERDICT r1 item 4)."""
    from cnsn_tpu.data.cifar import CifarData, CifarLoader
    from cnsn_tpu.parallel import DataParallel, make_mesh

    model, state, steps = small_model_state
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (44, 32, 32, 3)).astype(np.uint8)
    labels = rng.randint(0, 10, 44).astype(np.int64)
    data = CifarData(images, labels, 10)

    def fresh_loader():
        return CifarLoader(data, 16, mode="eval")  # 16,16,12 → last padded

    loss1, acc1 = evaluate(steps.eval_sum, state, fresh_loader())

    dp = DataParallel(make_mesh(8))
    state_r = dp.replicate(state)
    loss8, acc8 = evaluate(steps.eval_sum, state_r, fresh_loader(), dp=dp)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    assert acc8 == acc1


def test_compute_mce_normalization():
    # perfect accuracy -> mCE 0; accuracy 1 - alexnet_err -> CE 100 each
    perfect = {c: [1.0] * 5 for c in CORRUPTIONS}
    assert compute_mce(perfect)[0] == 0.0
    at_alexnet = {c: [1.0 - ALEXNET_ERR[i]] * 5
                  for i, c in enumerate(CORRUPTIONS)}
    mce, ces = compute_mce(at_alexnet)
    np.testing.assert_allclose(mce, 100.0, rtol=1e-6)
    np.testing.assert_allclose(list(ces.values()), 100.0, rtol=1e-6)


def test_orbax_roundtrip(tmp_path, small_model_state):
    model, state, steps = small_model_state
    from cnsn_tpu.utils.orbax_io import OrbaxCheckpointer
    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), keep=2)
    state2, _ = steps.plain(state, jnp.ones((2, 32, 32, 3)),
                            jnp.zeros((2,), jnp.int32), jax.random.key(0))
    ckpt.save(1, state2, extra={"epoch": 3, "best_acc": 0.5}, wait=True)
    restored, step, extra = ckpt.restore(
        state, extra_template={"epoch": 0, "best_acc": 0.0})
    assert step == 1
    assert int(extra["epoch"]) == 3 and float(extra["best_acc"]) == 0.5
    a = jax.tree.leaves(state2.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()
