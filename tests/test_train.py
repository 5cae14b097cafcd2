"""Train-step tests: all regimes run, loss decreases on a tiny problem,
JSD matches a torch oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from cnsn_tpu.models import build_model
from cnsn_tpu.train import (
    StepFns, cosine_lr, create_train_state, cross_entropy, jsd_consistency,
    make_sgd, sample_cn_mask, softmax_probs,
)


class TestLosses:
    def test_jsd_matches_torch(self):
        rng = np.random.RandomState(0)
        logits = [rng.randn(8, 10).astype(np.float32) for _ in range(3)]
        t = [torch.from_numpy(l) for l in logits]
        tp = [tF.softmax(x, dim=1) for x in t]
        mix = torch.clamp(sum(tp) / 3.0, 1e-7, 1).log()
        expect = (tF.kl_div(mix, tp[0], reduction="batchmean")
                  + tF.kl_div(mix, tp[1], reduction="batchmean")
                  + tF.kl_div(mix, tp[2], reduction="batchmean")) / 3.0
        got = jsd_consistency(*[softmax_probs(jnp.asarray(l)) for l in logits])
        np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)

    def test_ce_matches_torch(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(8, 10).astype(np.float32)
        labels = rng.randint(0, 10, 8)
        expect = tF.cross_entropy(torch.from_numpy(logits),
                                  torch.from_numpy(labels)).item()
        got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestSchedules:
    def test_cosine_endpoints(self):
        sched = cosine_lr(0.1, 1000)
        np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000)), 1e-6, rtol=1e-3)


class TestCnMask:
    def test_exact_active_count(self):
        for seed in range(5):
            mask = sample_cn_mask(jax.random.key(seed), 18, 2)
            assert int(mask.sum()) == 2


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model("allconv", num_classes=10, pos="1", cnsn_type="cn",
                        crop="neither", beta=1.0)
    tx = make_sgd(cosine_lr(0.05, 200), weight_decay=5e-4)
    state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3), tx)
    steps = StepFns(model, active_num=1, consist_wt=1.0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, 4))
    return model, state, steps, images, labels


class TestSteps:
    def test_all_regimes_execute(self, tiny_setup):
        model, state, steps, images, labels = tiny_setup
        key = jax.random.key(1)
        images3 = jnp.stack([images, images, images])
        for name, fn, args in [
            ("plain", steps.plain, (images, labels, key)),
            ("cn", steps.cn, (images, labels, key)),
            ("cn_consistency", steps.cn_consistency, (images, labels, key)),
            ("augmix", steps.augmix, (images3, labels, key)),
            ("augmix_cn", steps.augmix_cn, (images3, labels, key)),
            ("cn_image", steps.cn_image, (images, labels, key)),
            ("cn_image_consist", steps.cn_image_consist, (images, labels, key)),
            ("cn_image_augmix", steps.cn_image_augmix, (images3, labels, key)),
        ]:
            new_state, metrics = fn(state, *args)
            assert np.isfinite(float(metrics["loss"])), name
            # params must actually change
            d = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                             state.params, new_state.params)
            assert max(jax.tree.leaves(d)) > 0, name

    def test_loss_decreases(self, tiny_setup):
        model, state, steps, images, labels = tiny_setup
        losses = []
        for i in range(20):
            state, metrics = steps.cn(state, images, labels, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_eval_step(self, tiny_setup):
        model, state, steps, images, labels = tiny_setup
        out = steps.eval_step(state, images, labels)
        assert 0 <= int(out["correct"]) <= 4
