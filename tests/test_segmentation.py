"""Segmentation world tests: backbone wiring, FCN shapes, paired
transforms, metrics vs the reference histogram math (numpy oracle), and
a full train step."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.segmentation import (FCNCNSN, SegStepFns, SegTrainState,
                                   fcn_baseline, fcn_cnsn,
                                   make_seg_optimizer, masked_cross_entropy,
                                   seg_metrics)
from cnsn_tpu.segmentation.data import (Compose, Crop, Normalize, RandScale,
                                        RandomHorizontalFlip, RandRotate,
                                        Resize, SegLoader,
                                        synthetic_seg_dataset)


def numpy_iou_oracle(pred, target, k, ignore=255):
    pred = pred.reshape(-1).copy()
    target = target.reshape(-1)
    pred[target == ignore] = ignore
    inter = pred[pred == target]
    ai, _ = np.histogram(inter, bins=np.arange(k + 1))
    ap, _ = np.histogram(pred, bins=np.arange(k + 1))
    at, _ = np.histogram(target, bins=np.arange(k + 1))
    return ai, ap + at - ai, at


class TestMetrics:
    def test_matches_reference_histograms(self):
        rng = np.random.RandomState(0)
        pred = rng.randint(0, 19, (2, 33, 41))
        target = rng.randint(0, 19, (2, 33, 41))
        target[0, :5] = 255
        ai, au, at = seg_metrics(jnp.asarray(pred), jnp.asarray(target), 19)
        oi, ou, ot = numpy_iou_oracle(pred, target, 19)
        np.testing.assert_allclose(np.asarray(ai), oi)
        np.testing.assert_allclose(np.asarray(au), ou)
        np.testing.assert_allclose(np.asarray(at), ot)

    def test_masked_ce_ignores(self):
        logits = jnp.zeros((1, 4, 4, 3))
        labels = jnp.full((1, 4, 4), 255)
        labels = labels.at[0, 0, 0].set(1)
        loss = masked_cross_entropy(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)


class TestTransforms:
    def test_pipeline_shapes_and_padding(self):
        ds = synthetic_seg_dataset(2, hw=(60, 80), classes=19)
        tf = Compose([
            RandScale((0.5, 2.0)),
            RandRotate((-10, 10), padding=(0.1, 0.2, 0.3)),
            RandomHorizontalFlip(),
            Crop((97, 97), "rand", padding=(0.1, 0.2, 0.3)),
            Normalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
        ])
        loader = SegLoader(ds, 2, tf, seed=0)
        images, labels = next(iter(loader))
        assert images.shape == (2, 97, 97, 3)
        assert labels.shape == (2, 97, 97)
        # padded label regions must be ignore_label
        assert (labels == 255).any()

    def test_resize(self):
        ds = synthetic_seg_dataset(1, hw=(50, 70), classes=19)
        img, lab = ds.load(0)
        img2, lab2 = Resize((33, 44))(np.random.RandomState(0), img, lab)
        assert img2.shape == (33, 44, 3) and lab2.shape == (33, 44)


@pytest.fixture(scope="module")
def seg_setup():
    model = fcn_cnsn(classes=19, block_idxs="1_2_3_4", pos="residual",
                     cn_pos="post", cnsn_type="cnsn", crop="style",
                     beta=1.0)
    x = jnp.zeros((2, 65, 65, 3), jnp.float32)
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
            "dropout": jax.random.key(2)}
    variables = model.init(rngs, x, False, None, None)
    return model, variables


class TestFCN:
    def test_output_shapes_and_cn_sites(self, seg_setup):
        model, variables = seg_setup
        assert model.cn_num == 16
        x = jnp.asarray(np.random.RandomState(0).randn(2, 65, 65, 3)
                        .astype(np.float32))
        out, aux = model.apply(variables, x, False, None, None)
        assert out.shape == (2, 65, 65, 19)
        assert aux.shape == (2, 65, 65, 19)
        assert np.isfinite(np.asarray(out)).all()

    def test_baseline_has_no_cnsn_params(self):
        model = fcn_baseline(classes=19)
        assert model.cn_num == 0
        v = model.init({"params": jax.random.key(0)},
                       jnp.zeros((1, 65, 65, 3)), False, None, None)
        flat = jax.tree_util.tree_leaves_with_path(v["params"])
        names = "/".join(str(p) for p, _ in flat)
        assert "cnsn" not in names and "real_cn" not in names

    def test_img_cn_block_idx_0(self):
        model = fcn_cnsn(classes=19, block_idxs="0_3_4", pos="residual",
                         cn_pos="post", cnsn_type="cnsn", crop="style")
        assert model.has_img_cn and model.cn_num == 9  # 6 + 3

    def test_train_step_and_metrics(self, seg_setup):
        model, variables = seg_setup
        tx = make_seg_optimizer(variables["params"], base_lr=0.01,
                                max_iter=100)
        state = SegTrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx)
        steps = SegStepFns(model, num_classes=19, active_num=1)

        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.randn(2, 65, 65, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 19, (2, 65, 65)))
        for fn in (steps.plain, steps.aug):
            new_state, metrics = fn(state, images, labels, jax.random.key(3))
            assert np.isfinite(float(metrics["loss"]))
            assert metrics["intersection"].shape == (19,)
        out = steps.eval_step(new_state, images, labels)
        iou = np.asarray(out["intersection"]) / np.maximum(
            np.asarray(out["union"]), 1)
        assert iou.shape == (19,)

    def test_head_lr_is_10x(self, seg_setup):
        model, variables = seg_setup
        tx = make_seg_optimizer(variables["params"], base_lr=1.0,
                                max_iter=10_000, weight_decay=0.0,
                                momentum=0.0)
        opt_state = tx.init(variables["params"])
        grads = jax.tree.map(jnp.ones_like, variables["params"])
        updates, _ = tx.update(grads, opt_state, variables["params"])
        up_head = float(jax.tree.leaves(updates["classifier"])[0].reshape(-1)[0])
        up_bb = float(jax.tree.leaves(updates["backbone"])[0].reshape(-1)[0])
        np.testing.assert_allclose(up_head / up_bb, 10.0, rtol=1e-5)
