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


class TestPSA:
    """True PSANet parity: psa_mask gather vs a direct scatter oracle
    reproducing the reference CUDA op (segmentation/lib/psa semantics,
    psanet.py:67,85-86), plus bmm orientation and forward shapes."""

    def _scatter_oracle(self, y, mask_h, mask_w, distribute):
        """Zero-filled (n, h*w, h*w) buffer; position (i,j) writes its
        mask values at global offsets — column p for collect, row p for
        distribute (the reference kernels' index layouts)."""
        n, m, h, w = y.shape
        half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
        out = np.zeros((n, h * w, h * w), y.dtype)
        for i in range(h):
            for j in range(w):
                p = i * w + j
                for dh in range(mask_h):
                    a = dh + i - half_h
                    if not (0 <= a < h):
                        continue
                    for dw in range(mask_w):
                        b = dw + j - half_w
                        if not (0 <= b < w):
                            continue
                        g = a * w + b
                        if distribute:
                            out[:, p, g] = y[:, dh * mask_w + dw, i, j]
                        else:
                            out[:, g, p] = y[:, dh * mask_w + dw, i, j]
        return out

    @pytest.mark.parametrize("distribute", [False, True])
    def test_mask_gather_matches_scatter_oracle(self, distribute):
        from cnsn_tpu.segmentation.pspnet import PSA, psa_mask_indices
        rng = np.random.RandomState(3)
        h = w = 5
        mask_h = mask_w = 2 * h - 1
        y = rng.randn(2, mask_h * mask_w, h, w).astype(np.float32)
        oracle = self._scatter_oracle(y, mask_h, mask_w, distribute)

        idx = jnp.asarray(psa_mask_indices(h, w, mask_h, mask_w))
        psa = PSA()
        y_nhwc = jnp.asarray(y.transpose(0, 2, 3, 1))
        a = psa._expand(y_nhwc, idx)
        if distribute:
            a = a.transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(a), oracle, atol=1e-6)

    def test_mask_window_smaller_than_grid(self):
        from cnsn_tpu.segmentation.pspnet import psa_mask_indices
        # a 3x3 window on a 5x5 grid: each position sees <= 9 globals
        idx = psa_mask_indices(5, 5, 3, 3)
        assert idx.shape == (25, 25)
        sentinel = 9
        for p in range(25):
            assert (idx[:, p] != sentinel).sum() <= 9
        # center position (2,2) has a full window centered on itself
        col = idx[:, 12].reshape(5, 5)
        assert col[2, 2] == 4  # mask center channel
        assert (col != sentinel).sum() == 9

    def test_branch_bmm_matches_torch_semantics(self):
        """out = bmm(x.view(n,c,hw), attn.view(n,hw,hw)) with softmax
        over dim=1 incl. the zero fill (psanet.py:68-70)."""
        import torch
        from cnsn_tpu.segmentation.pspnet import PSA, psa_mask_indices
        rng = np.random.RandomState(7)
        n, h, w, c = 2, 4, 4, 6
        mask_h = mask_w = 2 * h - 1
        feat = rng.randn(n, h, w, c).astype(np.float32)
        y = rng.randn(n, h, w, mask_h * mask_w).astype(np.float32)

        psa = PSA(normalization_factor=1.0, psa_softmax=True)
        idx = jnp.asarray(psa_mask_indices(h, w, mask_h, mask_w))
        got = psa._branch(jnp.asarray(feat), jnp.asarray(y), idx,
                          distribute=False)

        buf = self._scatter_oracle(y.transpose(0, 3, 1, 2), mask_h, mask_w,
                                   distribute=False)
        t_attn = torch.softmax(torch.from_numpy(buf), dim=1)
        t_x = torch.from_numpy(
            feat.transpose(0, 3, 1, 2).reshape(n, c, h * w))
        t_out = torch.bmm(t_x, t_attn).reshape(n, c, h, w)
        np.testing.assert_allclose(
            np.asarray(got), t_out.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)

    def test_psanet_forward_shapes(self):
        from cnsn_tpu.segmentation.pspnet import PSANet
        model = PSANet(classes=7, block_idxs="1_2_3_4", pos="residual",
                       cn_pos="post", cnsn_type="cnsn", crop="neither")
        x = jnp.zeros((1, 33, 33, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0)}, x, False, None, None)
        out, aux = model.apply(variables, x, False, None, None)
        assert out.shape == (1, 33, 33, 7)
        assert aux.shape == (1, 33, 33, 7)
        assert model.cn_num == 16

    def test_psa_compact_collect_vs_expand_equivalence(self):
        """compact=True with a full-grid map equals the expanded path
        when the attention values agree (distribute transposition)."""
        from cnsn_tpu.segmentation.pspnet import PSA
        rng = np.random.RandomState(11)
        n, h, w, c = 1, 3, 3, 4
        feat = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
        y = jnp.asarray(rng.randn(n, h, w, h * w).astype(np.float32))
        psa = PSA(compact=True)
        out_c = psa._branch(feat, y, None, distribute=False)
        out_d = psa._branch(feat, y, None, distribute=True)
        assert out_c.shape == out_d.shape == (n, h, w, c)
        assert not np.allclose(np.asarray(out_c), np.asarray(out_d))


def test_seg_trainer_train_epoch_smoke(tmp_path):
    """One SegTrainer epoch end-to-end on synthetic data — guards the
    host loop itself (loop variables, prefetch staging, meters), which
    the step-level tests bypass."""
    from cnsn_tpu.segmentation.data import synthetic_seg_dataset
    from cnsn_tpu.segmentation.trainer import SegConfig, SegTrainer

    cfg = SegConfig(arch="fcn_cnsn", classes=5, train_h=33, train_w=33,
                    batch_size=4, batch_size_val=4, epochs=1,
                    cnsn_type="cnsn", pos="residual", cn_pos="post",
                    block_idxs="1", crop="neither", mix_prob=1.0,
                    save_path=str(tmp_path), print_freq=2,
                    num_devices=4)
    train_ds = synthetic_seg_dataset(8, hw=(41, 41), classes=5)
    val_ds = synthetic_seg_dataset(4, hw=(33, 33), classes=5, seed=7)
    tr = SegTrainer(cfg, train_ds, val_ds, None)
    tr.train_epoch(0)


def test_seg_trainer_fsdp_spatial_smoke(tmp_path):
    """fsdp=true composed with spatial=2: ZeRO param/moment sharding over
    'data' while images shard H over 'spatial'; one epoch end-to-end."""
    from cnsn_tpu.segmentation.data import synthetic_seg_dataset
    from cnsn_tpu.segmentation.trainer import SegConfig, SegTrainer

    cfg = SegConfig(arch="fcn_cnsn", classes=5, train_h=33, train_w=33,
                    batch_size=4, batch_size_val=4, epochs=1,
                    cnsn_type="sn", pos="residual", cn_pos=None,
                    block_idxs="1", crop="neither",
                    save_path=str(tmp_path), print_freq=2,
                    num_devices=8, spatial=2, fsdp=True, eval_freq=100)
    train_ds = synthetic_seg_dataset(8, hw=(41, 41), classes=5)
    tr = SegTrainer(cfg, train_ds, None)
    k = tr.state.params["backbone"]["conv1"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[-1] == k.shape[-1] // 4
    tr.train_epoch(0)
    k2 = tr.state.params["backbone"]["conv1"]["kernel"]
    assert k2.sharding.shard_shape(k2.shape)[-1] == k2.shape[-1] // 4


def test_seg_trainer_orbax_auto_restore(tmp_path):
    """Seg failure recovery: with ckpt_backend='orbax', a fresh
    SegTrainer pointed at an experiment dir that already holds a
    checkpoint must auto-restore it in __init__ (scheduler-restart
    semantics — the SIGTERM flush is useless if the restarted process
    trains from scratch; reference --resume: train_cnsn.py:191-204)."""
    from cnsn_tpu.segmentation.data import synthetic_seg_dataset
    from cnsn_tpu.segmentation.trainer import SegConfig, SegTrainer

    kw = dict(arch="fcn_cnsn", classes=5, train_h=33, train_w=33,
              batch_size=4, batch_size_val=4, epochs=1,
              cnsn_type="sn", pos="residual", cn_pos=None,
              block_idxs="1", crop="neither",
              save_path=str(tmp_path), print_freq=2, num_devices=4,
              ckpt_backend="orbax", eval_freq=100)
    train_ds = synthetic_seg_dataset(8, hw=(41, 41), classes=5)
    tr = SegTrainer(SegConfig(**kw), train_ds, None)
    tr.fit()
    step = int(jax.device_get(tr.state.step))
    assert step > 0

    tr2 = SegTrainer(SegConfig(**kw), train_ds, None)
    assert int(jax.device_get(tr2.state.step)) == step
    assert tr2.cfg.start_epoch == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(jax.device_get(tr2.state.params))[0]),
        np.asarray(jax.tree.leaves(jax.device_get(tr.state.params))[0]))


def test_seg_validate_shard_safe_odd_tail(tmp_path):
    """validate() over the full 8-device mesh with an odd-sized val set
    (drop_last=False ⇒ a 3-row tail on batch 4): tail batches must be
    padded to the mesh width (no shard error, no per-tail recompile)
    and the padding must not perturb the metrics — the result has to
    match an unsharded run over the same data."""
    from cnsn_tpu.segmentation.data import synthetic_seg_dataset
    from cnsn_tpu.segmentation.trainer import SegConfig, SegTrainer

    kw = dict(arch="fcn_cnsn", classes=5, train_h=33, train_w=33,
              batch_size=4, batch_size_val=4, epochs=1,
              cnsn_type="cnsn", pos="residual", cn_pos="post",
              block_idxs="1", crop="neither", mix_prob=1.0,
              print_freq=2)
    train_ds = synthetic_seg_dataset(8, hw=(41, 41), classes=5)
    val_ds = synthetic_seg_dataset(7, hw=(33, 33), classes=5, seed=7)

    tr8 = SegTrainer(SegConfig(save_path=str(tmp_path / "m8"),
                               num_devices=8, **kw), train_ds, val_ds)
    r8 = tr8.validate()

    tr1 = SegTrainer(SegConfig(save_path=str(tmp_path / "m1"),
                               num_devices=1, **kw), train_ds, val_ds)
    pull = lambda t: tr1.dp.replicate(jax.device_get(t))
    tr1.state = tr1.state.replace(params=pull(tr8.state.params),
                                  batch_stats=pull(tr8.state.batch_stats))
    r1 = tr1.validate()

    assert abs(r8["mIoU"] - r1["mIoU"]) < 1e-6
    assert abs(r8["loss"] - r1["loss"]) < 1e-5
    np.testing.assert_allclose(r8["iou_class"], r1["iou_class"], atol=1e-6)


class TestLowresCE:
    """Class-major fused upsample+CE (segmentation/upsample.py) must
    reproduce the resize+NHWC path exactly."""

    def test_bilinear_matrix_matches_resize(self):
        from cnsn_tpu.segmentation.upsample import bilinear_matrix
        rng = np.random.RandomState(0)
        # upscale only: resize antialiases on downscale (guarded)
        for out_s, in_s in ((89, 12), (64, 9), (33, 33), (713, 90)):
            x = rng.randn(2, in_s, in_s, 5).astype(np.float32)
            ref = jax.image.resize(jnp.asarray(x), (2, out_s, out_s, 5),
                                   "bilinear")
            ah = jnp.asarray(bilinear_matrix(out_s, in_s))
            got = jnp.einsum("Hh,bhwc->bHwc", ah, jnp.asarray(x))
            got = jnp.einsum("Ww,bHwc->bHWc", ah, got)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)

    def test_upsample_nll_and_pred_match_reference_path(self):
        from cnsn_tpu.segmentation.train_seg import masked_cross_entropy
        from cnsn_tpu.segmentation.upsample import (upsample_argmax,
                                                    upsample_nll_sum)
        rng = np.random.RandomState(1)
        lr = jnp.asarray(rng.randn(2, 9, 11, 7).astype(np.float32))
        labels = rng.randint(0, 7, (2, 41, 51)).astype(np.int32)
        labels[0, :7] = 255  # ignore region
        labels = jnp.asarray(labels)
        hi = jax.image.resize(lr, (2, 41, 51, 7), "bilinear")
        ref_loss = masked_cross_entropy(hi, labels, 255)
        s, n = upsample_nll_sum(lr, labels, 255)
        np.testing.assert_allclose(float(s / jnp.maximum(n, 1)),
                                   float(ref_loss), rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(upsample_argmax(lr, 41, 51)),
            np.asarray(jnp.argmax(hi, axis=-1)))

    def test_step_modes_agree(self):
        """One train step in each CE mode from identical state: same
        loss/metrics, same parameter update."""
        from cnsn_tpu.segmentation import (SegStepFns, SegTrainState,
                                           fcn_cnsn, make_seg_optimizer)
        model = fcn_cnsn(classes=5, block_idxs="1", pos="residual",
                         cn_pos="post", cnsn_type="cnsn", crop="neither")
        x = jnp.asarray(np.random.RandomState(2).randn(2, 33, 33, 3)
                        .astype(np.float32))
        yl = jnp.asarray(np.random.RandomState(3)
                         .randint(0, 5, (2, 33, 33)).astype(np.int32))
        rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
                "dropout": jax.random.key(2)}
        v = model.init(rngs, x, False, None, None)
        tx = make_seg_optimizer(v["params"], 0.01, 100)
        state = SegTrainState.create(apply_fn=model.apply,
                                     params=v["params"],
                                     batch_stats=v["batch_stats"], tx=tx)
        outs = {}
        for mode in (False, True):
            steps = SegStepFns(model, num_classes=5, lowres_ce=mode)
            s2, m = steps.aug(state, x, yl, jax.random.key(7))
            outs[mode] = (s2, m)
        m0, m1 = outs[False][1], outs[True][1]
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(m0["intersection"]),
                                      np.asarray(m1["intersection"]))
        p0 = jax.tree.leaves(outs[False][0].params)[0]
        p1 = jax.tree.leaves(outs[True][0].params)[0]
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=1e-4, atol=1e-6)


def test_selective_remat_stage_spec():
    """remat='1_2' / '3_4' (stage-selective rematerialization,
    backbone.py:SegResNet.remat) must not change the computed function
    — same init, same forward, same gradient as remat=False."""
    from cnsn_tpu.segmentation import fcn_cnsn
    x = jnp.asarray(np.random.RandomState(0).randn(1, 33, 33, 3)
                    .astype(np.float32))
    rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
            "dropout": jax.random.key(2)}
    ref_model = fcn_cnsn(classes=5, block_idxs="1", pos="residual",
                         cn_pos="post", cnsn_type="cnsn", crop="neither",
                         remat=False)
    v = ref_model.init(rngs, x, False, None, None)

    def loss(model, params):
        out, aux = model.apply({"params": params,
                                "batch_stats": v["batch_stats"]},
                               x, False, None, None)
        return jnp.sum(out ** 2)

    ref_l, ref_g = jax.value_and_grad(lambda p: loss(ref_model, p))(
        v["params"])
    for spec in (True, "1_2", "3_4", "2"):
        m = fcn_cnsn(classes=5, block_idxs="1", pos="residual",
                     cn_pos="post", cnsn_type="cnsn", crop="neither",
                     remat=spec)
        l, g = jax.value_and_grad(lambda p: loss(m, p))(v["params"])
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(g)):
            a, b = np.asarray(a), np.asarray(b)
            # remat recompute reassociates fp32 — compare at a
            # tolerance scaled to the leaf's magnitude
            np.testing.assert_allclose(a, b, rtol=1e-3,
                                       atol=1e-4 * max(np.abs(b).max(), 1.0))


class TestLowresCEAlignCorners:
    """PSP/PSA heads upsample with align_corners=True — the fused
    class-major path must match that variant exactly."""

    def test_matrix_matches_resize_align_corners(self):
        from cnsn_tpu.segmentation.pspnet import _resize_align_corners
        from cnsn_tpu.segmentation.upsample import bilinear_matrix
        rng = np.random.RandomState(0)
        for out_s, in_s in ((89, 12), (33, 33), (713, 90), (9, 1)):
            x = rng.randn(2, in_s, in_s, 5).astype(np.float32)
            ref = _resize_align_corners(jnp.asarray(x), (out_s, out_s))
            ah = jnp.asarray(bilinear_matrix(out_s, in_s,
                                             align_corners=True))
            got = jnp.einsum("Hh,bhwc->bHwc", ah, jnp.asarray(x))
            got = jnp.einsum("Ww,bHwc->bHWc", ah, got)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)

    def test_psp_step_modes_agree(self):
        from cnsn_tpu.segmentation import (SegStepFns, SegTrainState,
                                           make_seg_optimizer)
        from cnsn_tpu.segmentation.pspnet import PSPNet
        model = PSPNet(classes=5, block_idxs="1", pos="residual",
                       cn_pos="post", cnsn_type="cnsn", crop="neither")
        x = jnp.asarray(np.random.RandomState(2).randn(2, 33, 33, 3)
                        .astype(np.float32))
        yl = jnp.asarray(np.random.RandomState(3)
                         .randint(0, 5, (2, 33, 33)).astype(np.int32))
        rngs = {"params": jax.random.key(0), "crossnorm": jax.random.key(1),
                "dropout": jax.random.key(2)}
        v = model.init(rngs, x, False, None, None)
        tx = make_seg_optimizer(v["params"], 0.01, 100)
        state = SegTrainState.create(apply_fn=model.apply,
                                     params=v["params"],
                                     batch_stats=v["batch_stats"], tx=tx)
        outs = {}
        for mode in (False, True):
            steps = SegStepFns(model, num_classes=5, lowres_ce=mode)
            assert steps.align_corners
            s2, m = steps.aug(state, x, yl, jax.random.key(7))
            outs[mode] = (s2, m)
        m0, m1 = outs[False][1], outs[True][1]
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(m0["intersection"]),
                                      np.asarray(m1["intersection"]))
        e0 = SegStepFns(model, num_classes=5, lowres_ce=False).eval_sum(
            outs[False][0], x, yl)
        e1 = SegStepFns(model, num_classes=5, lowres_ce=True).eval_sum(
            outs[True][0], x, yl)
        np.testing.assert_allclose(float(e0["nll_sum"]), float(e1["nll_sum"]),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(e0["intersection"]),
                                      np.asarray(e1["intersection"]))
