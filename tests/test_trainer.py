"""End-to-end Trainer tests: CIFAR synthetic smoke, ImageNet fake-folder
smoke (image-space CN regime), checkpoint resume parity."""
import os

import numpy as np
import pytest
import jax
from PIL import Image

from cnsn_tpu.config import load_config
from cnsn_tpu.train.trainer import Trainer


def test_cifar_trainer_smoke(tmp_path):
    cfg = load_config("cnsn_tpu/configs/cifar10/allconv/cn.yaml",
                      synthetic_data=True, epochs=1, batch_size=16,
                      eval_batch_size=32, exp_dir=str(tmp_path),
                      print_freq=100)
    import dataclasses
    cfg = dataclasses.replace(cfg, num_devices=2)
    t = Trainer(cfg)
    # synthetic dataset has 512 train images → 32 steps
    loss = t.train_epoch()
    assert np.isfinite(loss)
    tl, acc = t.evaluate_clean()
    assert 0.0 <= acc <= 1.0
    from cnsn_tpu.utils.checkpoint import restore_state, save_checkpoint
    p = save_checkpoint(t.state, "m", t.exp_dir, 1, acc, True)
    s2, ep, best = restore_state(p, t.state)
    assert ep == 1 and abs(best - acc) < 1e-9
    tl2, acc2 = t.evaluate_clean()
    assert abs(acc2 - acc) < 1e-9  # state unchanged by save/restore


def test_cifar_trainer_fsdp_smoke(tmp_path):
    """fsdp=true end-to-end: one epoch + clean eval with ZeRO-sharded
    state, checkpoint save → restore keeps the FSDP placement."""
    cfg = load_config("cnsn_tpu/configs/cifar10/allconv/cn.yaml",
                      synthetic_data=True, epochs=1, batch_size=16,
                      eval_batch_size=32, exp_dir=str(tmp_path),
                      print_freq=100)
    import dataclasses
    cfg = dataclasses.replace(cfg, num_devices=4, fsdp=True)
    t = Trainer(cfg)
    k = t.state.params["conv_0"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[-1] == k.shape[-1] // 4
    loss = t.train_epoch()
    assert np.isfinite(loss)
    tl, acc = t.evaluate_clean()
    assert 0.0 <= acc <= 1.0
    from cnsn_tpu.utils.checkpoint import save_checkpoint
    p = save_checkpoint(t.state, "m", t.exp_dir, 1, acc, True)
    cfg2 = dataclasses.replace(cfg, resume=p)
    t2 = Trainer(cfg2)
    k2 = t2.state.params["conv_0"]["kernel"]
    assert k2.sharding.shard_shape(k2.shape)[-1] == k2.shape[-1] // 4
    tl2, acc2 = t2.evaluate_clean()
    assert abs(acc2 - acc) < 1e-9


@pytest.fixture(scope="module")
def fake_imagenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.RandomState(0)
    for split, n in [("train", 3), ("validation", 2)]:
        for ci in range(3):
            d = root / split / f"n{ci:04d}"
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.randint(0, 255, (80, 96, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpeg")
    return str(root)


def test_imagenet_trainer_cn_image(fake_imagenet, tmp_path):
    cfg = load_config(
        None, dataset="imagenet", model="resnet50", exp_id="resnet50_cn",
        regime="auto", data_dir=fake_imagenet, epochs=1, batch_size=4,
        eval_batch_size=4, lr=0.1, weight_decay=1e-4, nesterov=False,
        schedule="imagenet_step", crop="both", beta=1.0, cn_prob=1.0,
        cnsn_type=None, exp_dir=str(tmp_path), image_size=64, workers=2,
        num_devices=2, print_freq=100)
    assert cfg.regime == "cn_image"
    t = Trainer(cfg)
    loss = t.train_epoch()
    assert np.isfinite(loss)
    tl, acc = t.evaluate_clean()
    assert 0.0 <= acc <= 1.0


def test_cifar_trainer_augmix_nojsd(tmp_path):
    """no_jsd=true: the loader yields the single mixed AugMix view
    (B,H,W,C) and the epoch runs the plain-CE/cn steps — the reference
    AugMixDataset no_jsd knob (utils.py:100-113) end to end."""
    cfg = load_config("cnsn_tpu/configs/cifar10/allconv/cnsn-augmix.yaml",
                      synthetic_data=True, epochs=1, batch_size=16,
                      eval_batch_size=32, exp_dir=str(tmp_path),
                      print_freq=100, no_jsd=True)
    t = Trainer(cfg)
    assert t.train_loader.mode == "train_augmix_nojsd"
    loss = t.train_epoch()
    assert np.isfinite(loss)


def test_no_jsd_rejected_outside_cifar(tmp_path):
    cfg = load_config("cnsn_tpu/configs/cifar10/allconv/cn.yaml",
                      synthetic_data=True, dataset="imagenet",
                      no_jsd=True, exp_dir=str(tmp_path))
    with pytest.raises(ValueError, match="no_jsd"):
        Trainer(cfg)
