"""Native C++ loader tests: decode correctness vs PIL and a throughput
sanity comparison."""
import time

import numpy as np
import pytest
from PIL import Image

from cnsn_tpu.data import native
from cnsn_tpu.data.imagenet import ImageNetLoader, scan_image_folder
from cnsn_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                      center_crop_resize, imagenet_normalize)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    for ci in range(2):
        d = root / f"n{ci:03d}"
        d.mkdir()
        for i in range(8):
            arr = rng.randint(0, 255, (300 + 10 * i, 400, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpeg", quality=95)
    return str(root)


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


def test_eval_decode_matches_pil(jpeg_dir):
    data = scan_image_folder(jpeg_dir)
    paths = [p for p, _ in data.samples[:4]]
    out = native.decode_eval_batch(paths, 256, 224, IMAGENET_MEAN,
                                   IMAGENET_STD, threads=4)
    assert out.shape == (4, 224, 224, 3)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            ref = imagenet_normalize(
                np.asarray(center_crop_resize(im.convert("RGB"), 256, 224),
                           np.uint8))
        # different bilinear implementations: compare loosely
        diff = np.abs(out[i] - ref)
        assert np.median(diff) < 0.06, float(np.median(diff))
        assert np.mean(diff) < 0.15, float(np.mean(diff))


def test_train_decode_shapes_and_determinism(jpeg_dir):
    data = scan_image_folder(jpeg_dir)
    paths = [p for p, _ in data.samples[:4]]
    seeds = np.arange(1, 5, dtype=np.uint64)
    a = native.decode_train_batch(paths, 224, IMAGENET_MEAN, IMAGENET_STD,
                                  seeds, threads=2)
    b = native.decode_train_batch(paths, 224, IMAGENET_MEAN, IMAGENET_STD,
                                  seeds, threads=4)
    assert a.shape == (4, 224, 224, 3)
    np.testing.assert_array_equal(a, b)  # seed-deterministic
    c = native.decode_train_batch(paths, 224, IMAGENET_MEAN, IMAGENET_STD,
                                  seeds + 100, threads=2)
    assert not np.allclose(a, c)


def test_loader_uses_native_and_matches_labels(jpeg_dir):
    data = scan_image_folder(jpeg_dir)
    loader = ImageNetLoader(data, 8, mode="eval", workers=4)
    assert loader.use_native
    x, y = next(iter(loader))
    assert x.shape == (8, 224, 224, 3) and np.isfinite(x).all()
    loader_pil = ImageNetLoader(data, 8, mode="eval", workers=4,
                                use_native=False)
    x2, y2 = next(iter(loader_pil))
    np.testing.assert_array_equal(y, y2)
    assert np.mean(np.abs(x - x2)) < 0.15


def test_native_not_slower_than_pil(jpeg_dir):
    """Native path must at least match the threaded PIL path even on a
    single-core box (on multi-core hosts it scales with threads while
    PIL's numpy stages are GIL-bound)."""
    data = scan_image_folder(jpeg_dir)

    def run(use_native):
        loader = ImageNetLoader(data, 16, mode="eval", workers=8,
                                use_native=use_native)
        next(iter(loader))  # warm (and build the lib)
        t0 = time.perf_counter()
        for _ in iter(loader):
            pass
        return time.perf_counter() - t0

    t_native, t_pil = run(True), run(False)
    print(f"native {t_native:.3f}s vs PIL-threads {t_pil:.3f}s")
    assert t_native < t_pil * 1.2


def test_native_geom_batch(tmp_path):
    """uint8 geometry batch: native decode_geom_batch matches the
    normalized train batch it feeds (same seeds => same crops/flips)."""
    from cnsn_tpu.data import native
    from cnsn_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    if not (native.available() and native.geom_available()):
        pytest.skip("native loader unavailable")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        arr = rng.randint(0, 255, (70, 90, 3)).astype(np.uint8)
        p = tmp_path / f"im{i}.jpeg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    seeds = np.asarray([11, 22, 33], np.uint64)
    geom = native.decode_geom_batch(paths, 48, seeds, threads=2)
    assert geom.shape == (3, 48, 48, 3) and geom.dtype == np.uint8
    norm = native.decode_train_batch(paths, 48, IMAGENET_MEAN,
                                     IMAGENET_STD, seeds, threads=2)
    expect = (geom.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(norm, expect, atol=1e-5)


def test_imagenet_loader_native_geom(tmp_path):
    from cnsn_tpu.data import native
    from cnsn_tpu.data.imagenet import ImageNetLoader, scan_image_folder
    if not (native.available() and native.geom_available()):
        pytest.skip("native loader unavailable")
    rng = np.random.RandomState(1)
    for ci, cls in enumerate(["a", "b"]):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (64, 64, 3)).astype(
                np.uint8)).save(d / f"x{i}.jpeg")
    data = scan_image_folder(str(tmp_path))
    loader = ImageNetLoader(data, 2, mode="train_geom", image_size=32,
                            workers=2)
    assert loader.use_native
    x, y = next(iter(loader))
    assert x.shape == (2, 32, 32, 3) and x.dtype == np.uint8
