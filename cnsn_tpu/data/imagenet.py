"""ImageNet / ImageNet-C folder pipelines (PIL + threads).

Mirrors the reference's torchvision ImageFolder usage
(imagenet.py:482-505 train/val; :426-450 ImageNet-C per
corruption×severity dirs) with a dependency-free scanner and a
thread-pool decode/augment stage feeding NHWC float32 batches.
"""
from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from .augmix import augmix
from .transforms import (center_crop_resize, imagenet_normalize,
                         random_resized_crop)
from .workers import PrefetchPool

__all__ = ["ImageFolderData", "scan_image_folder", "ImageNetLoader",
           "imagenet_c_dir"]

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


@dataclass
class ImageFolderData:
    samples: List[Tuple[str, int]]
    classes: List[str]


def scan_image_folder(root: str) -> ImageFolderData:
    """class-per-subdir layout, classes sorted (torchvision semantics)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for idx, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for dirpath, _, files in sorted(os.walk(cdir)):
            for fn in sorted(files):
                if fn.lower().endswith(_EXTS):
                    samples.append((os.path.join(dirpath, fn), idx))
    return ImageFolderData(samples, classes)


def imagenet_c_dir(corrupt_root: str, corruption: str,
                   severity: int) -> str:
    return os.path.join(corrupt_root, corruption, str(severity))


def _decode(path: str) -> Image.Image:
    with Image.open(path) as im:
        return im.convert("RGB")


def _augmix_item(item, image_size, aug_kw):
    """Pure per-image 3-view builder from (path, seed): decode,
    RandomResizedCrop+flip geometry, then (clean, augmix, augmix)
    (imagenet.py:487-499).  Module-level so the identical function runs
    in the thread pool or in PrefetchPool worker processes —
    bit-identical per seed either way."""
    path, seed = item
    rng = np.random.RandomState(seed)
    img = random_resized_crop(rng, _decode(path), image_size)
    arr = np.asarray(img, np.uint8)
    if rng.rand() < 0.5:
        arr = np.ascontiguousarray(arr[:, ::-1])
    return (imagenet_normalize(arr),
            augmix(rng, arr, imagenet_normalize, image_size, **aug_kw),
            augmix(rng, arr, imagenet_normalize, image_size, **aug_kw))


class ImageNetLoader:
    """mode: 'train' | 'train_augmix' | 'train_geom' | 'eval'.

    train_augmix yields (3, B, 224, 224, 3): geometric crop/flip then
    (clean, augmix, augmix) views, severity 1 (imagenet.py:487-488).
    train_geom yields the geometric stage only — (B, 224, 224, 3)
    uint8 after RandomResizedCrop + flip — feeding the on-device AugMix
    chain (data/augmix_jax.py), which moves the 3-view PIL op cost off
    the host CPUs (the AugMix recipes' input bottleneck).

    ``mp_workers > 0`` fans train_augmix out to that many worker
    *processes* with one-batch-ahead prefetch (the PIL op chain is
    GIL-bound, so the thread pool serializes at ~1 core; this is the
    reference's DataLoader num_workers overlap, imagenet.py:482-505).
    Outputs are bit-identical to the thread path for the same seed.
    """

    def __init__(self, data: ImageFolderData, batch_size: int,
                 mode: str = "train", seed: int = 0, image_size: int = 224,
                 workers: int = 8, aug_severity: float = 1,
                 mixture_width: int = 3, mixture_depth: int = -1,
                 all_ops: bool = False, drop_last: Optional[bool] = None,
                 use_native: bool = True, mp_workers: int = 0):
        self.data = data
        self.batch_size = batch_size
        self.mode = mode
        self.seed = seed
        self.image_size = image_size
        self.workers = workers
        self.aug_kw = dict(aug_severity=aug_severity,
                           mixture_width=mixture_width,
                           mixture_depth=mixture_depth, all_ops=all_ops)
        self.drop_last = (mode != "eval") if drop_last is None else drop_last
        self.epoch = 0
        self._pool = (PrefetchPool(mp_workers)
                      if mp_workers > 0 and mode == "train_augmix" else None)
        # native C++ decode path (csrc/loader.cc) for pure-JPEG datasets
        # in train/eval modes; AugMix keeps PIL (needs the PIL op chain)
        self.use_native = False
        if (use_native and mode in ("train", "eval", "train_geom")
                and data.samples):
            from . import native
            if (native.available()
                    and (mode != "train_geom" or native.geom_available())
                    and all(p.lower().endswith((".jpg", ".jpeg"))
                            for p, _ in data.samples[:64])):
                self.use_native = True

    def __len__(self):
        n, b = len(self.data.samples), self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def close(self):
        """Shut down the worker pool (idempotent; iteration falls back
        to the thread path afterwards).  Also a context manager."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _one_train(self, rng, path):
        img = random_resized_crop(rng, _decode(path), self.image_size)
        arr = np.asarray(img, np.uint8)
        if rng.rand() < 0.5:
            arr = arr[:, ::-1]
        return imagenet_normalize(arr)

    def _one_train_geom(self, rng, path):
        img = random_resized_crop(rng, _decode(path), self.image_size)
        arr = np.asarray(img, np.uint8)
        if rng.rand() < 0.5:
            arr = np.ascontiguousarray(arr[:, ::-1])
        return arr

    def _one_eval(self, _rng, path):
        img = center_crop_resize(_decode(path), 256, self.image_size)
        return imagenet_normalize(np.asarray(img, np.uint8))

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.RandomState(self.seed + self.epoch * 1009)
        self.epoch += 1
        n = len(self.data.samples)
        idx = rng.permutation(n) if self.mode != "eval" else np.arange(n)
        b = self.batch_size
        stop = (n // b) * b if self.drop_last else n
        if self.use_native:
            from . import native
            from .transforms import IMAGENET_MEAN, IMAGENET_STD
            for s in range(0, stop, b):
                sel = idx[s:s + b]
                paths = [self.data.samples[i][0] for i in sel]
                labels = np.asarray([self.data.samples[i][1] for i in sel],
                                    np.int32)
                if self.mode == "eval":
                    batch = native.decode_eval_batch(
                        paths, 256, self.image_size, IMAGENET_MEAN,
                        IMAGENET_STD, threads=self.workers)
                elif self.mode == "train_geom":
                    seeds = rng.randint(1, 2**62, len(paths)).astype(np.uint64)
                    batch = native.decode_geom_batch(
                        paths, self.image_size, seeds, threads=self.workers)
                else:
                    seeds = rng.randint(1, 2**62, len(paths)).astype(np.uint64)
                    batch = native.decode_train_batch(
                        paths, self.image_size, IMAGENET_MEAN, IMAGENET_STD,
                        seeds, threads=self.workers)
                yield batch, labels
            return

        if self.mode == "train_augmix":
            fn = functools.partial(_augmix_item, image_size=self.image_size,
                                   aug_kw=self.aug_kw)

            def gen():
                for s in range(0, stop, b):
                    sel = idx[s:s + b]
                    seeds = rng.randint(0, 2**31, len(sel))
                    yield ([(self.data.samples[i][0], sd)
                            for i, sd in zip(sel, seeds)],
                           np.asarray([self.data.samples[i][1] for i in sel],
                                      np.int32))

            def assemble(results):
                return np.stack([np.stack(v)
                                 for v in zip(*results)]).astype(np.float32)

            if self._pool is not None:
                for results, labels in self._pool.run(fn, gen()):
                    yield assemble(results), labels
            else:
                with ThreadPoolExecutor(self.workers) as pool:
                    for items, labels in gen():
                        yield assemble(list(pool.map(fn, items))), labels
            return

        fn = {"train": self._one_train, "train_geom": self._one_train_geom,
              "eval": self._one_eval}[self.mode]
        with ThreadPoolExecutor(self.workers) as pool:
            for s in range(0, stop, b):
                sel = idx[s:s + b]
                paths = [self.data.samples[i][0] for i in sel]
                labels = np.asarray([self.data.samples[i][1] for i in sel],
                                    np.int32)
                rngs = [np.random.RandomState(rng.randint(2**31))
                        for _ in sel]
                results = list(pool.map(fn, rngs, paths))
                if self.mode == "train_geom":
                    # stays uint8: the device-side AugMix consumes raw
                    # pixels (and the host→device copy is 4x smaller)
                    yield np.stack(results), labels
                    continue
                batch = np.stack(results)
                yield batch.astype(np.float32), labels
