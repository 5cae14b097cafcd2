"""Segmentation data: list-file datasets + paired image/label transforms.

Parity with the reference pipeline (segmentation/util/transform.py:11-239
and segmentation/util/dataset.py:18-97): every geometric op is applied
jointly to image (linear interp) and label (nearest); Crop pads with
the dataset mean on the image and ignore_label on the label; RandScale,
RandRotate, flips, and gaussian blur match the reference's cv2
semantics.  Datasets are 'image_path label_path' list files (GTAV
images/%05d.png + labels_mapped, Cityscapes path pairs), plus a
synthetic generator for tests.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

__all__ = [
    "SegSample", "SegDataset", "SegLoader", "Compose", "Resize", "RandScale",
    "Crop", "RandRotate", "RandomHorizontalFlip", "RandomVerticalFlip",
    "RandomGaussianBlur", "Normalize", "make_list_dataset",
    "synthetic_seg_dataset",
]


# ---- paired transforms (callable(rng, image f32 HWC, label i32 HW)) -----

class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = transforms

    def __call__(self, rng, image, label):
        for t in self.transforms:
            image, label = t(rng, image, label)
        return image, label


class Resize:
    def __init__(self, size: Tuple[int, int]):
        self.size = size  # (h, w)

    def __call__(self, rng, image, label):
        h, w = self.size
        image = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label, (w, h), interpolation=cv2.INTER_NEAREST)
        return image, label


class RandScale:
    def __init__(self, scale: Tuple[float, float],
                 aspect_ratio: Optional[Tuple[float, float]] = None):
        self.scale = scale
        self.aspect_ratio = aspect_ratio

    def __call__(self, rng, image, label):
        s = self.scale[0] + (self.scale[1] - self.scale[0]) * rng.rand()
        ar_h = ar_w = 1.0
        if self.aspect_ratio is not None:
            ar = (self.aspect_ratio[0]
                  + (self.aspect_ratio[1] - self.aspect_ratio[0]) * rng.rand())
            ar = ar ** 0.5
            ar_h, ar_w = ar, 1.0 / ar
        fx, fy = s * ar_w, s * ar_h
        image = cv2.resize(image, None, fx=fx, fy=fy,
                           interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label, None, fx=fx, fy=fy,
                           interpolation=cv2.INTER_NEAREST)
        return image, label


class Crop:
    """Random/center crop to (h, w), padding short sides with the image
    mean / ignore_label (reference transform.py Crop)."""

    def __init__(self, size: Tuple[int, int], crop_type: str = "rand",
                 padding: Optional[Sequence[float]] = None,
                 ignore_label: int = 255):
        self.size = size
        self.crop_type = crop_type
        self.padding = padding or (0.0, 0.0, 0.0)
        self.ignore_label = ignore_label

    def __call__(self, rng, image, label):
        ch, cw = self.size
        h, w = label.shape
        pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
        if pad_h > 0 or pad_w > 0:
            t, b = pad_h // 2, pad_h - pad_h // 2
            l, r = pad_w // 2, pad_w - pad_w // 2
            image = cv2.copyMakeBorder(image, t, b, l, r,
                                       cv2.BORDER_CONSTANT,
                                       value=tuple(self.padding))
            label = cv2.copyMakeBorder(label, t, b, l, r,
                                       cv2.BORDER_CONSTANT,
                                       value=self.ignore_label)
            h, w = label.shape
        if self.crop_type == "rand":
            y = rng.randint(0, h - ch + 1)
            x = rng.randint(0, w - cw + 1)
        else:
            y, x = (h - ch) // 2, (w - cw) // 2
        return (image[y:y + ch, x:x + cw],
                np.ascontiguousarray(label[y:y + ch, x:x + cw]))


class RandRotate:
    def __init__(self, rotate: Tuple[float, float],
                 padding: Sequence[float], ignore_label: int = 255,
                 p: float = 0.5):
        self.rotate = rotate
        self.padding = padding
        self.ignore_label = ignore_label
        self.p = p

    def __call__(self, rng, image, label):
        if rng.rand() < self.p:
            angle = self.rotate[0] + (self.rotate[1] - self.rotate[0]) * rng.rand()
            h, w = label.shape
            m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1)
            image = cv2.warpAffine(image, m, (w, h),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_CONSTANT,
                                   borderValue=tuple(self.padding))
            label = cv2.warpAffine(label, m, (w, h),
                                   flags=cv2.INTER_NEAREST,
                                   borderMode=cv2.BORDER_CONSTANT,
                                   borderValue=self.ignore_label)
        return image, label


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, rng, image, label):
        if rng.rand() < self.p:
            return cv2.flip(image, 1), cv2.flip(label, 1)
        return image, label


class RandomVerticalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, rng, image, label):
        if rng.rand() < self.p:
            return cv2.flip(image, 0), cv2.flip(label, 0)
        return image, label


class RandomGaussianBlur:
    def __init__(self, radius: int = 5, p: float = 0.5):
        self.radius = radius
        self.p = p

    def __call__(self, rng, image, label):
        if rng.rand() < self.p:
            image = cv2.GaussianBlur(image, (self.radius, self.radius), 0)
        return image, label


class Normalize:
    def __init__(self, mean: Sequence[float], std: Optional[Sequence[float]] = None):
        self.mean = np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)

    def __call__(self, rng, image, label):
        image = image - self.mean
        if self.std is not None:
            image = image / self.std
        return image, label


# ---- datasets -----------------------------------------------------------

@dataclass
class SegSample:
    image_path: str
    label_path: str


class SegDataset:
    def __init__(self, samples: List[SegSample]):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def load(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        s = self.samples[i]
        image = cv2.imread(s.image_path, cv2.IMREAD_COLOR)
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB).astype(np.float32)
        label = cv2.imread(s.label_path, cv2.IMREAD_GRAYSCALE)
        return image, label.astype(np.int32)


def make_list_dataset(data_root: str, list_path: str) -> SegDataset:
    """'image_path label_path' per line, relative to data_root
    (reference segmentation/util/dataset.py make_dataset)."""
    samples = []
    with open(list_path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 2:
                continue
            samples.append(SegSample(os.path.join(data_root, parts[0]),
                                     os.path.join(data_root, parts[1])))
    if not samples:
        raise RuntimeError(f"no samples in {list_path}")
    return SegDataset(samples)


class _SyntheticSegDataset(SegDataset):
    def __init__(self, n: int, hw: Tuple[int, int], classes: int, seed: int = 0):
        super().__init__([SegSample("", "")] * n)
        self.n, self.hw, self.classes, self.seed = n, hw, classes, seed

    def load(self, i):
        rng = np.random.RandomState(self.seed * 100003 + i)
        image = rng.randint(0, 256, (*self.hw, 3)).astype(np.float32)
        label = rng.randint(0, self.classes, self.hw).astype(np.int32)
        label[:2, :2] = 255  # some ignore pixels
        return image, label


def synthetic_seg_dataset(n: int = 8, hw=(97, 113), classes: int = 19,
                          seed: int = 0) -> SegDataset:
    return _SyntheticSegDataset(n, hw, classes, seed)


class SegLoader:
    """Batch iterator: transform pairs → (B,H,W,3) float32 + (B,H,W) int32."""

    def __init__(self, dataset: SegDataset, batch_size: int,
                 transform: Callable, seed: int = 0, shuffle: bool = True,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n, b = len(self.dataset), self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.RandomState(self.seed + 1009 * self.epoch)
        self.epoch += 1
        n = len(self.dataset)
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        b = self.batch_size
        stop = (n // b) * b if self.drop_last else n
        for s in range(0, stop, b):
            images, labels = [], []
            for i in idx[s:s + b]:
                img, lab = self.dataset.load(int(i))
                img, lab = self.transform(rng, img, lab)
                images.append(img)
                labels.append(lab)
            yield (np.stack(images).astype(np.float32),
                   np.stack(labels).astype(np.int32))
