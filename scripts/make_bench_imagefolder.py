"""Generate a synthetic JPEG ImageFolder for the input-fed benchmark.

Zero-egress environment: no real ImageNet on disk, so the input-fed
bench (BENCH_INPUT=host) decodes *synthetic* JPEGs with realistic
decode cost.  Pure noise compresses terribly (atypically expensive to
decode), so each image is smooth low-frequency content (upsampled
low-res noise) plus mild texture — file sizes and decode times land in
the range of real photographs at ImageNet-typical resolution (500x375,
quality 85, the torchvision ImageFolder shape class the reference
loads, /root/reference/imagenet.py:482-505).

Layout: <root>/<class_nnn>/<img_mmm>.jpg — torchvision ImageFolder
semantics (class-per-subdir), which data/imagenet.py::scan_image_folder
mirrors.  Deterministic per (seed, classes, per_class).
"""
import argparse
import os

import numpy as np
from PIL import Image


def make_image(rng: np.random.RandomState, w: int = 500, h: int = 375):
    # smooth base: 8x6 noise upsampled bilinearly (photograph-like
    # low-frequency energy), plus mild high-frequency texture
    base = rng.rand(6, 8, 3) * 255
    img = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (w, h), Image.BILINEAR), np.float32)
    img += rng.randn(h, w, 3) * 12.0
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def build(root: str, classes: int = 16, per_class: int = 160,
          seed: int = 0, quality: int = 85) -> int:
    rng = np.random.RandomState(seed)
    n = 0
    for c in range(classes):
        cdir = os.path.join(root, f"class_{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        for m in range(per_class):
            path = os.path.join(cdir, f"img_{m:04d}.jpg")
            if not os.path.exists(path):
                make_image(rng).save(path, quality=quality)
            else:
                # keep the rng stream aligned for partial re-runs
                make_image(rng)
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/repo/.bench_data/imagefolder")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--per-class", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    n = build(args.root, args.classes, args.per_class, args.seed)
    sizes = []
    for dirpath, _, files in os.walk(args.root):
        sizes += [os.path.getsize(os.path.join(dirpath, f)) for f in files]
    print(f"{n} images under {args.root}, "
          f"{sum(sizes) / 1e6:.1f} MB total, "
          f"median {np.median(sizes) / 1e3:.1f} kB")


if __name__ == "__main__":
    main()
