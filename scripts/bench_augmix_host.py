"""Host AugMix throughput: serial vs PrefetchPool worker processes.

Measures PIL AugMix views/s on this host for the two loader paths the
AugMix recipes depend on (VERDICT r3 #3):
  * CIFAR 32x32 3-view train_augmix (CifarLoader)
  * ImageNet-style 224x224 3-view train_augmix (ImageNetLoader over a
    synthesized JPEG dir — zero-egress environment has no datasets)

The pool path is bit-identical to the serial path per seed (tested in
tests/test_data.py::TestAugmixWorkerPool); this script quantifies the
overlap/scaling: on an N-core host the pool sustains ~N x the
single-core views/s, which is what closes the README crossover table
(the 224^2 AugMix recipes need ~1,200 views/s to keep the TPU fed).

Usage: python scripts/bench_augmix_host.py [--out perf/augmix_host.jsonl]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_cifar(workers, n_images=256, batch=64, seed=0):
    from cnsn_tpu.data import CifarLoader, load_cifar
    data = load_cifar("/nonexistent", "cifar10", True, synthetic=True,
                      synthetic_size=n_images)
    loader = CifarLoader(data, batch, mode="train_augmix", seed=seed,
                         workers=workers)
    try:
        t0 = time.perf_counter()
        n = sum(x.shape[1] for x, _ in loader)
        dt = time.perf_counter() - t0
    finally:
        loader.close()
    return 3 * n / dt  # 3 views per sample


def bench_imagenet(workers, n_images=64, batch=16, size=224, seed=0):
    from PIL import Image
    from cnsn_tpu.data.imagenet import ImageNetLoader, scan_image_folder
    root = tempfile.mkdtemp(prefix="augmix_bench_")
    try:
        rng = np.random.RandomState(0)
        d = os.path.join(root, "n01")
        os.makedirs(d)
        for i in range(n_images):
            arr = rng.randint(0, 256, (256, 320, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im_{i}.jpeg"),
                                      quality=85)
        data = scan_image_folder(root)
        loader = ImageNetLoader(data, batch, mode="train_augmix",
                                image_size=size, seed=seed,
                                workers=max(1, workers),
                                mp_workers=workers)
        try:
            t0 = time.perf_counter()
            n = sum(x.shape[1] for x, _ in loader)
            dt = time.perf_counter() - t0
        finally:
            loader.close()
        return 3 * n / dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="perf/augmix_host.jsonl")
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 1, 2, 4])
    args = ap.parse_args()

    ncpu = os.cpu_count()
    rows = []
    for which, fn in (("cifar32", bench_cifar), ("imagenet224",
                                                 bench_imagenet)):
        for w in args.workers:
            rate = fn(w)
            row = {"bench": which, "workers": w, "views_per_s": round(rate, 1),
                   "host_cpus": ncpu}
            rows.append(row)
            print(json.dumps(row))

    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
