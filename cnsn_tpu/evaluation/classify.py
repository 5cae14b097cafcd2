"""Clean and corruption evaluation harnesses.

  * ``evaluate``: clean test loss/accuracy (cifar.py:275-289 ``test``).
  * ``evaluate_cifar_c``: 15 corruptions, each a 50k-row pool (5
    severities × 10k), batch 1000, reports mean accuracy and the
    unnormalized mean corruption error 100·(1−mean acc)
    (cifar.py:292-312 ``test_c``).
  * ``compute_mce``: ImageNet-C AlexNet-normalized mCE
    (imagenet.py:85-89,125-140).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Sequence, Tuple

import numpy as np

from ..data.cifar import CORRUPTIONS, CifarData, CifarLoader, load_cifar_c

__all__ = ["evaluate", "evaluate_cifar_c", "compute_mce", "ALEXNET_ERR",
           "CORRUPTIONS"]

# Raw AlexNet errors (hendrycks/robustness), imagenet.py:85-89.
ALEXNET_ERR = (
    0.886428, 0.894468, 0.922640, 0.819880, 0.826268, 0.785948, 0.798360,
    0.866816, 0.826572, 0.819324, 0.564592, 0.853204, 0.646056, 0.717840,
    0.606500,
)


def evaluate(eval_step: Callable, state, loader: Iterable,
             dp=None, prefetch_depth: int = 2) -> Tuple[float, float]:
    """Returns (avg loss over dataset, accuracy).

    ``eval_step`` must be the padding-aware summing step
    (``StepFns.eval_sum``): per-batch results stay on device and
    accumulate there, so the whole loader costs ONE host sync (the
    reference loop host-syncs per batch, cifar.py:275-289).  With
    ``dp`` (a ``parallel.DataParallel``), every batch is sharded over
    the data mesh — the TPU analogue of DataParallel eval scatter.
    Short final batches are padded with label −1 (masked inside the
    step) so XLA shapes stay static across the loader.
    """
    import jax.numpy as jnp

    from ..utils.prefetch import device_prefetch

    def put(batch):
        images, labels = batch
        images = np.asarray(images)
        labels = np.asarray(labels).astype(np.int32)
        full = getattr(loader, "batch_size", len(labels))
        if dp is not None and full % dp.num_shards != 0:
            full += dp.num_shards - full % dp.num_shards
        if len(labels) < full:
            pad = full - len(labels)
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
            labels = np.concatenate([labels, np.full((pad,), -1, np.int32)])
        im, lb = jnp.asarray(images), jnp.asarray(labels)
        if dp is not None:
            im, lb = dp.shard_inputs(im, lb)
        return im, lb

    total_loss = total_correct = total = None
    for im, lb in device_prefetch(loader, put, depth=prefetch_depth):
        out = eval_step(state, im, lb)
        if total_loss is None:
            total_loss, total_correct, total = (out["loss"], out["correct"],
                                                out["n"])
        else:  # device-side accumulation: no per-batch host sync
            total_loss = total_loss + out["loss"]
            total_correct = total_correct + out["correct"]
            total = total + out["n"]
    if total_loss is None:
        return 0.0, 0.0
    n = max(int(total), 1)
    # reference: total of per-batch mean losses / len(dataset)
    return float(total_loss) / n, int(total_correct) / n


def evaluate_cifar_c(eval_step: Callable, state, corrupt_dir: str,
                     num_classes: int, batch_size: int = 1000,
                     corruptions: Sequence[str] = CORRUPTIONS,
                     verbose: bool = True, dp=None,
                     prefetch_depth: int = 2) -> Tuple[float, Dict[str, float]]:
    """Mean accuracy over the corruption suite; prints per-corruption
    error like the reference."""
    accs = {}
    for corruption in corruptions:
        images, labels = load_cifar_c(corrupt_dir, corruption)
        data = CifarData(images, labels, num_classes)
        loader = CifarLoader(data, batch_size, mode="eval")
        loss, acc = evaluate(eval_step, state, loader, dp=dp,
                             prefetch_depth=prefetch_depth)
        accs[corruption] = acc
        if verbose:
            print(f"{corruption}\n\tTest Loss {loss:.3f} | "
                  f"Test Error {100 - 100. * acc:.3f}")
    return float(np.mean(list(accs.values()))), accs


def compute_mce(corruption_accs: Dict[str, Sequence[float]]) -> Tuple[float, Dict[str, float]]:
    """AlexNet-normalized mean corruption error over 15 corruptions;
    ``corruption_accs[c]`` holds per-severity accuracies."""
    mce = 0.0
    ce_dict = {}
    for i, c in enumerate(CORRUPTIONS):
        avg_err = 1.0 - float(np.mean(corruption_accs[c]))
        ce = 100.0 * avg_err / ALEXNET_ERR[i]
        ce_dict[c] = ce
        mce += ce / len(CORRUPTIONS)
    return mce, ce_dict
