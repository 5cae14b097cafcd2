"""Command-line entry points: cnsn-train / cnsn-eval.

Usage:
  python -m cnsn_tpu.cli train --config cnsn_tpu/configs/cifar10/allconv/cn.yaml [key=value ...]
  python -m cnsn_tpu.cli eval  --config ... --resume <ckpt> [key=value ...]
"""
from __future__ import annotations

import argparse
import os

from .config import apply_overrides, load_config


def _pin_platform():
    """Honor an explicit JAX_PLATFORMS env var even when a site hook has
    pre-registered a hardware plugin and merged it into jax_platforms."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "," not in want:
        import jax
        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)


def _install_tee(exp_dir):
    """tee stdout/stderr into the exp dir (train_cnsn.sh:
    ``2>&1 | tee ${model_dir}/train-$now.log``)."""
    import sys
    import time

    from .utils.provenance import TeeLog
    path = os.path.join(exp_dir, f"train-{time.strftime('%Y%m%d_%H%M%S')}.log")
    sys.stdout = TeeLog(sys.stdout, path)
    sys.stderr = TeeLog(sys.stderr, path)


def _seg_main(args):
    """Segmentation training (reference tool/train_cnsn.sh flow)."""
    import dataclasses

    import yaml

    from .segmentation.data import make_list_dataset, synthetic_seg_dataset
    from .segmentation.trainer import SegConfig, SegTrainer

    data = {}
    if args.config:
        with open(args.config) as f:
            data = yaml.safe_load(f) or {}
    extra = {}
    for pair in args.overrides:
        k, _, raw = pair.partition("=")
        extra[k] = yaml.safe_load(raw)
    data.update(extra)
    data_root = data.pop("data_root", None)
    train_list = data.pop("train_list", None)
    val_list = data.pop("val_list", None)
    cross_list = data.pop("cross_val_list", None)
    synthetic = data.pop("synthetic_data", False)
    fields = {f.name for f in dataclasses.fields(SegConfig)}
    unknown = set(data) - fields
    if unknown:
        raise ValueError(f"unknown seg config keys: {sorted(unknown)}")
    cfg = SegConfig(**data)

    if synthetic:
        train_ds = synthetic_seg_dataset(32, hw=(cfg.train_h + 16,
                                                 cfg.train_w + 16),
                                         classes=cfg.classes)
        val_ds = synthetic_seg_dataset(8, hw=(cfg.train_h, cfg.train_w),
                                       classes=cfg.classes, seed=7)
        cross_ds = None
    else:
        train_ds = make_list_dataset(data_root, train_list)
        val_ds = (make_list_dataset(data_root, val_list)
                  if val_list else None)
        cross_ds = (make_list_dataset(data_root, cross_list)
                    if cross_list else None)
    trainer = SegTrainer(cfg, train_ds, val_ds, cross_ds)
    if cfg.snapshot:
        _install_tee(cfg.save_path)
    if args.command == "seg-train":
        trainer.fit()
    else:
        trainer.validate()


def main(argv=None):
    _pin_platform()
    parser = argparse.ArgumentParser(prog="cnsn")
    parser.add_argument("command",
                        choices=["train", "eval", "seg-train", "seg-eval"])
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides")
    args = parser.parse_args(argv)

    if args.command.startswith("seg-"):
        return _seg_main(args)

    cfg = load_config(args.config)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    from .train.trainer import Trainer

    trainer = Trainer(cfg)
    if getattr(cfg, "snapshot", True):
        _install_tee(trainer.exp_dir)
    if args.command == "train":
        trainer.fit()
        if cfg.corrupt_data_dir:
            trainer.test_corruptions()
    else:
        loss, acc = trainer.evaluate_clean()
        print(f"Clean\n\tTest Loss {loss:.3f} | "
              f"Test Error {100 - 100. * acc:.2f}")
        if cfg.corrupt_data_dir:
            trainer.test_corruptions()


if __name__ == "__main__":
    main()
