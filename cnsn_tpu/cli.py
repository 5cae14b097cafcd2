"""Command-line entry points: cnsn-train / cnsn-eval.

Usage:
  python -m cnsn_tpu.cli train --config cnsn_tpu/configs/cifar10/allconv/cn.yaml [key=value ...]
  python -m cnsn_tpu.cli eval  --config ... --resume <ckpt> [key=value ...]
"""
from __future__ import annotations

import argparse
import os
import sys

from .config import apply_overrides, load_config


def _pin_platform():
    """Honor an explicit JAX_PLATFORMS env var even when a site hook has
    pre-registered a hardware plugin and merged it into jax_platforms."""
    want = os.environ.get("JAX_PLATFORMS")
    if want and "," not in want:
        import jax
        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)


def main(argv=None):
    _pin_platform()
    parser = argparse.ArgumentParser(prog="cnsn")
    parser.add_argument("command", choices=["train", "eval"])
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    from .train.trainer import Trainer

    trainer = Trainer(cfg)
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
