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


def _export_main(args):
    """Export the eval forward as a portable StableHLO artifact
    (serving.py): weights baked in, symbolic batch dim, deserializable
    without any model code."""
    import jax
    import jax.numpy as jnp

    from .serving import save_artifact

    platforms = args.platforms.split(",") if args.platforms else None
    if args.command == "seg-export":
        import dataclasses

        import yaml

        from .segmentation.trainer import SegConfig, build_seg_model
        from .serving import export_segmenter
        data = {}
        if args.config:
            with open(args.config) as f:
                data = yaml.safe_load(f) or {}
        for pair in args.overrides:
            k, _, raw = pair.partition("=")
            data[k] = yaml.safe_load(raw)
        fields = {f.name for f in dataclasses.fields(SegConfig)}
        cfg = SegConfig(**{k: v for k, v in data.items() if k in fields})
        model = build_seg_model(cfg)
        x0 = jnp.zeros((1, cfg.train_h, cfg.train_w, 3))
        variables = model.init({"params": jax.random.key(0)}, x0,
                               False, None, None)
        if cfg.weight or cfg.resume:
            from .segmentation import make_seg_optimizer
            from .utils.checkpoint import load_checkpoint
            tx = make_seg_optimizer(variables["params"], cfg.base_lr, 1)
            payload = load_checkpoint(cfg.weight or cfg.resume, {
                "epoch": 0, "best_acc": 0.0, "params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"]), "step": 0})
            variables = {"params": payload["params"],
                         "batch_stats": payload["batch_stats"]}
        exported = export_segmenter(model, variables,
                                    (cfg.train_h, cfg.train_w),
                                    platforms=platforms)
    else:
        from .models import build_model
        from .serving import export_classifier
        cfg = load_config(args.config)
        if args.overrides:
            cfg = apply_overrides(cfg, args.overrides)
        cfg = cfg.infer()
        model_kw = dict(pos=cfg.pos, crop=cfg.crop, beta=cfg.beta,
                        cnsn_type=cfg.cnsn_type, num_groups=1,
                        dtype=(jnp.bfloat16 if cfg.compute_dtype == "bf16"
                               else None))
        if cfg.model.startswith("resnet"):
            model_kw["remat"] = cfg.remat
        model = build_model(cfg.model, num_classes=cfg.num_classes,
                            **model_kw)
        image_size = cfg.image_size or (224 if cfg.dataset == "imagenet"
                                        else 32)
        x0 = jnp.zeros((1, image_size, image_size, 3))
        variables = model.init({"params": jax.random.key(0)}, x0,
                               False, None)
        if cfg.resume:
            from .train import cosine_lr, create_train_state, make_sgd
            from .utils.checkpoint import restore_state
            state = create_train_state(model, jax.random.key(0),
                                       (1, image_size, image_size, 3),
                                       make_sgd(cosine_lr(0.1, 1)))
            state, _, _ = restore_state(cfg.resume, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        if args.pipeline_stages:
            from .serving import export_pipelined_classifier
            exported = export_pipelined_classifier(
                model, variables, image_size, args.pipeline_stages,
                num_microbatches=args.microbatches,
                batch=args.export_batch, platforms=platforms)
        else:
            exported = export_classifier(model, variables, image_size,
                                         platforms=platforms)
    save_artifact(exported, args.out)
    print(f"exported {args.out} ({os.path.getsize(args.out)} bytes, "
          f"platforms={list(exported.platforms)}, "
          f"in_shape={exported.in_avals[0].shape})")


def main(argv=None):
    _pin_platform()
    parser = argparse.ArgumentParser(prog="cnsn")
    parser.add_argument("command",
                        choices=["train", "eval", "seg-train", "seg-eval",
                                 "export", "seg-export"])
    parser.add_argument("--config", default=None)
    parser.add_argument("--out", default="model.shlo",
                        help="output path for export/seg-export")
    parser.add_argument("--platforms", default=None,
                        help="comma list, e.g. tpu,cpu (default: current)")
    parser.add_argument("--pipeline-stages", type=int, default=0,
                        help="export: GPipe the eval forward over this "
                             "many 'stage' mesh devices (ResNet models; "
                             "serving needs that many devices)")
    parser.add_argument("--microbatches", type=int, default=None,
                        help="export: pipeline microbatch count "
                             "(default: pipeline-stages)")
    parser.add_argument("--export-batch", type=int, default=8,
                        help="export: fixed batch for the pipelined "
                             "artifact (plain export keeps the symbolic "
                             "batch dim)")
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides")
    args = parser.parse_args(argv)

    if args.command.endswith("export"):
        return _export_main(args)
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
