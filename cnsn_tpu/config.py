"""Experiment configuration: one dataclass tree + YAML recipes + CLI
overrides.

Replaces the reference's two config systems — argparse flags driven by
40+ bash scripts (cifar.py:23-77, imagenet.py:18-74, §2.7 of SURVEY)
and the segmentation YAML/CfgNode (segmentation/util/config.py) — with
a single structure.  The shipped recipes in cnsn_tpu/configs/ mirror
the reference script grid.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml

__all__ = ["ExperimentConfig", "load_config", "apply_overrides"]


@dataclass
class ExperimentConfig:
    # experiment
    exp_id: str = "cnsn"
    exp_dir: str = "./exp"
    seed: int = 1

    # data
    dataset: str = "cifar10"          # cifar10 | cifar100 | imagenet
    data_dir: str = "./data"
    corrupt_data_dir: Optional[str] = None
    workers: int = 4
    augmix_workers: int = 0  # worker processes for host PIL AugMix
    prefetch_depth: int = 2  # host→device staging depth (0 disables)
    synthetic_data: bool = False

    # model
    model: str = "wideresnet"
    num_classes: int = 10

    # CN/SN knobs (reference names)
    cnsn_type: Optional[str] = None   # sn | cn | cnsn | None
    pos: Optional[str] = None
    crop: Optional[str] = None
    beta: Optional[float] = None
    cn_prob: Optional[float] = None
    active_num: Optional[int] = None
    consist_wt: Optional[float] = None

    # regime: plain | cn | cn_consistency | cn_augmix |
    #         cn_image | cn_image_consist | cn_image_augmix
    regime: str = "plain"

    # optimization
    epochs: int = 100
    batch_size: int = 128
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    nesterov: bool = True
    schedule: str = "cosine"          # cosine | imagenet_step | poly

    # augmix
    aug_severity: float = 3
    mixture_width: int = 3
    mixture_depth: int = -1
    all_ops: bool = False
    ondevice_augmix: bool = False  # generate AugMix views on the TPU
    # no_jsd: train on the single mixed AugMix view with plain CE —
    # no (clean, aug1, aug2) triple, no JSD term (the reference ships
    # the knob at utils.py:100-113 though its drivers pin it False).
    # CIFAR host loader path only (data/cifar.py train_augmix_nojsd).
    no_jsd: bool = False

    # runtime
    print_freq: int = 10
    eval_batch_size: int = 1000
    # 'msgpack' (reference-style single files) or 'orbax' (async saves,
    # keep-N retention, SIGTERM preemption flush + auto-resume; resume=
    # the experiment dir)
    ckpt_backend: str = "msgpack"
    # snapshot code+config into the exp dir (reference train_cnsn.sh
    # provenance: cp driver+config, tee log)
    snapshot: bool = True
    resume: Optional[str] = None
    pretrained: Optional[str] = None   # torch .pth partial init
    evaluate: bool = False
    num_devices: Optional[int] = None  # data-parallel width (None = all)
    # ZeRO-style fully-sharded data parallelism: shard params + optimizer
    # moments over the data axis (parallel/fsdp.py); same math as
    # replicated DP, per-chip state memory / num_devices
    fsdp: bool = False
    compute_dtype: str = "fp32"        # fp32 | bf16 (params stay fp32)
    remat: bool = False                # rematerialize ResNet bottlenecks
    image_size: Optional[int] = None   # default: 32 (CIFAR) / 224 (ImageNet)

    def infer(self) -> "ExperimentConfig":
        """Fill derived fields (num_classes, regime) like the reference
        drivers' dispatch (cifar.py:470-483, imagenet.py:605-615)."""
        cfg = dataclasses.replace(self)
        ds = cfg.dataset.replace("-", "").lower()
        cfg.dataset = ds
        if ds == "cifar10":
            cfg.num_classes = 10
        elif ds == "cifar100":
            cfg.num_classes = 100
        elif ds == "imagenet":
            cfg.num_classes = 1000
        if cfg.regime == "auto":
            t = cfg.cnsn_type or ""
            if ds == "imagenet":
                if "augmix" in cfg.exp_id:
                    cfg.regime = "cn_image_augmix"
                elif "consist" in cfg.exp_id:
                    cfg.regime = "cn_image_consist"
                elif "cn" in cfg.exp_id:
                    cfg.regime = "cn_image"
                else:
                    cfg.regime = "plain"
            else:
                if "augmix" in cfg.exp_id and "cn" in t:
                    cfg.regime = "cn_augmix"
                elif "consist" in cfg.exp_id and "cn" in t:
                    cfg.regime = "cn_consistency"
                elif "cn" in t:
                    cfg.regime = "cn"
                else:
                    cfg.regime = "plain"
        return cfg


def load_config(path: Optional[str] = None, **overrides: Any) -> ExperimentConfig:
    data: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    data.update({k: v for k, v in overrides.items() if v is not None})
    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    unknown = set(data) - fields
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return ExperimentConfig(**data).infer()


def apply_overrides(cfg: ExperimentConfig, pairs) -> ExperimentConfig:
    """CLI 'key=value' overrides with type coercion (the reference's
    merge_cfg_from_list behavior)."""
    updates = {}
    fields = {f.name: f for f in dataclasses.fields(ExperimentConfig)}
    for pair in pairs:
        key, _, raw = pair.partition("=")
        if key not in fields:
            raise ValueError(f"unknown config key: {key}")
        updates[key] = yaml.safe_load(raw)
    return dataclasses.replace(cfg, **updates).infer()
