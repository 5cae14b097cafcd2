"""Host-side segmentation trainer: the TPU-native counterpart of the
reference DDP trainer (segmentation/tool/train_cnsn.py:83-451).

One process, one mesh: DistributedSampler/mp.spawn/NCCL become batch
sharding + GSPMD collectives; the per-iteration poly LR (with 10x head
groups) lives inside the optax chain; the mix_prob CrossNorm gate picks
between two jitted programs; metric histograms accumulate on host;
checkpoints rotate keep-last-2 (:255-261); optional cross-domain
(Cityscapes) validation each epoch (:271-278).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import DataParallel, make_mesh
from ..utils.meters import AverageMeter
from ..utils.metrics_io import MetricWriter
from .data import (Compose, Crop, Normalize, RandRotate, RandScale,
                   RandomGaussianBlur, RandomHorizontalFlip, SegLoader)
from .fcn import fcn_baseline, fcn_cnsn
from .pspnet import PSALite, PSANet, PSPNet
from .train_seg import SegStepFns, SegTrainState, make_seg_optimizer

__all__ = ["SegConfig", "SegTrainer", "build_seg_model",
           "default_train_transform"]


@dataclass
class SegConfig:
    """Mirrors segmentation/config/gtav/gtav_fcn50_cnsn.yaml."""
    arch: str = "fcn_cnsn"          # fcn | fcn_cnsn | psp | psa | psa_lite
    classes: int = 19
    train_h: int = 97
    train_w: int = 97
    scale_min: float = 0.5
    scale_max: float = 2.0
    rotate_min: float = -10.0
    rotate_max: float = 10.0
    ignore_label: int = 255
    aux_weight: float = 0.4
    base_lr: float = 0.01
    epochs: int = 80
    batch_size: int = 16
    prefetch_depth: int = 2  # host→device staging depth (0 disables)
    momentum: float = 0.9
    weight_decay: float = 1e-4
    power: float = 0.9
    # CNSN knobs (gtav yaml :35-43)
    pos: Optional[str] = "residual"
    cn_pos: Optional[str] = "post"
    block_idxs: str = "1_2_3_4"
    crop: str = "style"
    cnsn_type: Optional[str] = "cnsn"
    beta: float = 1.0
    active_num: int = 1
    mix_prob: float = 0.5
    # PSA knobs (reference psanet.py:101-110 defaults)
    psa_type: int = 2               # 0 collect | 1 distribute | 2 both
    compact: bool = False
    shrink_factor: int = 2
    mask_h: int = 0                 # 0 → auto 2h-1 on the shrunk grid
    mask_w: int = 0
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    # compute: bf16 + per-bottleneck remat is what fits the 713²/b16
    # recipe shape in one chip's HBM (bench_zoo.py seg_train); remat
    # also takes a stage spec '1_2' (SegResNet.remat)
    compute_dtype: Optional[str] = None   # e.g. 'bfloat16'; None = fp32
    remat: Any = False
    # infra
    seed: int = 1
    print_freq: int = 10
    save_path: str = "./exp/seg"
    # 'msgpack' (reference-style epoch files + keep-last rotation) or
    # 'orbax' (async saves, native retention, SIGTERM preemption flush)
    ckpt_backend: str = "msgpack"
    snapshot: bool = True   # code+config snapshot (train_cnsn.sh parity)
    # mirror scalars into TB event files (reference tensorboardX writer,
    # train_cnsn.py:165,372-376) alongside the JSONL stream
    tensorboard: bool = False
    keep_last: int = 2
    batch_size_val: Optional[int] = None  # default: batch_size
    eval_freq: int = 1                    # validate every N epochs
    save_freq: int = 1                    # checkpoint every N epochs
    start_epoch: int = 0
    weight: Optional[str] = None          # init-only checkpoint (params)
    resume: Optional[str] = None          # full restore (params+opt+epoch)
    num_devices: Optional[int] = None
    # Spatial partitioning: shard the image H axis over this many mesh
    # devices (num_devices must be divisible).  GSPMD inserts the conv
    # halo exchanges / stat reductions; step math is identical to pure
    # data parallelism (tests/test_parallel.py).  Use when one chip's
    # HBM cannot hold the per-device sub-batch at full resolution.
    spatial: int = 1
    # ZeRO-style FSDP (parallel/fsdp.py): shard params + optimizer
    # moments over the data axis.  Composes with spatial partitioning.
    fsdp: bool = False
    mean: tuple = (0.485 * 255, 0.456 * 255, 0.406 * 255)
    std: tuple = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def build_seg_model(cfg: SegConfig, num_groups: int = 1):
    dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    kw = dict(classes=cfg.classes, block_idxs=cfg.block_idxs, pos=cfg.pos,
              cn_pos=cfg.cn_pos, cnsn_type=cfg.cnsn_type, crop=cfg.crop,
              beta=cfg.beta, num_groups=num_groups, dtype=dtype,
              remat=cfg.remat)
    if cfg.arch == "fcn_cnsn":
        return fcn_cnsn(**kw)
    if cfg.arch == "fcn":
        return fcn_baseline(classes=cfg.classes, num_groups=num_groups,
                            dtype=dtype, remat=cfg.remat)
    if cfg.arch == "psp":
        return PSPNet(**kw)
    if cfg.arch == "psa":
        return PSANet(psa_type=cfg.psa_type, compact=cfg.compact,
                      shrink_factor=cfg.shrink_factor, mask_h=cfg.mask_h,
                      mask_w=cfg.mask_w,
                      normalization_factor=cfg.normalization_factor,
                      psa_softmax=cfg.psa_softmax, **kw)
    if cfg.arch == "psa_lite":
        return PSALite(**kw)
    raise ValueError(f"unknown arch {cfg.arch}")


def default_train_transform(cfg: SegConfig) -> Compose:
    """gtav yaml pipeline (train_cnsn.py:206-220 equivalent)."""
    return Compose([
        RandScale((cfg.scale_min, cfg.scale_max)),
        RandRotate((cfg.rotate_min, cfg.rotate_max), padding=cfg.mean,
                   ignore_label=cfg.ignore_label),
        RandomGaussianBlur(),
        RandomHorizontalFlip(),
        Crop((cfg.train_h, cfg.train_w), "rand", padding=cfg.mean,
             ignore_label=cfg.ignore_label),
        Normalize(cfg.mean, cfg.std),
    ])


def _summarize(inter, union, target):
    iou = inter / np.maximum(union, 1e-10)
    acc = inter / np.maximum(target, 1e-10)
    return (float(np.mean(iou)), float(np.mean(acc)),
            float(inter.sum() / max(target.sum(), 1e-10)))


class SegTrainer:
    def __init__(self, cfg: SegConfig, train_dataset, val_dataset=None,
                 cross_domain_dataset=None):
        self.cfg = cfg
        np.random.seed(cfg.seed)
        sp = max(1, int(getattr(cfg, "spatial", 1) or 1))
        dp_cls = DataParallel
        if getattr(cfg, "fsdp", False):
            from ..parallel import FSDP
            dp_cls = FSDP
        if sp > 1:
            nd = cfg.num_devices or len(jax.devices())
            if nd % sp:
                raise ValueError(
                    f"spatial={sp} must divide num_devices={nd}")
            self.mesh = make_mesh(nd, ("data", "spatial"),
                                  (nd // sp, sp))
            self.dp = dp_cls(self.mesh, spatial_axis="spatial")
        else:
            self.mesh = make_mesh(cfg.num_devices)
            self.dp = dp_cls(self.mesh)
        self.model = build_seg_model(cfg, num_groups=self.dp.num_shards)

        tf = default_train_transform(cfg)
        self.train_loader = SegLoader(train_dataset, cfg.batch_size, tf,
                                      seed=cfg.seed)
        val_tf = Compose([Crop((cfg.train_h, cfg.train_w), "center",
                               padding=cfg.mean,
                               ignore_label=cfg.ignore_label),
                          Normalize(cfg.mean, cfg.std)])
        bval = cfg.batch_size_val or cfg.batch_size
        self.val_loader = (SegLoader(val_dataset, bval, val_tf,
                                     shuffle=False, drop_last=False)
                           if val_dataset else None)
        self.cross_loader = (SegLoader(cross_domain_dataset, bval,
                                       val_tf, shuffle=False,
                                       drop_last=False)
                             if cross_domain_dataset else None)

        rngs = {"params": jax.random.key(cfg.seed),
                "crossnorm": jax.random.key(cfg.seed + 1),
                "dropout": jax.random.key(cfg.seed + 2)}
        x0 = jnp.zeros((2, cfg.train_h, cfg.train_w, 3))
        variables = self.model.init(rngs, x0, False, None, None)
        max_iter = cfg.epochs * len(self.train_loader)
        tx = make_seg_optimizer(variables["params"], cfg.base_lr, max_iter,
                                cfg.power, cfg.momentum, cfg.weight_decay)
        state = SegTrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        self.state = (self.dp.shard_state(state)
                      if getattr(cfg, "fsdp", False)
                      else self.dp.replicate(state))
        self.steps = SegStepFns(self.model, num_classes=cfg.classes,
                                active_num=cfg.active_num,
                                aux_weight=cfg.aux_weight,
                                ignore_label=cfg.ignore_label)
        self._gate = np.random.RandomState(cfg.seed + 17)
        self._key = jax.random.key(cfg.seed + 23)
        self._it = 0
        os.makedirs(cfg.save_path, exist_ok=True)
        if cfg.snapshot:
            from ..utils.provenance import snapshot_experiment
            snapshot_experiment(cfg.save_path, cfg, tee=False)
        self.writer = MetricWriter(os.path.join(cfg.save_path, "metrics"),
                                   tensorboard=cfg.tensorboard)
        self.ckpt = None
        self._epoch = cfg.start_epoch
        if cfg.ckpt_backend == "orbax":
            from ..utils.orbax_io import (OrbaxCheckpointer,
                                          install_preemption_save)
            self.ckpt = OrbaxCheckpointer(
                os.path.join(os.path.abspath(cfg.save_path), "orbax"),
                keep=cfg.keep_last)
            install_preemption_save(
                lambda: (int(jax.device_get(self.state.step)), self.state),
                self.ckpt,
                get_extra=lambda: {"epoch": self._epoch},
                exit_code=143)
        if cfg.weight and os.path.isfile(cfg.weight):
            # init-only load (reference --weight vs --resume distinction,
            # train_cnsn.py:179-204): params/batch_stats, no opt state
            from ..utils.checkpoint import load_checkpoint
            payload = load_checkpoint(cfg.weight, {
                "epoch": 0, "best_acc": 0.0,
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state, "step": 0})
            self.state = self.state.replace(
                params=payload["params"],
                batch_stats=payload["batch_stats"])
            print(f"=> loaded weight '{cfg.weight}'")
        # full restore AFTER the init-only weight load, matching the
        # reference's weight-then-resume precedence (train_cnsn.py:
        # 179-204).  Orbax: always auto-restore the latest step so a
        # scheduler restart after the SIGTERM flush resumes where the
        # preempted run stopped (mirrors train/trainer.py).
        restored = 0
        if self.ckpt is not None:
            restored = self.resume()
        elif cfg.resume:
            if os.path.isfile(cfg.resume):
                restored = self.resume(cfg.resume)
            else:
                print(f"=> no checkpoint found at '{cfg.resume}'")
        if restored:
            cfg.start_epoch = restored
            self._epoch = restored
        if getattr(cfg, "fsdp", False):
            # re-apply the ZeRO placement after any weight/resume load
            # (msgpack checkpoints load as host arrays); idempotent
            self.state = self.dp.shard_state(self.state)

    def _next_key(self):
        self._it += 1
        return jax.random.fold_in(self._key, self._it)

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        meters = {k: AverageMeter() for k in ("main", "aux", "loss")}
        inter_sum = np.zeros(cfg.classes)
        union_sum = np.zeros(cfg.classes)
        target_sum = np.zeros(cfg.classes)
        # CrossNorm exists only when cnsn_type contains 'cn' — cn_pos
        # alone just relocates a CN that isn't there (backbone creates
        # real_cn/img_cn only under the same condition), so don't build
        # or gate the aug program for sn-only configs.
        has_cn = bool(cfg.cnsn_type and "cn" in cfg.cnsn_type)
        t0 = time.time()
        pending = []  # device-side metrics; resolved lazily (no per-step sync)

        def drain():
            nonlocal inter_sum, union_sum, target_sum
            for m, n, step in pending:
                meters["main"].update(float(m["main_loss"]), n)
                meters["aux"].update(float(m["aux_loss"]), n)
                meters["loss"].update(float(m["loss"]), n)
                inter_sum += np.asarray(m["intersection"])
                union_sum += np.asarray(m["union"])
                target_sum += np.asarray(m["target"])
                self.writer.scalar("loss_train_batch",
                                   float(m["main_loss"]), step)
            pending.clear()

        from ..utils.prefetch import device_prefetch
        staged = device_prefetch(
            self.train_loader,
            lambda b: (self.dp.shard_batch(jnp.asarray(b[0])),
                       self.dp.shard_batch(jnp.asarray(b[1]))),
            depth=getattr(cfg, "prefetch_depth", 2))
        for i, (im, lb) in enumerate(staged):
            aug = bool(has_cn
                       and self._gate.rand(1)[0] < cfg.mix_prob)
            fn = self.steps.aug if aug else self.steps.plain
            self.state, m = fn(self.state, im, lb, self._next_key())
            step = epoch * len(self.train_loader) + i + 1
            pending.append((m, int(im.shape[0]), step))
            if (i + 1) % cfg.print_freq == 0:
                drain()
                miou, macc, aacc = _summarize(inter_sum, union_sum,
                                              target_sum)
                print(f"Epoch [{epoch + 1}/{cfg.epochs}][{i + 1}/"
                      f"{len(self.train_loader)}] MainLoss "
                      f"{meters['main'].val:.4f} AuxLoss "
                      f"{meters['aux'].val:.4f} Loss "
                      f"{meters['loss'].val:.4f} mIoU {miou:.4f} "
                      f"({time.time() - t0:.1f}s)")
        drain()
        miou, macc, aacc = _summarize(inter_sum, union_sum, target_sum)
        self.writer.scalar("mIoU_train", miou, epoch)
        return meters["main"].avg, miou, macc, aacc

    def validate(self, loader=None, tag: str = "val"):
        """Shard-safe, one-sync validation (reference per-batch loop:
        segmentation/tool/train_cnsn.py:388-451).  Tail batches
        (``drop_last=False``) are padded to the full batch size rounded
        up to the mesh width — padded rows get all-ignore_label labels,
        so they contribute nothing to the loss or mIoU histograms and
        XLA sees ONE static shape for the whole loader (no per-tail
        recompiles).  Histograms accumulate on device; the loader costs
        a single host transfer at the end.  Reported loss is the mean
        over valid pixels (the reference's per-batch-average weighting
        differs only when batches have unequal valid-pixel counts)."""
        loader = loader or self.val_loader
        if loader is None:
            return None
        cfg = self.cfg
        full = loader.batch_size
        if full % self.dp.num_shards != 0:
            full += self.dp.num_shards - full % self.dp.num_shards

        def put(batch):
            images, labels = batch
            if len(labels) < full:
                pad = full - len(labels)
                images = np.concatenate(
                    [images,
                     np.zeros((pad,) + images.shape[1:], images.dtype)])
                labels = np.concatenate(
                    [labels,
                     np.full((pad,) + labels.shape[1:], cfg.ignore_label,
                             labels.dtype)])
            return (self.dp.shard_batch(jnp.asarray(images)),
                    self.dp.shard_batch(jnp.asarray(labels)))

        from ..utils.prefetch import device_prefetch
        totals = None
        for im, lb in device_prefetch(loader, put,
                                      depth=getattr(cfg, "prefetch_depth", 2)):
            out = self.steps.eval_sum(self.state, im, lb)
            if totals is None:
                totals = out
            else:  # device-side accumulation: no per-batch host sync
                totals = jax.tree.map(jnp.add, totals, out)
        if totals is None:
            return None
        inter_sum = np.asarray(totals["intersection"])
        union_sum = np.asarray(totals["union"])
        target_sum = np.asarray(totals["target"])
        loss = float(totals["nll_sum"]) / max(float(totals["valid_px"]), 1.0)
        miou, macc, aacc = _summarize(inter_sum, union_sum, target_sum)
        print(f"{tag} result: mIoU/mAcc/allAcc "
              f"{miou:.4f}/{macc:.4f}/{aacc:.4f}")
        return {"loss": loss, "mIoU": miou, "mAcc": macc,
                "allAcc": aacc,
                "iou_class": inter_sum / np.maximum(union_sum, 1e-10)}

    def resume(self, path: Optional[str] = None) -> int:
        """Restore state; returns the epoch (train_cnsn.py:191-204
        --resume).  Orbax backend: ``path`` is ignored (latest step in
        save_path/orbax)."""
        if self.ckpt is not None:
            self.state, step, extra = self.ckpt.restore(
                self.state, extra_template={"epoch": 0})
            if step is None:
                return 0
            epoch = int(extra.get("epoch", 0))
            print(f"=> restored orbax step {step} (epoch {epoch})")
            return epoch
        if path is None:
            raise ValueError(
                "msgpack backend requires an explicit checkpoint path")
        from ..utils.checkpoint import restore_state
        self.state, epoch, _ = restore_state(path, self.state)
        print(f"=> loaded checkpoint '{path}' (epoch {epoch})")
        return epoch

    def save_checkpoint(self, epoch: int):
        """Epoch files with keep-last-N rotation (train_cnsn.py:255-261);
        orbax backend keeps the newest ``keep_last`` steps natively."""
        cfg = self.cfg
        if self.ckpt is not None:
            step = int(jax.device_get(self.state.step))
            self.ckpt.save(step, self.state, extra={"epoch": epoch})
            return os.path.join(cfg.save_path, "orbax", str(step))
        from ..utils.checkpoint import save_checkpoint as _save
        path = _save(self.state, "seg", cfg.save_path, epoch, 0.0, False,
                     keep_epoch_file=True)
        epochs = sorted(
            int(f.rsplit("_", 1)[1]) for f in os.listdir(cfg.save_path)
            if f.startswith("seg_ckpt_"))
        for old in epochs[:-cfg.keep_last]:
            os.remove(os.path.join(cfg.save_path, f"seg_ckpt_{old}"))
        return path

    def fit(self, epochs: Optional[int] = None):
        cfg = self.cfg
        end = epochs if epochs is not None else cfg.epochs
        for epoch in range(cfg.start_epoch, end):
            self._epoch = epoch
            loss, miou, macc, aacc = self.train_epoch(epoch)
            print(f"Train epoch [{epoch + 1}]: mIoU/mAcc/allAcc "
                  f"{miou:.4f}/{macc:.4f}/{aacc:.4f}")
            if (epoch + 1) % cfg.save_freq == 0 or epoch + 1 == end:
                self.save_checkpoint(epoch + 1)
            if (epoch + 1) % cfg.eval_freq == 0:
                if self.val_loader:
                    self.validate()
                if self.cross_loader:
                    self.validate(self.cross_loader, tag="cross-domain")
        if self.ckpt is not None:
            self.ckpt.manager.wait_until_finished()
        return self.state
