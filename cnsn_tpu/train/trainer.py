"""Host-side training driver: the TPU-native counterpart of the
reference CIFAR/ImageNet mains (cifar.py:315-511, imagenet.py:453-650).

Per-epoch loop over a host data loader; the stochastic CN gate
(np.random vs cn_prob — cifar.py:127-128) selects between two jitted
XLA programs; metrics/logging/checkpointing mirror the reference's
log.txt layout.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import ExperimentConfig
from ..data.cifar import CifarLoader, load_cifar
from ..evaluation.classify import evaluate, evaluate_cifar_c
from ..models import build_model
from ..parallel import DataParallel, make_mesh
from ..utils.checkpoint import restore_state, save_checkpoint
from ..utils.meters import AverageMeter, get_log_dir_path
from ..utils.prefetch import device_prefetch
from .schedules import cosine_lr, imagenet_step_lr
from .steps import StepFns, create_train_state, make_sgd

__all__ = ["Trainer"]


class Trainer:
    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg = cfg.infer()
        np.random.seed(cfg.seed)

        self.mesh = make_mesh(cfg.num_devices)
        if getattr(cfg, "fsdp", False):
            from ..parallel import FSDP
            self.dp = FSDP(self.mesh)
        else:
            self.dp = DataParallel(self.mesh)
        if cfg.batch_size % self.dp.num_shards != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"data-parallel width {self.dp.num_shards} (set "
                f"num_devices to control it)")

        input_hw = cfg.image_size or (224 if cfg.dataset == "imagenet"
                                      else 32)
        self.image_size = input_hw
        import jax.numpy as jnp
        model_kw = dict(pos=cfg.pos, crop=cfg.crop, beta=cfg.beta,
                        cnsn_type=cfg.cnsn_type,
                        num_groups=self.dp.num_shards,
                        dtype=(jnp.bfloat16 if cfg.compute_dtype == "bf16"
                               else None))
        if cfg.model.startswith("resnet"):
            model_kw["remat"] = cfg.remat
        self.model = build_model(cfg.model, num_classes=cfg.num_classes,
                                 **model_kw)

        # data
        if cfg.dataset in ("cifar10", "cifar100"):
            self.train_data = load_cifar(cfg.data_dir, cfg.dataset, True,
                                         synthetic=cfg.synthetic_data)
            self.test_data = load_cifar(cfg.data_dir, cfg.dataset, False,
                                        synthetic=cfg.synthetic_data)
            if "augmix" in cfg.regime:
                if cfg.no_jsd and cfg.ondevice_augmix:
                    raise ValueError(
                        "no_jsd uses the host single-view AugMix path "
                        "(data/cifar.py train_augmix_nojsd); it does not "
                        "compose with ondevice_augmix")
                mode = ("train_geom" if cfg.ondevice_augmix
                        else ("train_augmix_nojsd" if cfg.no_jsd
                              else "train_augmix"))
            else:
                mode = "train"
            self.train_loader = CifarLoader(
                self.train_data, cfg.batch_size, mode=mode, seed=cfg.seed,
                aug_severity=cfg.aug_severity,
                mixture_width=cfg.mixture_width,
                mixture_depth=cfg.mixture_depth, all_ops=cfg.all_ops,
                workers=cfg.augmix_workers)
            self.test_loader = CifarLoader(self.test_data,
                                           cfg.eval_batch_size, mode="eval")
        elif cfg.dataset == "imagenet":
            if cfg.no_jsd:
                raise ValueError("no_jsd is a CIFAR AugMix knob "
                                 "(reference utils.py:100-113)")
            from ..data.imagenet import ImageNetLoader, scan_image_folder
            train_dir = os.path.join(cfg.data_dir, "train")
            val_dir = os.path.join(cfg.data_dir, "validation")
            if "augmix" in cfg.regime:
                mode = ("train_geom" if cfg.ondevice_augmix
                        else "train_augmix")
            else:
                mode = "train"
            self.train_loader = ImageNetLoader(
                scan_image_folder(train_dir), cfg.batch_size, mode=mode,
                seed=cfg.seed, workers=cfg.workers,
                image_size=input_hw,
                aug_severity=cfg.aug_severity,
                mixture_width=cfg.mixture_width,
                mixture_depth=cfg.mixture_depth, all_ops=cfg.all_ops,
                mp_workers=cfg.augmix_workers)
            self.test_loader = ImageNetLoader(
                scan_image_folder(val_dir), cfg.eval_batch_size,
                mode="eval", workers=cfg.workers, image_size=input_hw)
        else:
            raise ValueError(f"unknown dataset: {cfg.dataset}")

        steps_per_epoch = len(self.train_loader)
        if cfg.schedule == "cosine":
            sched = cosine_lr(cfg.lr, cfg.epochs * steps_per_epoch)
        elif cfg.schedule == "imagenet_step":
            sched = imagenet_step_lr(cfg.lr, cfg.epochs, cfg.batch_size,
                                     steps_per_epoch)
        else:
            raise ValueError(cfg.schedule)
        self.schedule = sched
        tx = make_sgd(sched, momentum=cfg.momentum,
                      weight_decay=cfg.weight_decay, nesterov=cfg.nesterov)

        self.state = create_train_state(
            self.model, jax.random.key(cfg.seed),
            (2, input_hw, input_hw, 3), tx)
        if cfg.pretrained and os.path.isfile(cfg.pretrained):
            # torch .pth partial init, strict=False (imagenet.py:518-521)
            from ..utils.torch_import import import_torch_checkpoint
            variables = {"params": self.state.params,
                         "batch_stats": self.state.batch_stats}
            new_vars, missing = import_torch_checkpoint(
                cfg.pretrained, variables, strict=False)
            self.state = self.state.replace(
                params=new_vars["params"],
                batch_stats=new_vars["batch_stats"])
            print(f"loaded pretrained '{cfg.pretrained}' "
                  f"({len(missing)} unmatched keys)")
        self.steps = StepFns(self.model,
                             active_num=cfg.active_num or 1,
                             consist_wt=cfg.consist_wt or 0.0,
                             image_crop=cfg.crop or "neither",
                             image_beta=cfg.beta or 1.0,
                             num_groups=self.dp.num_shards)
        self.state = (self.dp.shard_state(self.state)
                      if getattr(cfg, "fsdp", False)
                      else self.dp.replicate(self.state))

        self.start_epoch = 0
        self.best_acc = 0.0
        self.ckpt = None
        if cfg.ckpt_backend == "orbax":
            # resume = the experiment dir; auto-restores the latest step
            # (reference resume semantics: cifar.py:415-430)
            if cfg.resume and os.path.isdir(cfg.resume):
                self.exp_dir = cfg.resume
            else:
                self.exp_dir = get_log_dir_path(cfg.exp_dir, cfg.exp_id)
                os.makedirs(self.exp_dir, exist_ok=True)
            from ..utils.orbax_io import (OrbaxCheckpointer,
                                          install_preemption_save)
            self.ckpt = OrbaxCheckpointer(
                os.path.join(os.path.abspath(self.exp_dir), "orbax"), keep=2)
            self.state, step, extra = self.ckpt.restore(
                self.state, extra_template={"epoch": 0, "best_acc": 0.0})
            if step is not None:
                self.start_epoch = int(extra["epoch"])
                self.best_acc = float(extra["best_acc"])
                print(f"=> restored orbax step {step} "
                      f"(epoch {self.start_epoch})")
            # preemption: SIGTERM → flush a final checkpoint, then exit
            # with the conventional 143 so the scheduler restarts us.
            # _epoch must exist BEFORE the handler is live — a SIGTERM
            # in the install→fit window would otherwise crash get_extra
            self._epoch = self.start_epoch
            install_preemption_save(
                lambda: (int(jax.device_get(self.state.step)), self.state),
                self.ckpt,
                get_extra=lambda: {"epoch": self._epoch,
                                   "best_acc": self.best_acc},
                exit_code=143)
        elif cfg.resume and os.path.isfile(cfg.resume):
            self.state, self.start_epoch, self.best_acc = restore_state(
                cfg.resume, self.state)
            self.exp_dir = os.path.dirname(cfg.resume)
            print(f"=> loaded checkpoint '{cfg.resume}' "
                  f"(epoch {self.start_epoch})")
        else:
            self.exp_dir = get_log_dir_path(cfg.exp_dir, cfg.exp_id)
            os.makedirs(self.exp_dir, exist_ok=True)
        if getattr(cfg, "fsdp", False):
            # re-apply the ZeRO placement after any restore (msgpack
            # checkpoints load as host arrays); idempotent otherwise
            self.state = self.dp.shard_state(self.state)
        self._epoch = self.start_epoch
        self.log_file = os.path.join(self.exp_dir, "log.txt")
        if getattr(cfg, "snapshot", True):
            # provenance snapshot (train_cnsn.sh: cp driver+config into
            # the exp dir); the CLI adds the log tee
            from ..utils.provenance import snapshot_experiment
            snapshot_experiment(self.exp_dir, cfg, tee=False)
        self._rng = np.random.RandomState(cfg.seed)
        self._step_key = jax.random.key(cfg.seed + 7919)
        self._step_idx = 0

    # ---- one epoch -------------------------------------------------------

    def _next_key(self):
        self._step_idx += 1
        return jax.random.fold_in(self._step_key, self._step_idx)

    def train_epoch(self) -> float:
        cfg = self.cfg
        losses = AverageMeter()
        regime = cfg.regime
        # per-step metrics stay on device; resolving them immediately
        # would sync every step and stall the dispatch pipeline
        pending = []
        ondevice = (cfg.ondevice_augmix and "augmix" in regime)

        # Stage host→device transfers a couple of batches ahead (the
        # reference's DataLoader-worker overlap, cifar.py:361-366); the
        # step dispatch below is already asynchronous.
        if ondevice:
            def put(batch):
                images, labels = batch
                return (self.dp.shard_batch(jax.numpy.asarray(images)),
                        self.dp.shard_batch(jax.numpy.asarray(labels)))
        else:
            def put(batch):
                return self.dp.shard_inputs(jax.numpy.asarray(batch[0]),
                                            jax.numpy.asarray(batch[1]))
        staged = device_prefetch(self.train_loader, put,
                                 depth=cfg.prefetch_depth)

        for i, (im, lb) in enumerate(staged):
            key = self._next_key()
            if ondevice:
                # uint8 geometry batch → 3 views generated on device;
                # normalization follows the dataset (CIFAR 0.5/0.5 —
                # cifar.py:330; ImageNet torchvision stats —
                # imagenet.py:473-475)
                from ..data.augmix_jax import augmix_batch
                key, k_aug = jax.random.split(key)
                if cfg.dataset == "imagenet":
                    from ..data.transforms import (IMAGENET_MEAN,
                                                   IMAGENET_STD)
                    norm_kw = dict(mean=tuple(map(float, IMAGENET_MEAN)),
                                   std=tuple(map(float, IMAGENET_STD)))
                else:
                    norm_kw = {}
                im = augmix_batch(
                    k_aug, im, severity=float(cfg.aug_severity),
                    mixture_width=cfg.mixture_width,
                    mixture_depth=cfg.mixture_depth, **norm_kw)
            gate = (cfg.cn_prob is not None
                    and float(self._rng.rand(1)[0]) < cfg.cn_prob)

            if regime == "plain":
                fn = self.steps.plain
            elif regime == "cn":
                fn = self.steps.cn if gate else self.steps.plain
            elif regime == "cn_consistency":
                fn = self.steps.cn_consistency if gate else self.steps.plain
            elif regime == "cn_augmix":
                if cfg.no_jsd:
                    # single mixed view, plain CE (+ the CN gate): the
                    # 3-view JSD programs never run
                    fn = self.steps.cn if gate else self.steps.plain
                else:
                    fn = self.steps.augmix_cn if gate else self.steps.augmix
            elif regime == "cn_image":
                fn = self.steps.cn_image if gate else self.steps.plain
            elif regime == "cn_image_consist":
                fn = (self.steps.cn_image_consist if gate
                      else self.steps.plain)
            elif regime == "cn_image_augmix":
                fn = (self.steps.cn_image_augmix if gate
                      else self.steps.augmix)
            else:
                raise ValueError(regime)

            self.state, metrics = fn(self.state, im, lb, key)
            pending.append((metrics["loss"], int(lb.shape[-1])))
            if i % cfg.print_freq == 0:
                for v, m in pending:
                    losses.update(float(v), m)
                pending.clear()
                print(f"Train Loss {losses.avg:.3f}")
        for v, m in pending:
            losses.update(float(v), m)
        return losses.avg

    # ---- full run --------------------------------------------------------

    def evaluate_clean(self):
        return evaluate(self.steps.eval_sum, self.state, self.test_loader,
                        prefetch_depth=self.cfg.prefetch_depth,
                        dp=self.dp)

    def fit(self, epochs: Optional[int] = None) -> float:
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        with open(self.log_file, "a") as f:
            f.write(f"dataset: {cfg.dataset}\n")
            f.write(f"batch size: {cfg.batch_size}\n")
            f.write(f"lr: {cfg.lr}\n")
            f.write(f"momentum: {cfg.momentum}\n")
            f.write(f"weight_decay: {cfg.weight_decay}\n")
            f.write("epoch\tlr\tTrain Loss\tTest Err1\tBest Test Err1\n")

        try:
            for epoch in range(self.start_epoch, epochs):
                self._epoch = epoch
                lr = float(self.schedule(self.state.step))
                t0 = time.time()
                train_loss = self.train_epoch()
                test_loss, test_acc = self.evaluate_clean()
                is_best = test_acc > self.best_acc
                self.best_acc = max(test_acc, self.best_acc)
                if self.ckpt is not None:
                    # async: the save overlaps the next epoch's steps
                    self.ckpt.save(int(jax.device_get(self.state.step)),
                                   self.state,
                                   extra={"epoch": epoch + 1,
                                          "best_acc": self.best_acc},
                                   metrics={"test_acc": float(test_acc)})
                else:
                    save_checkpoint(self.state, type(self.model).__name__,
                                    self.exp_dir, epoch + 1, self.best_acc,
                                    is_best,
                                    keep_epoch_file=(cfg.dataset == "imagenet"))
                with open(self.log_file, "a") as f:
                    f.write(f"{epoch:d}\t{lr:g}\t{train_loss:2.2f}\t"
                            f"{100 - 100. * test_acc:2.2f}\t"
                            f"{100 - 100. * self.best_acc:2.2f}\n")
                print(f"epoch {epoch}: loss {train_loss:.3f} "
                      f"err {100 - 100. * test_acc:.2f} "
                      f"({time.time() - t0:.1f}s)")
            if self.ckpt is not None:
                self.ckpt.manager.wait_until_finished()
        finally:
            self.close()
        return self.best_acc

    def close(self):
        """Tear down loader worker pools (idempotent)."""
        for ld in (getattr(self, "train_loader", None),
                   getattr(self, "test_loader", None)):
            if ld is not None and hasattr(ld, "close"):
                ld.close()

    def test_corruptions(self) -> float:
        cfg = self.cfg
        if cfg.dataset == "imagenet":
            return self._test_corruptions_imagenet()
        mean_acc, _ = evaluate_cifar_c(
            self.steps.eval_sum, self.state, cfg.corrupt_data_dir,
            cfg.num_classes, cfg.eval_batch_size, dp=self.dp,
            prefetch_depth=cfg.prefetch_depth)
        print(f"Mean Corruption Error: {100 - 100. * mean_acc:.3f}")
        return mean_acc

    def _test_corruptions_imagenet(self) -> float:
        """ImageNet-C: per corruption x severity folders → AlexNet-
        normalized mCE (imagenet.py:426-450, 125-140)."""
        from ..data.imagenet import (ImageNetLoader, imagenet_c_dir,
                                     scan_image_folder)
        from ..evaluation.classify import CORRUPTIONS, compute_mce
        cfg = self.cfg
        corruption_accs = {}
        for corruption in CORRUPTIONS:
            accs = []
            for severity in range(1, 6):
                d = imagenet_c_dir(cfg.corrupt_data_dir, corruption,
                                   severity)
                loader = ImageNetLoader(scan_image_folder(d),
                                        cfg.eval_batch_size, mode="eval",
                                        workers=cfg.workers)
                _, acc = evaluate(self.steps.eval_sum, self.state, loader,
                                  prefetch_depth=cfg.prefetch_depth,
                                  dp=self.dp)
                accs.append(acc)
            corruption_accs[corruption] = accs
            print(f"{corruption}: avg err "
                  f"{100 * (1 - float(np.mean(accs))):.2f}")
        mce, ce_dict = compute_mce(corruption_accs)
        print("individual CEs:")
        for c in CORRUPTIONS:
            print(f"{c}: {ce_dict[c]: .2f}")
        print(f"mCE: {mce:.2f}")
        return mce
