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
from .schedules import cosine_lr, imagenet_step_lr
from .steps import StepFns, create_train_state, make_sgd

__all__ = ["Trainer"]


class Trainer:
    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg = cfg.infer()
        np.random.seed(cfg.seed)

        self.mesh = make_mesh(cfg.num_devices)
        self.dp = DataParallel(self.mesh)

        input_hw = 224 if cfg.dataset == "imagenet" else 32
        self.model = build_model(
            cfg.model, num_classes=cfg.num_classes, pos=cfg.pos,
            crop=cfg.crop, beta=cfg.beta, cnsn_type=cfg.cnsn_type,
            num_groups=self.dp.num_shards)

        # data
        if cfg.dataset in ("cifar10", "cifar100"):
            self.train_data = load_cifar(cfg.data_dir, cfg.dataset, True,
                                         synthetic=cfg.synthetic_data)
            self.test_data = load_cifar(cfg.data_dir, cfg.dataset, False,
                                        synthetic=cfg.synthetic_data)
            mode = ("train_augmix" if "augmix" in cfg.regime else "train")
            self.train_loader = CifarLoader(
                self.train_data, cfg.batch_size, mode=mode, seed=cfg.seed,
                aug_severity=cfg.aug_severity,
                mixture_width=cfg.mixture_width,
                mixture_depth=cfg.mixture_depth, all_ops=cfg.all_ops)
            self.test_loader = CifarLoader(self.test_data,
                                           cfg.eval_batch_size, mode="eval")
        else:
            raise NotImplementedError(
                "ImageNet training requires the imagenet data pipeline; "
                "see cnsn_tpu/data/imagenet.py")

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
        self.steps = StepFns(self.model,
                             active_num=cfg.active_num or 1,
                             consist_wt=cfg.consist_wt or 0.0,
                             image_crop=cfg.crop or "neither",
                             image_beta=cfg.beta or 1.0,
                             num_groups=self.dp.num_shards)
        self.state = self.dp.replicate(self.state)

        self.start_epoch = 0
        self.best_acc = 0.0
        if cfg.resume and os.path.isfile(cfg.resume):
            self.state, self.start_epoch, self.best_acc = restore_state(
                cfg.resume, self.state)
            self.exp_dir = os.path.dirname(cfg.resume)
            print(f"=> loaded checkpoint '{cfg.resume}' "
                  f"(epoch {self.start_epoch})")
        else:
            self.exp_dir = get_log_dir_path(cfg.exp_dir, cfg.exp_id)
            os.makedirs(self.exp_dir, exist_ok=True)
        self.log_file = os.path.join(self.exp_dir, "log.txt")
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
        for i, (images, labels) in enumerate(self.train_loader):
            im, lb = self.dp.shard_inputs(jax.numpy.asarray(images),
                                          jax.numpy.asarray(labels))
            key = self._next_key()
            gate = (cfg.cn_prob is not None
                    and float(self._rng.rand(1)[0]) < cfg.cn_prob)

            if regime == "plain":
                fn = self.steps.plain
            elif regime == "cn":
                fn = self.steps.cn if gate else self.steps.plain
            elif regime == "cn_consistency":
                fn = self.steps.cn_consistency if gate else self.steps.plain
            elif regime == "cn_augmix":
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
            n = labels.shape[-1] if labels.ndim else len(labels)
            losses.update(float(metrics["loss"]), n)
            if i % cfg.print_freq == 0:
                print(f"Train Loss {losses.avg:.3f}")
        return losses.avg

    # ---- full run --------------------------------------------------------

    def evaluate_clean(self):
        return evaluate(self.steps.eval_step, self.state, self.test_loader)

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

        for epoch in range(self.start_epoch, epochs):
            lr = float(self.schedule(self.state.step))
            t0 = time.time()
            train_loss = self.train_epoch()
            test_loss, test_acc = self.evaluate_clean()
            is_best = test_acc > self.best_acc
            self.best_acc = max(test_acc, self.best_acc)
            save_checkpoint(self.state, type(self.model).__name__,
                            self.exp_dir, epoch + 1, self.best_acc, is_best)
            with open(self.log_file, "a") as f:
                f.write(f"{epoch:d}\t{lr:g}\t{train_loss:2.2f}\t"
                        f"{100 - 100. * test_acc:2.2f}\t"
                        f"{100 - 100. * self.best_acc:2.2f}\n")
            print(f"epoch {epoch}: loss {train_loss:.3f} "
                  f"err {100 - 100. * test_acc:.2f} "
                  f"({time.time() - t0:.1f}s)")
        return self.best_acc

    def test_corruptions(self) -> float:
        cfg = self.cfg
        mean_acc, _ = evaluate_cifar_c(
            self.steps.eval_step, self.state, cfg.corrupt_data_dir,
            cfg.num_classes, cfg.eval_batch_size)
        print(f"Mean Corruption Error: {100 - 100. * mean_acc:.3f}")
        return mean_acc
