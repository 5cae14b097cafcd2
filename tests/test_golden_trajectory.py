"""Multi-step training-trajectory parity vs the torch reference.

The golden suite (tests/test_golden.py) pins step-0 forward semantics;
this file pins the *training dynamics*: N real optimizer steps — SGD
momentum 0.9 + nesterov + coupled weight decay (cifar.py:399-413),
per-step cosine LR (cifar.py:87-90,408-413), BN batch-stat
normalization and running-stat updates (momentum 0.1, unbiased running
var), SelfNorm's BN1d state — must track the torch trajectory from
identical imported init.  Optimizer or stat-update drift that a single
forward can't see would silently break the accuracy story (23.3 top-1
/ 69.7 mCE).

Comparison runs in float64 lockstep (torch ``.double()`` vs jax x64
with the promote-not-truncate stat paths): fp32 trajectories at lr 0.1
diverge chaotically within ~3 steps from legitimate rounding (measured
0.3 loss diff by step 3), which would force tolerances loose enough to
hide real drift — in f64 both sides are the same math to ~1e-13 at
step 0, and even the chaotic ReLU-flip amplification (~1e3x/step)
keeps 3 steps well inside graded tolerances that any semantic
difference would blow through by orders of magnitude.  x64 is a process-global
jax config, so the lockstep runs in a subprocess (this file doubles as
the driver: ``python tests/test_golden_trajectory.py <model>`` prints a
JSON line with both loss arrays).

Both sides see identical synthetic batches; the plain training regime
(reference cifar.py:93-114 train / imagenet.py:143-192) is used, so CN
sites stay inactive and the trajectory is RNG-free (WRN dropout=0).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                 reason="reference repo not available")]

CONFIGS = {
    # model -> (n_steps, batch, size, classes, lr, wd, total_steps)
    "wideresnet": (3, 16, 32, 10, 0.1, 5e-4, 24),
    "resnet50": (3, 8, 64, 1000, 0.1, 1e-4, 16),
    # AugMix JSD regime on WRN: batch is per-view (3 stacked views)
    "augmix": (3, 8, 32, 10, 0.1, 5e-4, 24),
    # CrossNorm-ACTIVE regimes (pinned permutation/bbox/site draws)
    "cn": (3, 16, 32, 10, 0.1, 5e-4, 24),        # WRN, crop=both
    "cn_style": (3, 16, 32, 10, 0.1, 5e-4, 24),  # WRN, fused, crop=style
    "cn_image": (3, 8, 64, 1000, 0.1, 1e-4, 16),  # R50 flagship regime
    "cn_consist": (3, 16, 32, 10, 0.1, 5e-4, 24),  # WRN, clean CE + JSD
    # AugMix + CN consistency (the paper's headline CIFAR recipe)
    "augmix_cn": (3, 8, 32, 10, 0.1, 5e-4, 24),
    # ImageNet AugMix regime: image-space CN over the whole 3B concat
    "cn_image_augmix": (3, 4, 64, 1000, 0.1, 1e-4, 16),
    # ResNet-50-IBN-b under image-space CN (the AugMix recipe's model,
    # imagenet-scripts/run-cnsn-augmix.sh: model=resnet50_ibn_b)
    "ibn_image": (3, 8, 64, 1000, 0.1, 1e-4, 16),
}

CONSIST_WT = 10.0  # nonzero so a JSD-path error dominates the loss

# Pinned draws for the CN-active trajectories: both frameworks sample
# the instance pairing, the active-site subset, and the crop boxes at
# random (reference: models/cnsn.py:32-55,62; wideresnet_cnsn.py:199-203);
# the lockstep freezes all three to the SAME values on both sides so
# the remaining comparison is pure CrossNorm forward/backward math.
CN_SITES = (3, 11)  # active 2 of WRN's 18 sites (torch cn_modules order
#                     == jax mask order: sequential over blocks)


def _pinned_boxes(size):
    """(h1, h2, w1, w2) boxes, area ratio > bbx_thres=0.1; [style, content]."""
    s = size
    return [(s // 8, s - s // 4, s // 6, s - s // 8),
            (s // 5, s - s // 6, s // 10, s - s // 3)]


def _run_lockstep(which, extra_env=None):
    env = dict(os.environ)
    env.update(JAX_ENABLE_X64="1", CNSN_BN_VAR="two",
               CNSN_STATS_VAR="two", JAX_PLATFORMS="cpu")
    env.update(extra_env or {})
    if which in ("cn_consist", "augmix_cn"):
        # crop='neither' through the unfused cond path: CrossNorm is
        # then torch's exact expression order, keeping this regime at
        # the strict floor so the tolerances bite on the JSD/consist
        # machinery itself (fused/fma equivalence: test_cnsn_fused.py).
        env.update(CNSN_FUSE="0", CNSN_CN_IMPL="cond")
    r = subprocess.run([sys.executable, os.path.abspath(__file__), which],
                       capture_output=True, text=True, timeout=1500, env=env)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    assert line.startswith("{"), (r.stdout[-2000:], r.stderr[-2000:])
    return json.loads(line)


def _assert_tracks(rec, tols=(1e-9, 1e-6, 1e-5, 1e-5)):
    """Graded per-step tolerances: the f64 lockstep noise floor is
    ~1e-13 at step 0 and amplifies ~1e3x/step through ReLU-boundary
    flips (measured); a semantic error in the update — wrong wd
    coupling, nesterov form, or LR value — injects >=1e-4 at step 1.
    Three steps cover: forward, first update (nesterov init + wd +
    lr(0)), momentum accumulation + lr(1), and the resulting forwards.
    A 4th entry, when present, is the post-training EVAL-mode loss:
    train losses normalize by batch stats and are blind to the
    running-stat updates, so this is what pins BN momentum/unbiased-var
    accumulation (and SelfNorm's BN1d state) across steps.

    Errors are normalized by max(1, |loss|): identity for the O(1)
    train losses, relative for the eval entry (3-step-old running
    stats on noise inputs give O(1e4) eval losses).

    When ``tols`` is SHORTER than the loss arrays, the surplus entries
    are ignored: the crop'd CN regimes pass 3 train tols only, because
    their eval loss is a small difference of ~1e6-scale logits — after
    the documented chaotic amplification of the masked-reduction floor
    it carries no signal (measured 0.32 relative for a pure
    reduction-order difference); the running-stat machinery those
    entries pin is identical code, held to 1e-5 by the seven
    strict-floor regimes."""
    t, f = np.asarray(rec["torch"]), np.asarray(rec["jax"])
    err = np.abs(t - f) / np.maximum(1.0, np.abs(t))
    n = min(len(err), len(tols))
    assert (err[:n] < np.asarray(tols)[:n]).all(), (rec, err)


# The masked-crop regimes carry a higher (still pure-rounding) floor:
# the TPU design reduces masked full-plane sums where torch reduces a
# sliced crop — identical math, different summation order — and the
# ~1e-15 stat perturbation amplifies through 18 BN'd blocks to a
# measured 2.6e-9 (cn) / 7.8e-9 (cn_style) step-0 loss gap, then
# chaotically (x300-1e4/step).  The crop='neither' regime (cn_image)
# has NO masked reduction and sits at the strict 1e-13 floor — pinning
# the gap to reduction order, not semantics.  A real semantic error
# (wrong eps placement, ddof, box convention, gate algebra) injects
# >=1e-4 at step 0: 4+ orders above these tolerances.  3 entries: the
# eval-mode 4th entry is excluded here (see _assert_tracks).
CN_CROP_TOLS = (1e-7, 1e-4, 1e-1)


def test_golden_trajectory_wideresnet():
    _assert_tracks(_run_lockstep("wideresnet"))


def test_golden_trajectory_resnet50_flagship():
    _assert_tracks(_run_lockstep("resnet50"))


def test_golden_trajectory_augmix_jsd():
    """AugMix JSD training dynamics vs torch (cifar.py:219-246, cn gate
    off): one batched forward over the 3-view concat (BN batch stats
    over 3B), CE on the clean view + 12×JSD with the clamped-mixture KL
    — multi-step, through the same SGD/cosine trajectory."""
    _assert_tracks(_run_lockstep("augmix"))


def test_golden_trajectory_cn_active():
    """CrossNorm-ACTIVE training dynamics vs torch (cifar.py:117-145
    train_cn with the gate forced on): WRN cnsn/pos=post/crop=both
    (the cifar100 wrn recipe's crop machinery — style-crop masked
    statistics, content-box compositing), 2 pinned active sites, pinned
    pairing permutation and boxes; multi-step through SGD/cosine."""
    _assert_tracks(_run_lockstep("cn"), CN_CROP_TOLS)


def test_golden_trajectory_cn_fused_style():
    """Same regime through the fused CNSN fast path (crop=style):
    CrossNorm's affine + the analytic SelfNorm statistics algebra must
    reproduce the reference's two-module composition across training
    steps, not just in a single forward (tests/test_cnsn_fused.py)."""
    _assert_tracks(_run_lockstep("cn_style"), CN_CROP_TOLS)


def test_golden_trajectory_cn_image_flagship():
    """The flagship ImageNet regime end-to-end (imagenet.py:195-250
    train_cn_image, run-cnsn.sh knobs): image-space CrossNorm
    (crop=neither) on the input batch + in-network SelfNorm ResNet-50,
    pinned pairing; multi-step through the SGD/cosine trajectory."""
    _assert_tracks(_run_lockstep("cn_image"))


def test_golden_trajectory_cn_consistency():
    """The CN-consistency regime vs torch (cifar.py:148-208
    train_cn_consistency with the gate forced on): clean-CE + two aug
    forwards + consist_wt*JSD (clamped-mixture KL), BN running stats
    updated clean->aug1->aug2 — multi-step through SGD/cosine."""
    _assert_tracks(_run_lockstep("cn_consist"))


def test_golden_trajectory_cn_image_augmix():
    """The ImageNet AugMix regime vs torch (imagenet.py:337-406
    train_cn_image_augmix with the gate forced on): image-space CN
    applied to the whole 3B concat — instances pair ACROSS views
    (imagenet.py:357-358) — then CE on the clean split + 12*JSD."""
    _assert_tracks(_run_lockstep("cn_image_augmix"))


def test_golden_trajectory_augmix_cn():
    """The full CNSN AugMix regime vs torch (cifar.py:211-272
    train_cn_augmix with the gate forced on): 3-view concat forward +
    CE + 12*JSD, then two CN-aug forwards on the CLEAN view and
    consist_wt*JSD against the concat-forward p_clean — the reference's
    headline CIFAR recipe, multi-step through SGD/cosine."""
    _assert_tracks(_run_lockstep("augmix_cn"))


def test_trajectory_harness_detects_semantic_drift():
    """Mutation check on the harness itself: re-run the WRN lockstep
    with the jax side's nesterov DISABLED (plain heavy-ball momentum —
    a classic silent optimizer drift; the reference trains with
    nesterov=True, cifar.py:399-413).  The forward at step 0 must still
    match (the sabotage only changes the update rule), and the step-1
    loss must blow through the 1e-6 tolerance by >=2 orders — evidence
    the graded tolerances actually catch update-rule errors rather
    than passing anything."""
    rec = _run_lockstep("wideresnet",
                        extra_env={"CNSN_TRAJ_SABOTAGE": "nesterov"})
    t, f = np.asarray(rec["torch"]), np.asarray(rec["jax"])
    err = np.abs(t - f) / np.maximum(1.0, np.abs(t))
    assert err[0] < 1e-9, rec          # forward semantics untouched
    assert (err[1:3] > 1e-4).all(), rec  # update drift detected


def test_golden_trajectory_ibn_b():
    """ResNet-50-IBN-b training dynamics vs torch under image-space CN
    (the run-cnsn-augmix.sh model, imagenet.py:195-250 regime): the IBN
    split (half-IN/half-BN after conv1, resnet_ibn_cnsn.py:24-44), the
    post-add InstanceNorm of the 'b' variant (:122-123), in-network
    SelfNorm, and the BN/IN running-stat split — multi-step through
    SGD/cosine.  Golden forwards (test_golden.py) can't see a wrong
    IN gradient path or a stat update leaking into the IN layers."""
    _assert_tracks(_run_lockstep("ibn_image"))


def test_golden_trajectory_segmentation():
    """Seg training dynamics vs torch: SGD momentum 0.9 + coupled wd
    (NO nesterov), per-iteration post-step poly LR with 10x head groups
    (train_cnsn.py:319-349, util.py:102-105), BN running stats, dual
    FCN heads with aux_weight 0.4, ignore-masked CE."""
    _assert_tracks(_run_lockstep("segmentation"))


def test_golden_trajectory_segmentation_cn():
    """The shipped GTAV CNSN recipe's CrossNorm machinery across
    training steps (gtav_fcn50_cnsn.yaml: cnsn_type=cnsn, pos=residual,
    cn_pos=post, crop=style, train_cnsn.py:305-311 external arm):
    decoupled real_cn sites at 'post' with style-crop stat transfer on
    OS8 dilated feature maps, pinned pairing/box/sites on both sides;
    SGD + poly LR + dual heads as in the plain seg trajectory.

    Tolerances: the masked style-crop reduction floor measures 9e-10
    at step 0 and amplifies faster than the WRN crop regimes (16 sites
    × deeper trunk: ~3e-5 at step 1, ~3e-4 at step 2); unlike the
    lr-0.1 classification crop regimes the lr-0.01 seg trajectory
    stays well-conditioned, so the eval entry DOES bite here
    (measured 5e-5)."""
    _assert_tracks(_run_lockstep("seg_cn"), (1e-7, 1e-3, 1e-1, 1e-2))


# ---------------------------------------------------------------------------
# subprocess driver
# ---------------------------------------------------------------------------

def _pin_cn_randomness(size, crop):
    """Freeze the CN stochastic draws identically on both sides.

    jax: the jitted step traces ONCE (identical avals every step), so
    trace-time counters give the style box on the first sample_bbox
    call and the content box on the second, matching the reference's
    call order (models/cnsn.py:64-66 style first, :74-76 content).
    torch: executes per step — the counter cycles with the per-step
    call count (2 for crop=both, 1 otherwise).
    """
    import torch
    import jax.numpy as jnp
    import models.cnsn as ref_cnsn
    from cnsn_tpu.ops import bbox as bbox_mod
    from cnsn_tpu.ops import crossnorm as cn_mod
    from cnsn_tpu.train import steps as steps_mod

    perm = lambda n: (np.arange(n) + 1) % n
    cn_mod.grouped_permutation = (
        lambda key, n, num_groups=1: jnp.asarray(perm(n)))
    torch.randperm = lambda n, **kw: torch.from_numpy(perm(n))

    boxes = _pinned_boxes(size)
    per_step = 2 if crop == "both" else 1
    calls = {"jax": 0, "torch": 0}

    def j_bbox(key, h, w, **kw):
        b = boxes[calls["jax"] % per_step]
        calls["jax"] += 1
        return b

    bbox_mod.sample_bbox = j_bbox
    cn_mod.sample_bbox = j_bbox

    def t_bbox(sz, beta, bbx_thres):
        h1, h2, w1, w2 = boxes[calls["torch"] % per_step]
        calls["torch"] += 1
        # reference convention: (bbx1, bby1, bbx2, bby2) slicing NCHW
        # dims 2 (rows) and 3 (cols) — models/cnsn.py:66,77
        return h1, w1, h2, w2

    ref_cnsn.cn_rand_bbox = t_bbox

    steps_mod.sample_cn_mask = (
        lambda key, cn_num, active_num:
            jnp.zeros((cn_num,), bool).at[np.asarray(CN_SITES)].set(True))


def _driver(which):
    if which in ("segmentation", "seg_cn"):
        return _driver_seg(cn=which == "seg_cn")
    import contextlib
    import io
    import types

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (repo, REFERENCE):
        if p not in sys.path:
            sys.path.insert(0, p)
    from cnsn_tpu.models import build_model
    from cnsn_tpu.train import (StepFns, cosine_lr, create_train_state,
                                make_sgd)
    from cnsn_tpu.utils.torch_import import convert_state_dict

    steps_n, batch, size, classes, lr, wd, total = CONFIGS[which]

    wrn_like = which in ("wideresnet", "augmix", "cn", "cn_style",
                         "cn_consist", "augmix_cn")
    crop = {"cn": "both", "cn_style": "style"}.get(which, "neither")

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        if wrn_like:
            from models.cifar.wideresnet_cnsn import WideResNet as TorchWRN
            t = TorchWRN(40, classes, 2, 0.0, active_num=2, pos="post",
                         beta=1.0, crop=crop, cnsn_type="cnsn")
            f = build_model("wideresnet", num_classes=classes, pos="post",
                            beta=1.0, crop=crop, cnsn_type="cnsn")
        elif which == "ibn_image":
            from models.imagenet.resnet_ibn_cnsn import (
                resnet50_ibn_b as torch_ibn_b)
            cfg = types.SimpleNamespace(active_num=1, pos="residual",
                                        beta=1.0, crop="neither",
                                        cnsn_type="sn")
            t = torch_ibn_b(cfg)
            # the reference head hard-codes AvgPool2d(7) (224² inputs,
            # resnet_ibn_cnsn.py); the adaptive pool is the identical
            # global mean at any size, keeping the f64 lockstep at 64²
            t.avgpool = torch.nn.AdaptiveAvgPool2d(1)
            f = build_model("resnet50_ibn_b", num_classes=classes,
                            pos="residual", beta=1.0, crop="neither",
                            cnsn_type="sn")
        else:
            from models.imagenet.resnet_cnsn import resnet50 as torch_r50
            cfg = types.SimpleNamespace(active_num=1, pos="post", beta=1.0,
                                        crop="neither", cnsn_type="sn")
            t = torch_r50(cfg)
            f = build_model("resnet50", num_classes=classes, pos="post",
                            beta=1.0, crop="neither", cnsn_type="sn")
    t = t.double()

    if which in ("cn", "cn_style", "cn_image", "cn_consist", "augmix_cn",
                 "cn_image_augmix", "ibn_image"):
        _pin_cn_randomness(size, crop)

    rng = np.random.RandomState(3)
    three_view = which in ("augmix", "augmix_cn", "cn_image_augmix")
    xshape = ((3, batch, size, size, 3) if three_view
              else (batch, size, size, 3))
    batches = [(rng.randn(*xshape),
                rng.randint(0, classes, batch).astype(np.int64))
               for _ in range(steps_n)]

    # ----- jax side first (imports the torch init before it mutates)
    x0 = jnp.asarray(batches[0][0][0] if three_view else batches[0][0])
    variables = f.init({"params": jax.random.key(0)}, x0, False, None)
    params, stats, missing = convert_state_dict(
        t.state_dict(), dict(variables["params"]),
        dict(variables.get("batch_stats", {})), strict=True)
    assert not missing, missing
    as64 = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)
    params, stats = as64(params), as64(stats)

    # CNSN_TRAJ_SABOTAGE=nesterov: deliberate update-rule drift used by
    # the harness mutation check (plain momentum instead of nesterov)
    sabotage = os.environ.get("CNSN_TRAJ_SABOTAGE")
    tx = make_sgd(cosine_lr(lr, total), weight_decay=wd,
                  nesterov=sabotage != "nesterov")
    state = create_train_state(f, jax.random.key(0), x0.shape, tx)
    # re-create the optimizer state at f64 so momentum accumulates in f64
    state = state.replace(params=params, batch_stats=stats,
                          opt_state=tx.init(params))
    sfns = StepFns(f, active_num=2, image_crop="neither", image_beta=1.0,
                   consist_wt=CONSIST_WT)
    step_fn = {"augmix": sfns.augmix, "cn": sfns.cn, "cn_style": sfns.cn,
               "cn_image": sfns.cn_image, "ibn_image": sfns.cn_image,
               "cn_consist": sfns.cn_consistency,
               "augmix_cn": sfns.augmix_cn,
               "cn_image_augmix": sfns.cn_image_augmix}.get(which, sfns.plain)
    f_losses = []
    for i, (x, y) in enumerate(batches):
        state, metrics = step_fn(state, jnp.asarray(x),
                                 jnp.asarray(y), jax.random.key(i))
        f_losses.append(float(metrics["loss"]))
    # eval-mode forward on the step-0 clean batch: exercises the
    # ACCUMULATED running stats (BN momentum 0.1, unbiased running var,
    # SelfNorm's BN1d state) that the train losses never read
    x0e, y0e = batches[0]
    em = sfns.eval_step(state, jnp.asarray(x0e[0] if three_view else x0e),
                        jnp.asarray(y0e))
    f_losses.append(float(em["loss"]))

    # ----- torch side (reference loops: plain cifar.py:399-413 + 87-90,
    # augmix JSD cifar.py:219-246 with the cn gate off)
    F = torch.nn.functional
    opt = torch.optim.SGD(t.parameters(), lr, momentum=0.9,
                          weight_decay=wd, nesterov=True)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=lambda step: 1e-6 / lr + (1 - 1e-6 / lr) * 0.5 * (
            1 + np.cos(step / total * np.pi)))
    t.train()
    t_losses = []
    for x, y in batches:
        yt = torch.from_numpy(y)
        if which == "augmix":
            xt = torch.from_numpy(
                x.reshape(-1, size, size, 3).transpose(0, 3, 1, 2))
            logits_all = t(xt)
            lc, l1, l2 = torch.split(logits_all, batch)
            loss = F.cross_entropy(lc, yt)
            p = [F.softmax(z, dim=1) for z in (lc, l1, l2)]
            p_mix = torch.clamp((p[0] + p[1] + p[2]) / 3., 1e-7, 1).log()
            loss = loss + 12. * (
                F.kl_div(p_mix, p[0], reduction="batchmean")
                + F.kl_div(p_mix, p[1], reduction="batchmean")
                + F.kl_div(p_mix, p[2], reduction="batchmean")) / 3.
        elif which == "augmix_cn":
            # train_cn_augmix with the gate forced on (cifar.py:219-261):
            # 3B concat forward, CE + 12*JSD, then two armed CN forwards
            # on the CLEAN view; cn-JSD mixes with the concat p_clean.
            xt = torch.from_numpy(
                x.reshape(-1, size, size, 3).transpose(0, 3, 1, 2))
            logits_all = t(xt)
            lc, l1, l2 = torch.split(logits_all, batch)
            loss = F.cross_entropy(lc, yt)
            p = [F.softmax(z, dim=1) for z in (lc, l1, l2)]
            p_mix = torch.clamp((p[0] + p[1] + p[2]) / 3., 1e-7, 1).log()
            loss = loss + 12. * (
                F.kl_div(p_mix, p[0], reduction="batchmean")
                + F.kl_div(p_mix, p[1], reduction="batchmean")
                + F.kl_div(p_mix, p[2], reduction="batchmean")) / 3.
            x_clean = torch.from_numpy(x[0].transpose(0, 3, 1, 2))
            pcn = [p[0]]
            for _ in range(2):
                for i in CN_SITES:
                    t.cn_modules[i].active = True
                pcn.append(F.softmax(t(x_clean), dim=1))
            cn_mix = torch.clamp(
                (pcn[0] + pcn[1] + pcn[2]) / 3., 1e-7, 1).log()
            loss = loss + CONSIST_WT * (
                F.kl_div(cn_mix, pcn[0], reduction="batchmean")
                + F.kl_div(cn_mix, pcn[1], reduction="batchmean")
                + F.kl_div(cn_mix, pcn[2], reduction="batchmean")) / 3.
        elif which in ("cn", "cn_style"):
            # train_cn with the Bernoulli gate forced on
            # (cifar.py:127-131): pinned active sites instead of
            # _enable_cross_norm's np.random.choice; CrossNorm.forward
            # self-resets .active, so re-arm every step.
            for i in CN_SITES:
                t.cn_modules[i].active = True
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            loss = F.cross_entropy(t(xt), yt)
        elif which == "cn_consist":
            # train_cn_consistency with the gate forced on
            # (cifar.py:163-187): CE on the clean forward only, JSD over
            # (clean, aug1, aug2); sites re-armed before EACH aug
            # forward (CrossNorm.forward self-resets .active).
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            logits_clean = t(xt)
            loss = F.cross_entropy(logits_clean, yt)
            augs = []
            for _ in range(2):
                for i in CN_SITES:
                    t.cn_modules[i].active = True
                augs.append(t(xt))
            p = [F.softmax(z, dim=1) for z in (logits_clean, *augs)]
            p_mix = torch.clamp((p[0] + p[1] + p[2]) / 3., 1e-7, 1).log()
            loss = loss + CONSIST_WT * (
                F.kl_div(p_mix, p[0], reduction="batchmean")
                + F.kl_div(p_mix, p[1], reduction="batchmean")
                + F.kl_div(p_mix, p[2], reduction="batchmean")) / 3.
        elif which == "cn_image_augmix":
            # train_cn_image_augmix with the gate forced on
            # (imagenet.py:355-377): CN over the 3B concat, CE on the
            # clean split + 12*JSD.
            import models.cnsn as ref_cnsn
            xt = torch.from_numpy(
                x.reshape(-1, size, size, 3).transpose(0, 3, 1, 2))
            xt = ref_cnsn.cn_op_2ins_space_chan(xt, crop="neither", beta=1)
            lc, l1, l2 = torch.split(t(xt), batch)
            loss = F.cross_entropy(lc, yt)
            p = [F.softmax(z, dim=1) for z in (lc, l1, l2)]
            p_mix = torch.clamp((p[0] + p[1] + p[2]) / 3., 1e-7, 1).log()
            loss = loss + 12. * (
                F.kl_div(p_mix, p[0], reduction="batchmean")
                + F.kl_div(p_mix, p[1], reduction="batchmean")
                + F.kl_div(p_mix, p[2], reduction="batchmean")) / 3.
        elif which in ("cn_image", "ibn_image"):
            # train_cn_image with the gate forced on (imagenet.py:214-215)
            import models.cnsn as ref_cnsn
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            xt = ref_cnsn.cn_op_2ins_space_chan(xt, crop="neither", beta=1)
            loss = F.cross_entropy(t(xt), yt)
        else:
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            loss = F.cross_entropy(t(xt), yt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        t_losses.append(loss.item())

    t.eval()
    with torch.no_grad():
        x0e, y0e = batches[0]
        xe = torch.from_numpy(
            (x0e[0] if three_view else x0e).transpose(0, 3, 1, 2))
        t_losses.append(
            F.cross_entropy(t(xe), torch.from_numpy(y0e)).item())

    # Direct running-stat tree comparison at step N: convert torch's
    # post-training buffers (BN running mean/var, SelfNorm BN1d state)
    # at f64 and diff leaf-wise against the jax batch_stats tree.
    # Unlike the eval-loss entry this does not route the comparison
    # through the logits, so it stays meaningful even in the crop'd
    # lr-0.1 regimes where the eval loss is chaotic (VERDICT r3 #4).
    _, t_stats, _ = convert_state_dict(
        t.state_dict(), dict(variables["params"]),
        dict(variables.get("batch_stats", {})), strict=True,
        dtype=np.float64)
    js = jax.tree.map(np.asarray, state.batch_stats)
    stats_relerr = max(
        float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))
        for a, b in zip(jax.tree.leaves(js), jax.tree.leaves(t_stats)))

    print(json.dumps({"torch": t_losses, "jax": f_losses,
                      "stats_relerr": stats_relerr}))


def _driver_seg(cn=False):
    """f64 lockstep for the segmentation world (reference
    segmentation/tool/train_cnsn.py:300-380): dilated SN trunk + dual
    FCN heads (dropout 0 for determinism), loss = CE + 0.4*CE_aux with
    ignore_index 255, SGD(momentum=0.9, wd=1e-4) with the reference's
    post-step poly LR assignment and 10x head groups.

    ``cn=True`` switches the trunk to the shipped GTAV CNSN recipe
    (cnsn_type=cnsn, cn_pos=post, crop=style): 16 decoupled ``real_cn``
    CrossNorm sites (cnsn_resnet.py:263,310) armed externally per step
    (train_cnsn.py:305-311), with pairing permutation, style box, and
    active sites pinned to the same values on both sides."""
    import contextlib
    import io

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seg_ref = os.path.join(REFERENCE, "segmentation")
    for p in (repo, seg_ref):
        if p not in sys.path:
            sys.path.insert(0, p)
    from cnsn_tpu.segmentation import fcn_cnsn, make_seg_optimizer
    from cnsn_tpu.utils.torch_import import convert_state_dict

    steps_n, batch, size, classes = 3, 4, 65, 19
    base_lr, wd, max_iter, aux_w = 0.01, 1e-4, 20, 0.4

    cnsn_type = "cnsn" if cn else "sn"
    cn_pos = "post" if cn else None
    crop = "style" if cn else "neither"

    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        import model.cnsn_resnet as cnsn_resnet
        trunk = cnsn_resnet.resnet50(
            pretrained=False, SN=True,
            replace_stride_with_dilation=[False, True, True],
            pos="residual", cn_pos=cn_pos, beta=1.0, block_idxs="1_2_3_4",
            crop=crop, cnsn_type=cnsn_type, active_num=1)

    if cn:
        # pin the CN draws on both sides (the seg reference samples
        # sites via _enable_cross_norm's np.random.choice and the
        # box/perm inside the symlinked model/cnsn.py)
        import model.cnsn as seg_ref_cnsn
        import jax.numpy as _jnp
        from cnsn_tpu.ops import bbox as bbox_mod
        from cnsn_tpu.ops import crossnorm as cn_mod

        perm = lambda n: (np.arange(n) + 1) % n
        cn_mod.grouped_permutation = (
            lambda key, n, num_groups=1: _jnp.asarray(perm(n)))
        torch.randperm = lambda n, **kw: torch.from_numpy(perm(n))
        # one style box, valid on every OS8 feature scale (17² and 9²
        # for 65² inputs); crop='style' samples exactly one box per op
        box = (1, 9, 0, 8)
        bbox_mod.sample_bbox = lambda key, h, w, **kw: box
        cn_mod.sample_bbox = bbox_mod.sample_bbox
        # reference returns (bbx1, bby1, bbx2, bby2) slicing NCHW dims
        # 2/3 (models/cnsn.py:64-66)
        seg_ref_cnsn.cn_rand_bbox = (
            lambda sz, beta, bbx_thres: (box[0], box[2], box[1], box[3]))

    def head(cin):
        torch.manual_seed(cin)
        return torch.nn.Sequential(
            torch.nn.Conv2d(cin, cin // 4, 3, padding=1, bias=False),
            torch.nn.BatchNorm2d(cin // 4),
            torch.nn.ReLU(),
            torch.nn.Dropout(0.0),
            torch.nn.Conv2d(cin // 4, classes, 1))

    t_cls, t_aux = head(2048), head(1024)
    for m in (trunk, t_cls, t_aux):
        m.double().train()

    f = fcn_cnsn(classes=classes, block_idxs="1_2_3_4", pos="residual",
                 cn_pos=cn_pos, cnsn_type=cnsn_type, crop=crop, dropout=0.0)
    cn_mask = None
    if cn:
        import jax.numpy as _jnp2
        cn_mask = _jnp2.zeros((f.cn_num,), bool).at[
            np.asarray(CN_SITES)].set(True)

    rng = np.random.RandomState(5)
    batches = []
    for _ in range(steps_n):
        x = rng.randn(batch, size, size, 3)
        y = rng.randint(0, classes, (batch, size, size)).astype(np.int64)
        y[:, :7] = 255  # ignore band
        batches.append((x, y))

    # ----- jax side (import torch init before the torch loop mutates it)
    x0 = jnp.asarray(batches[0][0])
    variables = f.init({"params": jax.random.key(0)}, x0, False, None, None)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    sd = {k: v for k, v in trunk.state_dict().items()
          if not k.startswith("fc.")}
    params, stats, missing = convert_state_dict(
        sd, params, stats, strict=True, prefix=("backbone",))
    assert not missing, missing
    head_map = {"0": "conv1", "1": "bn1", "4": "conv2"}
    for tm, name in ((t_cls, "classifier"), (t_aux, "aux_classifier")):
        params, stats, missing = convert_state_dict(
            tm.state_dict(), params, stats, strict=True,
            prefix=(name,), key_map=head_map)
        assert not missing, missing
    as64 = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)
    params, stats = as64(params), as64(stats)

    tx = make_seg_optimizer(params, base_lr, max_iter, 0.9, 0.9, wd)
    opt_state = tx.init(params)

    def ce(logits_lr, y):
        out = jax.image.resize(
            logits_lr, (batch, size, size, classes), "bilinear")
        valid = y != 255
        safe = jnp.where(valid, y, 0)
        logp = jax.nn.log_softmax(out, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.sum(valid)

    def loss_fn(params, stats, x, y):
        (out, aux), mut = f.apply(
            {"params": params, "batch_stats": stats}, x, True, cn_mask, None,
            rngs={"dropout": jax.random.key(0),
                  "crossnorm": jax.random.key(1)},
            mutable=["batch_stats"], upsample=False)
        return ce(out, y) + aux_w * ce(aux, y), mut["batch_stats"]

    f_losses = []
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    for x, y in batches:
        (loss, stats), grads = grad_fn(params, stats,
                                       jnp.asarray(x), jnp.asarray(y))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        f_losses.append(float(loss))
    # eval-mode dual-head loss on batch 0: pins the accumulated BN
    # running stats through the trunk + both heads
    x0e, y0e = batches[0]
    out, aux = f.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x0e), False, None, None, upsample=False)
    f_losses.append(float(ce(out, jnp.asarray(y0e))
                          + aux_w * ce(aux, jnp.asarray(y0e))))

    # ----- torch side (reference loop)
    heads_params = list(t_cls.parameters()) + list(t_aux.parameters())
    opt = torch.optim.SGD(
        [{"params": list(trunk.parameters()), "lr": base_lr},
         {"params": heads_params, "lr": base_lr * 10.0}],
        lr=base_lr, momentum=0.9, weight_decay=wd)
    t_losses = []
    for i, (x, y) in enumerate(batches):
        if cn:
            # external arm, train_cnsn.py:305-311 with pinned sites
            # (CrossNorm.forward self-resets .active every forward)
            for s in CN_SITES:
                trunk.cn_modules[s].active = True
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y)
        feats = trunk(xt)
        up = lambda z: torch.nn.functional.interpolate(
            z, size=(size, size), mode="bilinear", align_corners=False)
        loss = (torch.nn.functional.cross_entropy(
                    up(t_cls(feats["out"])), yt, ignore_index=255)
                + aux_w * torch.nn.functional.cross_entropy(
                    up(t_aux(feats["aux"])), yt, ignore_index=255))
        opt.zero_grad()
        loss.backward()
        opt.step()
        # faithful to the reference loop: poly(i+1) is assigned AFTER
        # step() and only takes effect at the next update
        # (train_cnsn.py:319-349)
        lr_i = base_lr * (1 - float(i + 1) / max_iter) ** 0.9
        opt.param_groups[0]["lr"] = lr_i
        opt.param_groups[1]["lr"] = lr_i * 10.0
        t_losses.append(loss.item())

    for m in (trunk, t_cls, t_aux):
        m.eval()
    with torch.no_grad():
        x0e, y0e = batches[0]
        xt = torch.from_numpy(x0e.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y0e)
        feats = trunk(xt)
        t_losses.append(
            (torch.nn.functional.cross_entropy(
                 up(t_cls(feats["out"])), yt, ignore_index=255)
             + aux_w * torch.nn.functional.cross_entropy(
                 up(t_aux(feats["aux"])), yt, ignore_index=255)).item())

    print(json.dumps({"torch": t_losses, "jax": f_losses}))


if __name__ == "__main__":
    _driver(sys.argv[1])
