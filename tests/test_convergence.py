"""Long-horizon (100+ step) f32 convergence equivalence vs torch.

The f64 trajectory lockstep (tests/test_golden_trajectory.py) pins 3
optimizer steps exactly; this file pins what 3 steps cannot see —
LR-schedule state deep into the cosine curve, BN running-stat
accumulation over a hundred momentum updates, and the RNG-stream
coupling of the host CN gate / active-site draws — at the *realistic*
precision (f32), where trajectories diverge chaotically from pure
reduction-order rounding and per-step equality is unattainable.

Method (VERDICT r3 #1): both frameworks train from identical imported
init on identical synthetic batches with pinned CN randomness.  A
third, jax-side trajectory with a 1-ulp-scale init perturbation
(params x (1+1e-6)) measures the chaotic reduction-noise envelope.
Four calibrated checks:
  (1) early per-step train-loss divergence |torch-jax| stays inside a
      multiple of the perturbation envelope while that envelope is
      still small (before chaos saturates and everything decorrelates);
  (2) the late-window mean train loss (the statistic that survives
      chaos) matches within a multiple of the pert-arm's own gap;
  (3) eval-mode loss/accuracy on a held-out set matches at periodic
      checkpoints (this is what pins BN momentum — train losses never
      read the running stats);
  (4) the final running-stat trees agree leaf-wise within a multiple
      of the pert-arm's gap (calibration bound only: by run end the
      stats have converged to the chaos-perturbed activation moments,
      so (3)'s early checkpoints are the discriminative stat check —
      measured in perf/r4_convergence_allconv_cn.json).
Two mutation arms prove the bounds bite: BN momentum 0.2
(train-invisible; must break (3)) and a frozen LR schedule (the cosine
decays to ~0 inside the run, so freezing it is a ~90x late-LR change;
must break (2)).

The regime is deliberately tame (lr 0.03, batch 64, full cosine decay
inside the run): at the reference's lr-0.1/b32 settings a measured
round-4 calibration run showed pure f32 reduction noise amplifying
~1e5x within 30 steps, swamping every mutation signal — chaos, not a
semantic gap (that run: torch envelope ratio 14x vs mut_schedule 3x,
i.e. NO tolerance separates them at lr 0.1).  The tame regime keeps
the same code paths (same step fns, same CN gates/sites, same
schedule/optimizer machinery) while leaving chaos slow enough that a
real semantic bug clears the noise floor by orders of magnitude.

Regimes (the full training-loop surface, VERDICT r4 #2): the minimum
end-to-end slice — AllConvNet+CrossNorm CIFAR-10 (reference
cifar10-scripts/allconv/run-cn.sh via cifar.py:117-145 train_cn, host
Bernoulli(0.5) gate, per-step active-site draws replayed from the real
jax RNG stream) — a flagship-shaped config (ResNet-50 + in-network SN
+ image-space CN, imagenet.py:195-250), the AugMix+JSD consistency
regime (3-view concat forward, 12·JSD + gated consist_wt CN-JSD,
cifar.py:211-272), and the segmentation recipe (dilated CNSN trunk +
dual FCN heads, poly LR + 10x head groups + masked CE,
segmentation/tool/train_cnsn.py:282-385).
Dropout runs at 0 on both sides (mask RNGs are not comparable across
frameworks); pairing permutations are pinned to roll-1 on both sides.

x64 stays OFF (f32 is the point).  The lockstep runs in a subprocess
(this file doubles as the driver: ``python tests/test_convergence.py
<config>`` prints one JSON record with all arms).
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
    # name -> (steps, batch, size, classes, lr, wd, total, nesterov,
    #          eval_at, arms); total == steps so the cosine schedule
    #          decays fully inside the run (makes mut_schedule decisive)
    "allconv_cn": (120, 64, 32, 10, 0.03, 5e-4, 120, True,
                   (10, 25, 50, 120),
                   ("jax", "pert", "mut_momentum", "mut_schedule")),
    "flagship": (100, 8, 64, 100, 0.02, 1e-4, 100, False,
                 (10, 25, 50, 100), ("jax", "pert")),
    # AugMix+JSD regime (VERDICT r4 #2): the 12·JSD and consist_wt
    # paths live — AllConv + 3-view concat forward + gated CN-JSD
    # (reference cifar.py:211-272 train_cn_augmix; recipe knobs from
    # cnsn-augmix.yaml: consist_wt 10, active_num 1).  mut_jsd halves
    # the JSD weight (12 → 6) and must break the bounds.
    "allconv_augmix_jsd": (60, 32, 32, 10, 0.03, 5e-4, 60, True,
                           (10, 25, 40, 60),
                           ("jax", "pert", "mut_jsd", "mut_schedule")),
}

# segmentation config (its own driver, _driver_seg_convergence): the
# poly-LR state + 10x head groups + dual-head masked CE
# (reference segmentation/tool/train_cnsn.py:282-385)
SEG_CONFIG = dict(steps=50, batch=4, size=49, classes=19, base_lr=0.01,
                  wd=1e-4, aux_w=0.4, mix_prob=0.5, eval_at=(10, 25, 50),
                  arms=("jax", "pert", "mut_auxw", "mut_schedule"))

PERTURB = 1e-6  # relative init perturbation for the noise-envelope arm


def _run(which):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", JAX_ENABLE_X64="0")
    r = subprocess.run([sys.executable, os.path.abspath(__file__), which],
                       capture_output=True, text=True, timeout=5400, env=env)
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    assert line.startswith("{"), (r.stdout[-2000:], r.stderr[-2000:])
    return json.loads(line)


# ---------------------------------------------------------------------------
# calibrated checks (constants measured from the committed calibration
# run, perf/r4_convergence_allconv_cn.json / _flagship.json — see the
# "MEASURED" notes on each)
# ---------------------------------------------------------------------------

def _early_envelope(rec, arm, c, floor, ceil):
    """(1) early per-step tracking: while the perturbation envelope
    env = runmax|pert - jax| is still below `ceil` (chaos not yet
    saturated), require |arm - jax| <= max(c*env, floor) at every
    step.  Returns the per-step (err, bound) inside the window."""
    jx = np.asarray(rec["train"]["jax"])
    other = np.asarray(rec["train"][arm])
    pert = np.asarray(rec["train"]["pert"])
    env = np.maximum.accumulate(np.abs(pert - jx))
    win = env < ceil
    err = np.abs(other - jx)[win]
    bound = np.maximum(c * env[win], floor)
    return err, bound, int(win.sum())


def _late_mean_gap(rec, arm, window):
    """(2) |mean(arm) - mean(jax)| over the last `window` train steps —
    the statistic that survives chaotic per-step decorrelation."""
    jx = np.asarray(rec["train"]["jax"])[-window:]
    other = np.asarray(rec["train"][arm])[-window:]
    return abs(float(other.mean() - jx.mean()))


def _eval_gaps(rec, arm):
    """(3) per-checkpoint [|Δloss|, |Δacc|] vs the jax arm."""
    jx = np.asarray(rec["eval"]["jax"], float)
    other = np.asarray(rec["eval"][arm], float)
    assert (jx[:, 0] == other[:, 0]).all()
    return np.abs(other[:, 1:] - jx[:, 1:])      # (K, 2): loss, acc


_REC_CACHE = {}


def _rec(which):
    if which not in _REC_CACHE:
        _REC_CACHE[which] = _run(which)
    return _REC_CACHE[which]


# MEASURED (perf/r4_convergence_allconv_cn.json): torch's early
# envelope ratio 1.5 (bound 12), late-40 mean gap 0.0018 (bound 0.08 —
# mut_schedule measures 0.120), eval dloss<=0.060/dacc<=0.086 (bounds
# 0.40/0.24 — mut_momentum measures 0.92/0.29 at step 10), final-stats
# err 0.82 vs pert's own 0.83 (chaos-dominated by step 120; see
# test_allconv_cn_mutations_break_the_bounds for why stats are only
# calibration-bounded, not a mutation detector).
ALLCONV = dict(c_early=12.0, floor_early=2e-3, ceil_early=0.05,
               late_window=40, late_floor=0.02, late_c=4.0,
               eval_c=8.0, eval_floor=(0.05, 0.03), stats_c=3.0,
               stats_floor=0.05)


def test_allconv_cn_torch_tracks_120_steps():
    """120 SGD steps of AllConv+CN at f32: torch stays inside the
    calibrated reduction-noise bounds on all four statistics."""
    rec = _rec("allconv_cn")
    t = ALLCONV
    err, bound, n = _early_envelope(rec, "torch", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert n >= 10, f"early window collapsed to {n} steps"
    assert (err <= bound).all(), (err, bound)

    gap = _late_mean_gap(rec, "torch", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap <= t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)

    d = _eval_gaps(rec, "torch")
    dp = _eval_gaps(rec, "pert")
    bound = t["eval_c"] * np.maximum(dp, np.asarray(t["eval_floor"]))
    assert (d <= bound).all(), (d, bound)

    rel = rec["stats_relerr"]
    assert rel["torch_vs_jax"] <= t["stats_c"] * max(
        rel["pert_vs_jax"], t["stats_floor"]), rel


def test_allconv_cn_mutations_break_the_bounds():
    """The bounds bite: BN momentum 0.2 (train-invisible) must break
    the eval-checkpoint check, and a frozen LR schedule (the cosine
    fully decays inside the run) must break the late-window mean."""
    rec = _rec("allconv_cn")
    t = ALLCONV

    d = _eval_gaps(rec, "mut_momentum")
    dp = _eval_gaps(rec, "pert")
    bound = t["eval_c"] * np.maximum(dp, np.asarray(t["eval_floor"]))
    assert (d > bound).any(), (d, bound)
    # The momentum mutation is caught at the EARLY eval checkpoints
    # (measured dloss 0.92 at step 10 vs bound 0.40): running stats
    # converge to the (chaos-perturbed) activation moments by step 120
    # regardless of momentum, so the *final* stats tree has no
    # mutation power — measured mut_momentum final-stats err 0.34 vs
    # the pert arm's own 0.83.  The final-stats check in the tracking
    # test is therefore calibration-bounded only.

    gap = _late_mean_gap(rec, "mut_schedule", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap > t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)


# MEASURED (perf/r4_convergence_flagship.json): ResNet-50 at b8 is far
# more chaotic than AllConv at b64 — the 1e-6 perturbation amplifies
# to a 0.18 loss gap after ONE step, so the early window degenerates
# and the train evidence is the late-window mean (torch 0.035 vs pert
# 0.012, bound 0.08).  Eval CE during BN warmup spans 9 orders of
# magnitude (running stats far from converged), so eval loss compares
# on log10 (framework noise is multiplicative there: torch |dlog10|
# <= 0.37 vs pert's own 0.14-0.31); a checkpoint where the pert
# calibration arm itself is non-finite carries no information and is
# skipped.  Accuracies agree to 1.6% absolute.  Mutation arms live in
# the allconv config (same step/optimizer/schedule machinery).
FLAGSHIP = dict(late_window=30, late_floor=0.02, late_c=4.0,
                eval_log_c=8.0, eval_log_floor=0.1,
                acc_c=8.0, acc_floor=0.03, stats_c=3.0, stats_floor=0.05)


def test_flagship_torch_tracks_100_steps():
    """100 SGD steps of the flagship shape (ResNet-50 + in-network SN +
    image-space CN, the run-cnsn.sh recipe): torch stays inside the
    calibrated bounds."""
    rec = _rec("flagship")
    t = FLAGSHIP

    gap = _late_mean_gap(rec, "torch", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap <= t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)

    d = _eval_gaps(rec, "torch")
    dp = _eval_gaps(rec, "pert")
    jl = np.asarray(rec["eval"]["jax"], float)[:, 1]
    tl = np.asarray(rec["eval"]["torch"], float)[:, 1]
    pl = np.asarray(rec["eval"]["pert"], float)[:, 1]
    dlog = np.abs(np.log10(tl) - np.log10(jl))
    dlog_p = np.abs(np.log10(pl) - np.log10(jl))
    ok = np.isfinite(dlog_p)  # pert-nan checkpoints are uninformative
    assert ok.sum() >= 3, dlog_p
    assert np.isfinite(dlog[ok]).all(), (tl, jl)
    bound = t["eval_log_c"] * np.maximum(dlog_p[ok], t["eval_log_floor"])
    assert (dlog[ok] <= bound).all(), (dlog, bound)
    acc_bound = t["acc_c"] * np.maximum(dp[:, 1], t["acc_floor"])
    assert (d[:, 1] <= acc_bound).all(), (d, acc_bound)

    rel = rec["stats_relerr"]
    assert rel["torch_vs_jax"] <= t["stats_c"] * max(
        rel["pert_vs_jax"], t["stats_floor"]), rel


# MEASURED (perf/r5_convergence_augmix.json, the committed calibration
# run): with the 12·JSD + consist_wt-10 paths live, torch's early
# errors peak at 0.57x the max(8*env, 5e-3) bound over the 16-step
# pre-chaos window (mut_jsd exceeds it at 5 steps, peaking 2.8x over;
# mut_schedule at 2 steps, 3.8x over), late-30 mean gap 0.0015 (bound
# 3*max(pert 0.0022, 0.02) = 0.06; mut_schedule measures 0.097 —
# mut_jsd has NO late-mean power because the JSD term decays to ~0 as
# the model converges, so its detectors are the early envelope and the
# step-25 eval checkpoint), eval dloss <= 0.008 vs pert's 0.012 (bound
# 4*max(pert, 0.012); mut_jsd measures 0.116 at step 25, mut_schedule
# 0.298), eval dacc <= 0.062 (calibration bound only — pert's own acc
# gaps are 0 and no mutation moves accuracy beyond 0.086 in this tame
# regime), final-stats err 0.80 vs pert's own 0.47 (bound 3x; the
# schedule mutation measures 2.47, above the bound, but the margin is
# carried by the train/eval checks).
AUGMIX = dict(c_early=8.0, floor_early=5e-3, ceil_early=0.01,
              late_window=30, late_floor=0.02, late_c=3.0,
              eval_c=4.0, eval_loss_floor=0.012, acc_c=4.0, acc_floor=0.03,
              stats_c=3.0, stats_floor=0.05)


def test_augmix_jsd_torch_tracks_60_steps():
    """60 SGD steps of AllConv AugMix+JSD (3-view concat forward,
    12*JSD consistency, gated CN-JSD at consist_wt 10 — the
    cnsn-augmix.yaml recipe): torch stays inside the calibrated
    reduction-noise bounds on all four statistics."""
    rec = _rec("allconv_augmix_jsd")
    t = AUGMIX
    err, bound, n = _early_envelope(rec, "torch", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert n >= 10, f"early window collapsed to {n} steps"
    assert (err <= bound).all(), (err, bound)

    gap = _late_mean_gap(rec, "torch", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap <= t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)

    d = _eval_gaps(rec, "torch")
    dp = _eval_gaps(rec, "pert")
    loss_bound = t["eval_c"] * np.maximum(dp[:, 0], t["eval_loss_floor"])
    assert (d[:, 0] <= loss_bound).all(), (d, loss_bound)
    acc_bound = t["acc_c"] * np.maximum(dp[:, 1], t["acc_floor"])
    assert (d[:, 1] <= acc_bound).all(), (d, acc_bound)

    rel = rec["stats_relerr"]
    assert rel["torch_vs_jax"] <= t["stats_c"] * max(
        rel["pert_vs_jax"], t["stats_floor"]), rel


def test_augmix_jsd_mutations_break_the_bounds():
    """The bounds bite: halving the JSD weight (6 vs the reference's
    hardcoded 12, cifar.py:235) must break the early envelope AND the
    eval-loss checkpoints (its late-mean power is nil — the JSD term
    decays to ~0 as training converges, so a weight change leaves the
    late train loss untouched; the eval checkpoints catch what the
    trained weights absorbed).  The frozen-LR mutation must break the
    early envelope and the late-window mean."""
    rec = _rec("allconv_augmix_jsd")
    t = AUGMIX

    err, bound, _ = _early_envelope(rec, "mut_jsd", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert (err > bound).any(), (err, bound)
    d = _eval_gaps(rec, "mut_jsd")
    dp = _eval_gaps(rec, "pert")
    loss_bound = t["eval_c"] * np.maximum(dp[:, 0], t["eval_loss_floor"])
    assert (d[:, 0] > loss_bound).any(), (d, loss_bound)

    err, bound, _ = _early_envelope(rec, "mut_schedule", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert (err > bound).any(), (err, bound)
    gap = _late_mean_gap(rec, "mut_schedule", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap > t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)


# MEASURED (perf/r5_convergence_seg.json, the committed calibration
# run): the dilated-trunk regime is more chaotic than the classifiers
# (env reaches 2.7e-2 by step 10), so the early window closes at
# ceil 0.05 with 10 steps; torch's early errors peak at 0.40x the
# max(6*env, 0.01) bound (mut_auxw exceeds it at every window step,
# peaking 60x over — halving aux_weight shifts the composite loss
# directly), late-10 mean gap 0.0045 vs pert's 0.0029 (bound
# 3*max(pert, 5e-3) = 0.015; mut_schedule measures 0.063 — the frozen
# poly LR bites only in the last steps, where the real schedule has
# decayed ~30x, so the LATE window is its detector, not the early
# envelope where it peaks at just 0.33x the bound).  Eval CE during
# BN warmup is chaos-dominated (pert's own dloss reaches 1.04 at step
# 10), so eval loss compares on log10 (torch |dlog10| <= 0.22 vs
# pert's 0.078; bound 8*max(pert, 0.1)) and pixel-acc within
# 4*max(pert, 0.03) — calibration bounds only, like the flagship.
# Final running stats are fully chaos-dominated at 50 steps (pert's
# own relerr 3.39 vs torch's 3.43): calibration bound only.
SEG = dict(c_early=6.0, floor_early=0.01, ceil_early=0.05,
           late_window=10, late_floor=5e-3, late_c=3.0,
           eval_log_c=8.0, eval_log_floor=0.1, acc_c=4.0, acc_floor=0.03,
           stats_c=3.0, stats_floor=0.05)


def test_seg_torch_tracks_50_steps():
    """50 SGD steps of the segmentation recipe (dilated CNSN trunk +
    dual FCN heads, masked CE + aux_weight*CE_aux, poly LR with 10x
    head groups — train_cnsn.py:282-385): torch stays inside the
    calibrated reduction-noise bounds."""
    rec = _rec("seg_fcn_cnsn")
    t = SEG
    err, bound, n = _early_envelope(rec, "torch", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert n >= 10, f"early window collapsed to {n} steps"
    assert (err <= bound).all(), (err, bound)

    gap = _late_mean_gap(rec, "torch", t["late_window"])
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    assert gap <= t["late_c"] * max(pert_gap, t["late_floor"]), (
        gap, pert_gap)

    d = _eval_gaps(rec, "torch")
    dp = _eval_gaps(rec, "pert")
    jl = np.asarray(rec["eval"]["jax"], float)[:, 1]
    tl = np.asarray(rec["eval"]["torch"], float)[:, 1]
    pl = np.asarray(rec["eval"]["pert"], float)[:, 1]
    dlog = np.abs(np.log10(tl) - np.log10(jl))
    dlog_p = np.abs(np.log10(pl) - np.log10(jl))
    assert np.isfinite(dlog).all(), (tl, jl)
    bound = t["eval_log_c"] * np.maximum(dlog_p, t["eval_log_floor"])
    assert (dlog <= bound).all(), (dlog, bound)
    acc_bound = t["acc_c"] * np.maximum(dp[:, 1], t["acc_floor"])
    assert (d[:, 1] <= acc_bound).all(), (d, acc_bound)

    rel = rec["stats_relerr"]
    assert rel["torch_vs_jax"] <= t["stats_c"] * max(
        rel["pert_vs_jax"], t["stats_floor"]), rel


def test_seg_mutations_break_the_bounds():
    """The bounds bite: aux_weight 0.2 (vs the recipe's 0.4,
    train_cnsn.py config) must break the early envelope (it shifts
    the composite loss directly, 60x over the bound) and the
    late-window mean; the frozen poly schedule (power 0) must break
    the late-window mean — by the last 10 steps the real poly LR has
    decayed ~30x, so freezing it measures 14x the tracking arm's
    gap."""
    rec = _rec("seg_fcn_cnsn")
    t = SEG

    err, bound, _ = _early_envelope(rec, "mut_auxw", t["c_early"],
                                    t["floor_early"], t["ceil_early"])
    assert (err > bound).any(), (err, bound)
    pert_gap = _late_mean_gap(rec, "pert", t["late_window"])
    late_bound = t["late_c"] * max(pert_gap, t["late_floor"])
    assert _late_mean_gap(rec, "mut_auxw", t["late_window"]) > late_bound
    assert _late_mean_gap(rec, "mut_schedule", t["late_window"]) > late_bound


# ---------------------------------------------------------------------------
# subprocess driver
# ---------------------------------------------------------------------------

def _driver(which):
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

    import cnsn_tpu.models.allconv as allconv_mod
    from cnsn_tpu.models import build_model
    from cnsn_tpu.ops import crossnorm as cn_mod
    from cnsn_tpu.train import (StepFns, cosine_lr, create_train_state,
                                make_sgd, sample_cn_mask)
    from cnsn_tpu.utils.torch_import import allconv_key_map, convert_state_dict

    (steps_n, batch, size, classes, lr, wd, total, nesterov,
     eval_at, jax_arms) = CONFIGS[which]
    # manual smoke runs only (tests never set this)
    steps_n = int(os.environ.get("CNSN_CONV_STEPS", steps_n))

    # ----- pinned randomness shared by every arm -----------------------
    # pairing permutation: roll-1 on both sides (reference randperm,
    # models/cnsn.py:62; ours ops/crossnorm.py grouped_permutation)
    roll = lambda n: (np.arange(n) + 1) % n
    cn_mod.grouped_permutation = (
        lambda key, n, num_groups=1: jnp.asarray(roll(n)))
    torch.randperm = lambda n, **kw: torch.from_numpy(roll(n))

    # host Bernoulli(cn_prob=0.5) CN gate (cifar.py:127-128 /
    # imagenet.py:214) — one shared draw sequence
    gates = np.random.RandomState(13).rand(steps_n) < 0.5

    # per-step active-site draws, replayed from the REAL jax RNG stream
    # the cn step uses (steps.py _cn: k_mask = split(key_i)[0]), so the
    # torch arm follows the exact site sequence the jax arm samples
    allconv = which == "allconv_cn"
    augmix = which == "allconv_augmix_jsd"
    if allconv:
        cn_num = 9
        sites = []
        for i in range(steps_n):
            k_mask = jax.random.split(jax.random.key(i))[0]
            m = np.asarray(sample_cn_mask(k_mask, cn_num, 1))
            sites.append(int(np.argmax(m)))
    if augmix:
        # steps.py _augmix_common with_cn: split(rng, 5) →
        # (k1m, k1f, k2m, k2f, kc); masks from k1m / k2m
        cn_num = 9
        sites1, sites2 = [], []
        for i in range(steps_n):
            ks = jax.random.split(jax.random.key(i), 5)
            sites1.append(int(np.argmax(
                np.asarray(sample_cn_mask(ks[0], cn_num, 1)))))
            sites2.append(int(np.argmax(
                np.asarray(sample_cn_mask(ks[2], cn_num, 1)))))

    # ----- synthetic data: class-mean blobs (learnable) ----------------
    data_rng = np.random.RandomState(7)
    mu = (data_rng.randn(classes, 1, 1, 3) * 1.2).astype(np.float32)

    def make(rng, n):
        y = rng.randint(0, classes, n)
        x = mu[y] + 0.7 * rng.randn(n, size, size, 3)
        return x.astype(np.float32), y.astype(np.int64)

    def make3(rng, n):
        """3-view batch: (clean, aug1, aug2) share the class means but
        carry independent noise — augmented-view statistics without
        PIL (the AugMix op chain itself is pinned by the data tests;
        here the JSD/consist math is the subject)."""
        y = rng.randint(0, classes, n)
        views = [mu[y] + 0.7 * rng.randn(n, size, size, 3)
                 for _ in range(3)]
        return np.stack(views).astype(np.float32), y.astype(np.int64)

    batches = [(make3 if augmix else make)(data_rng, batch)
               for _ in range(steps_n)]
    eval_rng = np.random.RandomState(11)
    eval_x, eval_y = make(eval_rng, 256)

    # ----- torch init (imported by every jax arm) ----------------------
    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        if allconv or augmix:
            from models.cifar.allconv_cnsn import AllConvNet as TorchAllConv
            t = TorchAllConv(classes, active_num=1, pos=1, beta=1.0,
                             crop="neither", cnsn_type="cn")
            for m in t.modules():
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0
            key_map = allconv_key_map(1)
        else:
            from models.imagenet.resnet_cnsn import resnet50 as torch_r50
            cfg = types.SimpleNamespace(active_num=1, pos="post", beta=1.0,
                                        crop="neither", cnsn_type="sn")
            t = torch_r50(cfg)
            t.avgpool = torch.nn.AdaptiveAvgPool2d(1)  # 64² inputs
            t.fc = torch.nn.Linear(2048, classes)
            torch.manual_seed(1)
            torch.nn.init.normal_(t.fc.weight, 0, 0.01)
            torch.nn.init.zeros_(t.fc.bias)
            key_map = None
    init_sd = {k: v.detach().clone() for k, v in t.state_dict().items()}

    @contextlib.contextmanager
    def bn_momentum(momentum):
        """Sabotage arm: silent BN-momentum drift.  allconv.py resolves
        the BatchNorm name from its module globals at *trace* time, so
        the patch must stay installed for the whole arm (init + every
        jitted apply), not just construction.  Flax runs its dataclass
        transform in __init_subclass__, so a plain subclass overriding
        the field default suffices; same class name keeps the param
        tree layout identical."""
        cls = allconv_mod.BatchNorm
        if momentum is not None:
            allconv_mod.BatchNorm = type(
                cls.__name__, (cls,),
                {"__annotations__": {"momentum": float},
                 "momentum": momentum})
        try:
            yield
        finally:
            allconv_mod.BatchNorm = cls

    def build_jax():
        if allconv or augmix:
            return build_model("allconv", num_classes=classes, pos=1,
                               beta=1.0, crop="neither", cnsn_type="cn",
                               drop_rate=0.0)
        return build_model("resnet50", num_classes=classes, pos="post",
                           beta=1.0, crop="neither", cnsn_type="sn")

    def run_jax_arm(momentum=None, frozen_lr=False, perturb=0.0,
                    jsd_wt=12.0):
        with bn_momentum(momentum):
            return _run_jax_arm(frozen_lr=frozen_lr, perturb=perturb,
                                jsd_wt=jsd_wt)

    def _run_jax_arm(frozen_lr=False, perturb=0.0, jsd_wt=12.0):
        model = build_jax()
        x0 = jnp.asarray(batches[0][0][0] if augmix else batches[0][0])
        variables = model.init({"params": jax.random.key(0)}, x0, False, None)
        params, stats, missing = convert_state_dict(
            init_sd, dict(variables["params"]),
            dict(variables.get("batch_stats", {})), strict=True,
            key_map=key_map)
        assert not missing, missing
        if perturb:
            params = jax.tree.map(
                lambda p: (np.asarray(p) * (1.0 + perturb)).astype(p.dtype),
                params)
        sched = (lambda s: lr) if frozen_lr else cosine_lr(lr, total)
        tx = make_sgd(sched, weight_decay=wd, nesterov=nesterov)
        state = create_train_state(model, jax.random.key(0), x0.shape, tx)
        state = state.replace(params=params, batch_stats=stats,
                              opt_state=tx.init(params))
        sfns = StepFns(model, active_num=1, image_crop="neither",
                       image_beta=1.0, jsd_wt=jsd_wt,
                       consist_wt=10.0 if augmix else 0.0)
        if augmix:
            gated_fn, off_fn = sfns.augmix_cn, sfns.augmix
        else:
            gated_fn = sfns.cn if allconv else sfns.cn_image
            off_fn = sfns.plain
        losses, evals = [], []
        for i, (x, y) in enumerate(batches):
            fn = gated_fn if gates[i] else off_fn
            state, metrics = fn(state, jnp.asarray(x), jnp.asarray(y),
                                jax.random.key(i))
            losses.append(float(metrics["loss"]))
            if (i + 1) in eval_at:
                tot_l = tot_c = tot_n = 0.0
                for lo in range(0, len(eval_x), 64):
                    m = sfns.eval_sum(state, jnp.asarray(eval_x[lo:lo + 64]),
                                      jnp.asarray(eval_y[lo:lo + 64]))
                    n = float(m["n"])
                    tot_l += float(m["loss"]) * n
                    tot_c += float(m["correct"])
                    tot_n += n
                evals.append([i + 1, tot_l / tot_n, tot_c / tot_n])
        return losses, evals, jax.tree.map(np.asarray, state.batch_stats)

    # ----- run the jax arms --------------------------------------------
    arms_train, arms_eval, arms_stats = {}, {}, {}
    arm_kw = {"jax": {}, "pert": {"perturb": PERTURB},
              "mut_momentum": {"momentum": 0.2},
              "mut_schedule": {"frozen_lr": True},
              "mut_jsd": {"jsd_wt": 6.0}}
    for arm in jax_arms:
        import time
        t0 = time.time()
        arms_train[arm], arms_eval[arm], arms_stats[arm] = run_jax_arm(
            **arm_kw[arm])
        print(f"arm {arm}: {time.time() - t0:.0f}s", file=sys.stderr)

    # ----- torch arm (reference loops: cifar.py:117-145 train_cn with
    # the pinned site draw; imagenet.py:195-250 train_cn_image) --------
    F = torch.nn.functional
    import models.cnsn as ref_cnsn
    opt = torch.optim.SGD(t.parameters(), lr, momentum=0.9,
                          weight_decay=wd, nesterov=nesterov)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=lambda step: 1e-6 / lr + (1 - 1e-6 / lr) * 0.5 * (
            1 + np.cos(step / total * np.pi)))
    t.train()
    t_losses, t_evals = [], []
    for i, (x, y) in enumerate(batches):
        yt = torch.from_numpy(y)
        if augmix:
            # reference train_cn_augmix (cifar.py:219-261): 3B-concat
            # forward, CE(clean) + 12*JSD; gated: two armed CN forwards
            # on the CLEAN view, + consist_wt * JSD(p_clean, p_cn1, p_cn2)
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
            if gates[i]:
                x_clean = torch.from_numpy(x[0].transpose(0, 3, 1, 2))
                pcn = [p[0]]
                for s in (sites1[i], sites2[i]):
                    t.cn_modules[s].active = True  # self-resets on use
                    pcn.append(F.softmax(t(x_clean), dim=1))
                cn_mix = torch.clamp(
                    (pcn[0] + pcn[1] + pcn[2]) / 3., 1e-7, 1).log()
                loss = loss + 10.0 * (
                    F.kl_div(cn_mix, pcn[0], reduction="batchmean")
                    + F.kl_div(cn_mix, pcn[1], reduction="batchmean")
                    + F.kl_div(cn_mix, pcn[2], reduction="batchmean")) / 3.
        else:
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            if gates[i]:
                if allconv:
                    t.cn_modules[sites[i]].active = True
                else:
                    xt = ref_cnsn.cn_op_2ins_space_chan(xt, crop="neither",
                                                        beta=1)
            loss = F.cross_entropy(t(xt), yt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        t_losses.append(loss.item())
        if (i + 1) in eval_at:
            t.eval()
            with torch.no_grad():
                tot_l = tot_c = 0.0
                for lo in range(0, len(eval_x), 64):
                    xe = torch.from_numpy(
                        eval_x[lo:lo + 64].transpose(0, 3, 1, 2))
                    ye = torch.from_numpy(eval_y[lo:lo + 64])
                    lg = t(xe)
                    tot_l += F.cross_entropy(lg, ye, reduction="sum").item()
                    tot_c += (lg.argmax(1) == ye).sum().item()
                t_evals.append([i + 1, tot_l / len(eval_x),
                                tot_c / len(eval_x)])
            t.train()
    arms_train["torch"], arms_eval["torch"] = t_losses, t_evals

    # ----- final running-stat trees vs the jax arm ---------------------
    model = build_jax()
    x0 = jnp.asarray(batches[0][0][0] if augmix else batches[0][0])
    variables = model.init({"params": jax.random.key(0)}, x0, False, None)
    _, t_stats, _ = convert_state_dict(
        t.state_dict(), dict(variables["params"]),
        dict(variables.get("batch_stats", {})), strict=True,
        key_map=key_map, dtype=np.float64)

    def stats_err(tree_a, tree_b):
        """max over leaves of max|a-b| / leaf RMS scale — per-element
        relative error blows up on near-zero running means, so
        normalize by the leaf's own magnitude scale instead."""
        out = 0.0
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            scale = max(np.sqrt(np.mean(b * b)), 1e-3)
            out = max(out, float(np.max(np.abs(a - b))) / scale)
        return out

    rel = {"torch_vs_jax": stats_err(arms_stats["jax"], t_stats)}
    for arm in jax_arms:
        if arm != "jax":
            rel[arm + "_vs_jax"] = stats_err(arms_stats[arm],
                                             arms_stats["jax"])

    print(json.dumps({"train": arms_train, "eval": arms_eval,
                      "stats_relerr": rel}))


def _driver_seg_convergence():
    """f32 convergence lockstep for the segmentation recipe
    (reference segmentation/tool/train_cnsn.py:282-385): dilated
    CNSN trunk (cnsn_type=cnsn, cn_pos=post, crop=style) + dual FCN
    heads, masked CE + aux_weight*CE_aux, SGD momentum 0.9 with the
    poly schedule and 10x head groups — all through the PRODUCT path
    (SegStepFns / make_seg_optimizer).  Arms: jax / pert (1e-6 init
    perturbation) / mut_auxw (0.2 instead of 0.4) / mut_schedule
    (poly power 0 = frozen LR; the real poly decays ~30x inside the
    run) + the torch reference loop."""
    import contextlib
    import io
    import time

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seg_ref = os.path.join(REFERENCE, "segmentation")
    for p in (repo, seg_ref):
        if p not in sys.path:
            sys.path.insert(0, p)
    from cnsn_tpu.segmentation import (SegStepFns, SegTrainState, fcn_cnsn,
                                       make_seg_optimizer)
    from cnsn_tpu.train.steps import sample_cn_mask
    from cnsn_tpu.utils.torch_import import convert_state_dict

    C = SEG_CONFIG
    steps_n, batch, size, classes = (C["steps"], C["batch"], C["size"],
                                     C["classes"])
    # manual smoke runs only (tests never set this)
    steps_n = int(os.environ.get("CNSN_CONV_STEPS", steps_n))
    base_lr, wd, aux_w, eval_at = (C["base_lr"], C["wd"], C["aux_w"],
                                   C["eval_at"])

    # ----- pinned randomness (the f64 seg lockstep's recipe) -----------
    import model.cnsn as seg_ref_cnsn
    from cnsn_tpu.ops import bbox as bbox_mod
    from cnsn_tpu.ops import crossnorm as cn_mod
    perm = lambda n: (np.arange(n) + 1) % n
    cn_mod.grouped_permutation = (
        lambda key, n, num_groups=1: jnp.asarray(perm(n)))
    torch.randperm = lambda n, **kw: torch.from_numpy(perm(n))
    # one style box valid on both OS8 scales of 49² inputs (13² and 7²)
    box = (1, 5, 0, 4)
    bbox_mod.sample_bbox = lambda key, h, w, **kw: box
    cn_mod.sample_bbox = bbox_mod.sample_bbox
    seg_ref_cnsn.cn_rand_bbox = (
        lambda sz, beta, bbx_thres: (box[0], box[2], box[1], box[3]))

    # host mix_prob gate + per-step active-site replay from the REAL
    # jax stream SegStepFns.aug consumes (k_mask = split(key_i)[0])
    gates = np.random.RandomState(13).rand(steps_n) < C["mix_prob"]
    cn_num = 16
    sites = []
    for i in range(steps_n):
        k_mask = jax.random.split(jax.random.key(i))[0]
        sites.append(int(np.argmax(
            np.asarray(sample_cn_mask(k_mask, cn_num, 1)))))

    # ----- learnable synthetic seg data: blocky label maps, pixels =
    # class mean + noise; top rows are the ignore band ---------------
    data_rng = np.random.RandomState(7)
    mu = (data_rng.randn(classes, 3) * 1.2).astype(np.float32)

    def make(rng, n):
        yc = rng.randint(0, classes, (n, 7, 7))
        y = np.kron(yc, np.ones((7, 7), np.int64))[:, :size, :size]
        x = mu[y] + 0.7 * rng.randn(n, size, size, 3).astype(np.float32)
        y[:, :5] = 255
        return x.astype(np.float32), y

    batches = [make(data_rng, batch) for _ in range(steps_n)]
    eval_rng = np.random.RandomState(11)
    eval_batches = [make(eval_rng, batch) for _ in range(2)]

    # ----- torch reference model (init imported by every jax arm) ------
    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()):
        import model.cnsn_resnet as cnsn_resnet
        trunk = cnsn_resnet.resnet50(
            pretrained=False, SN=True,
            replace_stride_with_dilation=[False, True, True],
            pos="residual", cn_pos="post", beta=1.0, block_idxs="1_2_3_4",
            crop="style", cnsn_type="cnsn", active_num=1)

    def head(cin):
        torch.manual_seed(cin)
        return torch.nn.Sequential(
            torch.nn.Conv2d(cin, cin // 4, 3, padding=1, bias=False),
            torch.nn.BatchNorm2d(cin // 4),
            torch.nn.ReLU(),
            torch.nn.Dropout(0.0),
            torch.nn.Conv2d(cin // 4, classes, 1))

    t_cls, t_aux = head(2048), head(1024)
    init_trunk = {k: v.detach().clone() for k, v in trunk.state_dict().items()
                  if not k.startswith("fc.")}
    init_cls = {k: v.detach().clone() for k, v in t_cls.state_dict().items()}
    init_aux = {k: v.detach().clone() for k, v in t_aux.state_dict().items()}

    f = fcn_cnsn(classes=classes, block_idxs="1_2_3_4", pos="residual",
                 cn_pos="post", cnsn_type="cnsn", crop="style", dropout=0.0)

    def run_jax_arm(aux_weight=aux_w, power=0.9, perturb=0.0):
        x0 = jnp.asarray(batches[0][0])
        variables = f.init({"params": jax.random.key(0)}, x0, False,
                           None, None)
        params = dict(variables["params"])
        stats = dict(variables["batch_stats"])
        params, stats, missing = convert_state_dict(
            init_trunk, params, stats, strict=True, prefix=("backbone",))
        assert not missing, missing
        head_map = {"0": "conv1", "1": "bn1", "4": "conv2"}
        for sd, name in ((init_cls, "classifier"),
                         (init_aux, "aux_classifier")):
            params, stats, missing = convert_state_dict(
                sd, params, stats, strict=True, prefix=(name,),
                key_map=head_map)
            assert not missing, missing
        if perturb:
            params = jax.tree.map(
                lambda p: (np.asarray(p) * (1.0 + perturb)).astype(p.dtype),
                params)
        tx = make_seg_optimizer(params, base_lr, steps_n, power, 0.9, wd)
        state = SegTrainState.create(apply_fn=f.apply, params=params,
                                     batch_stats=stats, tx=tx)
        sfns = SegStepFns(f, num_classes=classes, active_num=1,
                          aux_weight=aux_weight)
        losses, evals = [], []
        for i, (x, y) in enumerate(batches):
            fn = sfns.aug if gates[i] else sfns.plain
            state, m = fn(state, jnp.asarray(x), jnp.asarray(y),
                          jax.random.key(i))
            losses.append(float(m["loss"]))
            if (i + 1) in eval_at:
                tl = ti = tt = tn = 0.0
                for xe, ye in eval_batches:
                    em = sfns.eval_step(state, jnp.asarray(xe),
                                        jnp.asarray(ye))
                    tl += float(em["loss"])
                    ti += float(np.asarray(em["intersection"]).sum())
                    tt += float(np.asarray(em["target"]).sum())
                    tn += 1
                evals.append([i + 1, tl / tn, ti / max(tt, 1)])
        return losses, evals, jax.tree.map(np.asarray, state.batch_stats)

    arms_train, arms_eval, arms_stats = {}, {}, {}
    arm_kw = {"jax": {}, "pert": {"perturb": PERTURB},
              "mut_auxw": {"aux_weight": 0.2},
              "mut_schedule": {"power": 0.0}}
    for arm in C["arms"]:
        t0 = time.time()
        arms_train[arm], arms_eval[arm], arms_stats[arm] = run_jax_arm(
            **arm_kw[arm])
        print(f"arm {arm}: {time.time() - t0:.0f}s", file=sys.stderr)

    # ----- torch reference loop (train_cnsn.py:300-380) ----------------
    F = torch.nn.functional
    for m in (trunk, t_cls, t_aux):
        m.train()
    heads_params = list(t_cls.parameters()) + list(t_aux.parameters())
    opt = torch.optim.SGD(
        [{"params": list(trunk.parameters()), "lr": base_lr},
         {"params": heads_params, "lr": base_lr * 10.0}],
        lr=base_lr, momentum=0.9, weight_decay=wd)
    up = lambda z: F.interpolate(z, size=(size, size), mode="bilinear",
                                 align_corners=False)

    def t_eval():
        for m in (trunk, t_cls, t_aux):
            m.eval()
        tl = ti = tt = tn = 0.0
        with torch.no_grad():
            for xe, ye in eval_batches:
                xt = torch.from_numpy(xe.transpose(0, 3, 1, 2))
                yt = torch.from_numpy(ye)
                logits = up(t_cls(trunk(xt)["out"]))
                tl += F.cross_entropy(logits, yt, ignore_index=255).item()
                pred = logits.argmax(1)
                valid = yt != 255
                ti += (pred[valid] == yt[valid]).sum().item()
                tt += valid.sum().item()
                tn += 1
        for m in (trunk, t_cls, t_aux):
            m.train()
        return tl / tn, ti / max(tt, 1)

    t_losses, t_evals = [], []
    for i, (x, y) in enumerate(batches):
        if gates[i]:
            trunk.cn_modules[sites[i]].active = True  # self-resets
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        yt = torch.from_numpy(y)
        feats = trunk(xt)
        loss = (F.cross_entropy(up(t_cls(feats["out"])), yt,
                                ignore_index=255)
                + aux_w * F.cross_entropy(up(t_aux(feats["aux"])), yt,
                                          ignore_index=255))
        opt.zero_grad()
        loss.backward()
        opt.step()
        # poly(i+1) assigned AFTER step(), effective next update
        # (train_cnsn.py:319-349)
        lr_i = base_lr * (1 - float(i + 1) / steps_n) ** 0.9
        opt.param_groups[0]["lr"] = lr_i
        opt.param_groups[1]["lr"] = lr_i * 10.0
        t_losses.append(loss.item())
        if (i + 1) in eval_at:
            el, ea = t_eval()
            t_evals.append([i + 1, el, ea])
    arms_train["torch"], arms_eval["torch"] = t_losses, t_evals

    # ----- final running-stat trees vs the jax arm ---------------------
    variables = f.init({"params": jax.random.key(0)},
                       jnp.asarray(batches[0][0]), False, None, None)
    params0 = dict(variables["params"])
    stats0 = dict(variables["batch_stats"])
    sd = {k: v for k, v in trunk.state_dict().items()
          if not k.startswith("fc.")}
    _, t_stats, _ = convert_state_dict(sd, params0, stats0, strict=True,
                                       prefix=("backbone",),
                                       dtype=np.float64)
    head_map = {"0": "conv1", "1": "bn1", "4": "conv2"}
    for tm, name in ((t_cls, "classifier"), (t_aux, "aux_classifier")):
        _, t_stats, _ = convert_state_dict(
            tm.state_dict(), params0, t_stats, strict=True, prefix=(name,),
            key_map=head_map, dtype=np.float64)

    def stats_err(tree_a, tree_b):
        out = 0.0
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            scale = max(np.sqrt(np.mean(b * b)), 1e-3)
            out = max(out, float(np.max(np.abs(a - b))) / scale)
        return out

    rel = {"torch_vs_jax": stats_err(arms_stats["jax"], t_stats)}
    for arm in C["arms"]:
        if arm != "jax":
            rel[arm + "_vs_jax"] = stats_err(arms_stats[arm],
                                             arms_stats["jax"])

    print(json.dumps({"train": arms_train, "eval": arms_eval,
                      "stats_relerr": rel}))


if __name__ == "__main__":
    if sys.argv[1] == "seg_fcn_cnsn":
        _driver_seg_convergence()
    else:
        _driver(sys.argv[1])
