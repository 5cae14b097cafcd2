"""Extract calibration quantities from a convergence record.

Usage: python scripts/convergence_calibrate.py perf/r5_convergence_X.json

Prints, for every non-jax arm in the record, the four statistics the
bound-asserting tests in tests/test_convergence.py compare:
  (1) early-envelope ratio: max over the pre-chaos window of
      |arm - jax| / max(env, 2e-3) where env = runmax|pert - jax|
      (reported at several window ceilings so the test's ceil_early
      can be chosen where the window is still >= 10 steps).  NOTE:
      indicative only — the tests bound err <= max(c*env, floor),
      which is TIGHTER than c*max(env, floor) wherever env is below
      floor/c, so verify chosen (c, floor) by evaluating the test
      bound directly against every arm (the augmix calibration hit
      exactly this: a 2.9e-3 torch error at a sub-floor-env step);
  (2) late-window mean-loss gap |mean(arm) - mean(jax)| (vs the pert
      arm's own gap, the calibration unit);
  (3) per-checkpoint eval |dloss| / |dacc| (and log10 loss gaps, the
      flagship-style statistic for BN-warmup regimes);
  (4) final running-stat tree relative error (stats_relerr).

This is the measurement step of the VERDICT-r3 methodology: the test
constants are chosen at ~4-10x the tracking arm's measured values and
must sit well BELOW the mutation arms' measured values (the bounds
bite).  See tests/test_convergence.py for the committed constants.
"""
import json
import sys

import numpy as np


def main(path):
    rec = json.load(open(path))
    arms = [a for a in rec["train"] if a != "jax"]
    jx = np.asarray(rec["train"]["jax"], float)
    pert = np.asarray(rec["train"]["pert"], float)
    env = np.maximum.accumulate(np.abs(pert - jx))
    n = len(jx)
    print(f"record {path}: {n} steps, arms {arms}")
    print(f"envelope: start {env[0]:.2e}, step10 {env[min(9, n-1)]:.2e}, "
          f"final {env[-1]:.2e}")

    for ceil in (0.01, 0.05, 0.1, 0.5):
        win = env < ceil
        print(f"\n-- early window (env < {ceil}): {int(win.sum())} steps")
        if win.sum() == 0:
            continue
        for arm in arms:
            err = np.abs(np.asarray(rec["train"][arm], float) - jx)[win]
            ratio = err / np.maximum(env[win], 2e-3)
            print(f"   {arm:14s} max|d|={err.max():.4f} "
                  f"max ratio={ratio.max():.2f}")

    for wfrac in (3, 2):
        w = n // wfrac
        print(f"\n-- late-{w} mean gap")
        for arm in arms:
            g = abs(np.asarray(rec["train"][arm], float)[-w:].mean()
                    - jx[-w:].mean())
            print(f"   {arm:14s} {g:.4f}")

    print("\n-- eval checkpoints [step, loss, acc]")
    je = np.asarray(rec["eval"]["jax"], float)
    for arm in arms:
        ae = np.asarray(rec["eval"][arm], float)
        dl = np.abs(ae[:, 1] - je[:, 1])
        da = np.abs(ae[:, 2] - je[:, 2])
        dlog = np.abs(np.log10(np.maximum(ae[:, 1], 1e-30))
                      - np.log10(np.maximum(je[:, 1], 1e-30)))
        print(f"   {arm:14s} dloss={np.array2string(dl, precision=3)} "
              f"dacc={np.array2string(da, precision=3)} "
              f"dlog10={np.array2string(dlog, precision=3)}")

    print("\n-- stats_relerr")
    for k, v in rec["stats_relerr"].items():
        print(f"   {k:22s} {v:.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
