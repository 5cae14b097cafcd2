"""Round-3 wave 1: 3x3 conv backward lowering A/B on the flagship step.

Variants of CNSN_CONV3X3 (ops/convdot.py): jax autodiff baseline vs
wgrad-as-tap-dots, dgrad-as-flipped-forward-conv, and both.  BENCH_CN_PROB=1
pins the cn_image program so each variant costs one remote compile.
Appends to perf/r3_conv3x3.jsonl.
"""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r3_conv3x3.jsonl")

MATRIX = [
    ("flagship_conv_base", {"CNSN_CONV3X3": "conv"}),
    ("flagship_conv_dot", {"CNSN_CONV3X3": "dot"}),
    ("flagship_conv_wgrad", {"CNSN_CONV3X3": "wgrad"}),
    ("flagship_conv_dgrad", {"CNSN_CONV3X3": "dgrad"}),
]
if os.environ.get("CONV3X3_WAVE") == "pallas":
    # wave 2: implicit-GEMM Pallas wgrad (ops/pallas/conv_wgrad.py)
    MATRIX = [("flagship_conv_pallas", {"CNSN_CONV3X3": "pallas"})]
if os.environ.get("CONV3X3_WAVE") == "tiled":
    # round-5: batch-tiled kernel, shape-gated to the measured-win
    # class (layer4-class planes; wgrad3x3_tiled_wins) — same-session
    # base for a clean delta
    OUT = os.path.join(REPO, "perf", "r5_wgrad_tiled_e2e.jsonl")
    MATRIX = [
        ("flagship_conv_base_r5", {"CNSN_CONV3X3": "conv"}),
        ("flagship_conv_pallas_tiled", {"CNSN_CONV3X3": "pallas_tiled"}),
    ]

def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for tag, overrides in MATRIX:
        env = dict(os.environ); env.update(overrides)
        env.setdefault("BENCH_ITERS", "40")
        env.setdefault("BENCH_CN_PROB", "1")
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               env=env, capture_output=True, text=True, timeout=2400)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            rec = json.loads(line) if line.startswith("{") else {"error": (r.stderr or r.stdout)[-600:]}
        except Exception as e:
            rec = {"error": repr(e)}
        rec.update(tag=tag, wall_s=round(time.time() - t0, 1), overrides=overrides)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

if __name__ == "__main__":
    main()
