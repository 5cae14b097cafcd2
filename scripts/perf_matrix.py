"""Round-2 throughput campaign: run a matrix of bench.py configs on the
real chip sequentially, appending one JSON line per config to
perf/r2_matrix.jsonl.

Each config is a subprocess (clean XLA flag state); the persistent
compilation cache in bench.py makes repeats cheap.  Expect ~3-8 min of
remote compile per *new* program.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r2_matrix.jsonl")

LHS = "--xla_tpu_enable_latency_hiding_scheduler=true"

MATRIX = [
    # (tag, env overrides)
    ("cnsn_b128", {}),
    ("plain_b128", {"BENCH_CNSN": "none"}),
    ("plain_b256", {"BENCH_CNSN": "none", "BENCH_BATCH": "256"}),
    ("plain_b256_remat", {"BENCH_CNSN": "none", "BENCH_BATCH": "256",
                          "BENCH_REMAT": "1"}),
    ("plain_b512_remat", {"BENCH_CNSN": "none", "BENCH_BATCH": "512",
                          "BENCH_REMAT": "1"}),
    ("cnsn_b256_remat", {"BENCH_BATCH": "256", "BENCH_REMAT": "1"}),
    ("plain_b128_lhs", {"BENCH_CNSN": "none", "XLA_FLAGS": LHS}),
    ("cnsn_b128_lhs", {"XLA_FLAGS": LHS}),
    # A/B: cost of the torch-parity two-pass BN variance (default)
    # vs the old single-pass form
    ("cnsn_b128_bnonepass", {"CNSN_BN_VAR": "one"}),
]


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    only = sys.argv[1:] or None
    for tag, overrides in MATRIX:
        if only and tag not in only:
            continue
        env = dict(os.environ)
        env.update(overrides)
        env.setdefault("BENCH_ITERS", "20")
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=1500)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            rec = json.loads(line) if line.startswith("{") else {
                "error": (r.stderr or r.stdout)[-800:]}
        except subprocess.TimeoutExpired:
            rec = {"error": "timeout"}
        except Exception as e:  # noqa: BLE001
            rec = {"error": repr(e)}
        rec.update(tag=tag, wall_s=round(time.time() - t0, 1),
                   overrides=overrides)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
