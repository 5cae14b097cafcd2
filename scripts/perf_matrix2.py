"""Round-2 throughput campaign, wave 2: shifted-BN default, s2d stem,
one-pass instance stats, XLA flag probes.  Appends to
perf/r2_matrix2.jsonl; one subprocess per config.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r2_matrix2.jsonl")

MATRIX = [
    # shifted BN is now the default — headline configs first
    ("cnsn_b128_shifted", {}),
    ("plain_b128_shifted", {"BENCH_CNSN": "none"}),
    # s2d stem on top of shifted
    ("cnsn_b128_s2d", {"BENCH_STEM": "s2d"}),
    ("plain_b128_s2d", {"BENCH_CNSN": "none", "BENCH_STEM": "s2d"}),
    # one-pass instance stats for the CNSN sites
    ("cnsn_b128_stats1", {"CNSN_STATS_VAR": "one"}),
    ("cnsn_b128_s2d_stats1", {"BENCH_STEM": "s2d", "CNSN_STATS_VAR": "one"}),
    # batch scaling recheck with the cheaper BN
    ("cnsn_b256_shifted", {"BENCH_BATCH": "256"}),
    ("cnsn_b64_shifted", {"BENCH_BATCH": "64"}),
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
