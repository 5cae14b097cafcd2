"""Wave 3: ghost-BN stats subsampling probes.  Appends to
perf/r2_matrix3.jsonl."""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r2_matrix3.jsonl")

MATRIX = [
    ("cnsn_b128_bns32", {"CNSN_BN_SAMPLE": "32"}),
    ("plain_b128_bns32", {"BENCH_CNSN": "none", "CNSN_BN_SAMPLE": "32"}),
    ("cnsn_b128_bns64", {"CNSN_BN_SAMPLE": "64"}),
    ("cnsn_b256_bns32", {"BENCH_BATCH": "256", "CNSN_BN_SAMPLE": "32"}),
]

def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for tag, overrides in MATRIX:
        env = dict(os.environ); env.update(overrides)
        env.setdefault("BENCH_ITERS", "20")
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               env=env, capture_output=True, text=True, timeout=1500)
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
