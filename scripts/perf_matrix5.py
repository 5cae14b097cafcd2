"""Wave 7: s2d-default baseline re-measure + Pallas BN-stats A/B on
both recipes.  Appends to perf/r2_matrix5.jsonl."""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r2_matrix5.jsonl")

MATRIX = [
    ("flagship_s2d_bnpl", {"CNSN_BN_PALLAS": "1"}),
    ("innet_s2d_bnpl", {"BENCH_RECIPE": "innet", "CNSN_BN_PALLAS": "1"}),
    ("plain_s2d_bnpl", {"BENCH_RECIPE": "innet", "BENCH_CNSN": "none",
                        "CNSN_BN_PALLAS": "1"}),
    ("plain_s2d", {"BENCH_RECIPE": "innet", "BENCH_CNSN": "none"}),
    ("flagship_s2d_inspl", {"CNSN_INS_PALLAS": "1"}),
    ("flagship_s2d_bn_ins", {"CNSN_BN_PALLAS": "1", "CNSN_INS_PALLAS": "1"}),
]

def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for tag, overrides in MATRIX:
        env = dict(os.environ); env.update(overrides)
        env.setdefault("BENCH_ITERS", "40")
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
