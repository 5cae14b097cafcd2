"""Wave 6: flagship-recipe bench (run-cnsn.sh semantics: in-network SN
+ image-space CN gated at cn_prob=0.5) and remaining innet combos.
Appends to perf/r2_matrix4.jsonl."""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "perf", "r2_matrix4.jsonl")

MATRIX = [
    ("flagship_b128", {}),
    ("flagship_b128_s2d", {"BENCH_STEM": "s2d"}),
    ("innet_cnsn_dot_s2d", {"BENCH_RECIPE": "innet", "BENCH_STEM": "s2d"}),
    ("flagship_b128_convref", {"CNSN_CONV1X1": "conv"}),
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
