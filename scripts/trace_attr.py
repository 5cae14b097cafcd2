"""Aggregate a jax.profiler device trace by op class.

Usage: python scripts/trace_attr.py [trace_dir]   (default /tmp/jax_trace)
Finds the newest plugins/profile/*/‍*.trace.json.gz, sums device-lane op
durations, groups by op-name class, and prints a table.  Pair with
scripts/hlo_inspect.py HLO_TRACE=1 which writes the trace.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def classify(n: str) -> str:
    if "conv" in n and "fusion" not in n:
        return "convolution"
    if n.startswith("convert_reduce") or n.startswith("reduce"):
        return "reduce(stats)"
    if "scatter" in n:
        return "select-and-scatter"
    if "copy" in n:
        return "copy"
    if "fusion" in n:
        return "fusion(conv+elementwise)"
    if "dot" in n:
        return "dot"
    if "custom" in n:
        return "custom-call"
    return "other:" + re.sub(r"[.\d]+$", "", n)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    files = sorted(glob.glob(os.path.join(root, "plugins/profile/*/",
                                          "*.trace.json.gz")),
                   key=os.path.getmtime)
    if not files:
        sys.exit(f"no trace files under {root}")
    path = files[-1]
    print(f"trace: {path}")
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    ops = [e for e in ev
           if e.get("pid") in dev_pids and e.get("ph") == "X"
           and not e["name"].isdigit() and not e["name"].startswith("jit")]
    agg, cnt = collections.Counter(), collections.Counter()
    by_name = collections.Counter()
    for e in ops:
        c = classify(e["name"])
        agg[c] += e["dur"]
        cnt[c] += 1
        by_name[e["name"]] += e["dur"]
    tot = sum(agg.values())
    print(f"total attributed device time: {tot/1e3:.2f} ms "
          f"over {len(ops)} events")
    for n, v in agg.most_common(20):
        print(f"  {v/1e3:8.2f} ms  {cnt[n]:5d} ops  {n}")
    print("\ntop 25 individual ops:")
    for n, v in by_name.most_common(25):
        print(f"  {v/1e3:8.3f} ms  {n}")


if __name__ == "__main__":
    main()
