"""Summarize a jax.profiler trace: top XLA ops by total device time.

Usage: python tools/trace_summary.py [trace_dir_or_json_gz]
Defaults to the newest trace under /tmp/sgnt_trace.
"""
import collections
import glob
import gzip
import json
import sys


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgnt_trace"
    if arg.endswith(".json.gz"):
        path = arg
    else:
        cands = glob.glob(arg + "/**/*.trace.json.gz", recursive=True)
        if not cands:
            sys.exit(f"no trace under {arg}")
        path = sorted(cands)[-1]
    print("trace:", path)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        tot[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    print(f"{'us_total':>12} {'n':>4}  name")
    for name, us in tot.most_common(40):
        print(f"{us:>12.1f} {cnt[name]:>4}  {name[:120]}")
    print("sum:", round(sum(tot.values()) / 1e3, 2), "ms over",
          len(tot), "distinct ops")


if __name__ == "__main__":
    main()
