"""Summarise a jax.profiler trace (Chrome trace JSON) into per-op totals.

Usage:
    python scripts/xprof_summary.py /tmp/xtrace [--top 40] [--group]

Finds the newest */*.trace.json.gz under the given directory, keeps the
device-side complete events (the TPU op lanes), and prints the ops ranked by
total duration with occurrence counts. --group merges ops by their fusion
family (name with trailing .N / digits stripped) to show hot *kinds* of op.

This is the profiling companion to BENCH_NOTES.md: the axon-tunneled runtime
supports jax.profiler.start_trace/stop_trace and writes both an .xplane.pb
and a Chrome trace; the JSON is self-contained and needs no tensorflow.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # pid/tid -> names, to keep only device lanes (exclude python/host threads)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return events, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--pid-filter", default="TPU|/device|XLA Op|Axon",
                    help="regex over process names treated as device lanes")
    args = ap.parse_args()

    path = newest_trace(args.root)
    events, names = load_events(path)
    dev_pids = {p for p, n in names.items() if re.search(args.pid_filter, n, re.I)}
    if not dev_pids:  # fall back: everything that's not obviously host python
        dev_pids = {p for p, n in names.items() if "python" not in n.lower()}
    print(f"# trace: {path}")
    for p in sorted(names):
        print(f"#   pid {p}: {names[p]}{'  [device]' if p in dev_pids else ''}")

    tot = collections.Counter()
    cnt = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if args.group:
            name = re.sub(r"[.\d]+$", "", name)
        dur = float(e.get("dur", 0.0))  # microseconds
        tot[name] += dur
        cnt[name] += 1
        wall += dur
    print(f"# total device op time: {wall/1e3:.3f} ms over {sum(cnt.values())} events")
    print(f"{'total_ms':>10} {'count':>7} {'avg_us':>9}  name")
    for name, us in tot.most_common(args.top):
        print(f"{us/1e3:10.3f} {cnt[name]:7d} {us/cnt[name]:9.1f}  {name}")


if __name__ == "__main__":
    main()
