"""Aggregate a jax.profiler trace: top XLA ops by total device time.

Pairs with tools/profile_step.py (which proved device lanes ARE captured
through the axon relay).  Reads the newest trace under --outdir, sums
event durations per op name on device process lanes, and prints the top
ops with their share of total device time plus any HLO metadata the event
args carry (source op names etc.).

Usage: python tools/profile_top.py [--outdir /tmp/jaxtrace] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", type=str, default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    traces = sorted(glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*.trace.json.gz")))
    assert traces, f"no trace under {args.outdir}"
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])

    # process id -> name (device lanes are named like "/device:TPU:0" or
    # carry 'XLA Ops' thread names)
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    tot = defaultdict(float)
    cnt = defaultdict(int)
    meta = {}
    lane_of = {}
    device_total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = threads.get((e.get("pid"), e.get("tid")), "") or \
            procs.get(e.get("pid"), "")
        lname = lane.lower()
        if not any(k in lname for k in ("xla op", "tpu", "device", "stream")):
            continue
        if "host" in lname or "python" in lname:
            continue
        name = e.get("name", "?")
        tot[name] += e["dur"]
        cnt[name] += 1
        device_total += e["dur"]
        lane_of[name] = lane
        if name not in meta and isinstance(e.get("args"), dict):
            keep = {k: v for k, v in e["args"].items()
                    if k in ("long_name", "tf_op", "hlo_module", "source",
                             "hlo_category", "kind")}
            if keep:
                meta[name] = keep

    print(f"lanes seen: {sorted(set(lane_of.values()))[:6]}")
    print(f"device total: {device_total/1e3:.2f} ms over "
          f"{sum(cnt.values())} events\n")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]
    for name, dur in rows:
        extra = meta.get(name, {})
        src = extra.get("long_name") or extra.get("tf_op") or \
            extra.get("source") or ""
        cat = extra.get("hlo_category", "")
        print(f"{dur/1e3:8.3f} ms {100*dur/max(device_total,1e-9):5.1f}% "
              f"x{cnt[name]:<4d} {name}  {cat}  {str(src)[:120]}")


if __name__ == "__main__":
    main()
