"""Aggregate device-side op durations from a jax.profiler trace.

Reads the trace.json.gz (or converts the xplane.pb via
tensorboard_plugin_profile if present) and prints total duration by XLA
op, device track only — the top-10 table for PROFILE.md.

Usage: python profiling/parse_trace.py <trace_dir_or_json.gz>
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def load_events(path):
    if not path.endswith(".json.gz"):
        cands = sorted(glob.glob(path + "/**/*.trace.json.gz", recursive=True))
        if not cands:
            raise SystemExit(f"no trace.json.gz under {path}")
        path = cands[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    evs = load_events(sys.argv[1])
    # Map pid/tid -> names
    pid_name = {}
    tid_name = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"]["name"]

    device_pids = {p for p, n in pid_name.items() if "TPU" in n or "device" in n}
    by_track = collections.defaultdict(lambda: collections.Counter())
    track_total = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        track = tid_name.get((e["pid"], e.get("tid")), str(e.get("tid")))
        dur = e.get("dur", 0.0)  # microseconds
        by_track[track][e["name"]] += dur
        track_total[track] += dur

    for track in sorted(by_track):
        print(f"\n=== track: {track}  (total {track_total[track]/1e3:.2f} ms) ===")
        for name, dur in by_track[track].most_common(15):
            print(f"  {dur/1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
