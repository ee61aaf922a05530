"""Parse a jax.profiler trace (trace.json.gz) and print top device ops.

Usage:
  python tools/xprof_ops.py /tmp/trace_dir [top_n] [pid_filter_substr]

Reads the chrome-trace JSON jax writes alongside the xplane proto, sums
complete-event ('X') durations per op name per process (device planes show
up as their own pids), and prints the ranking — hot HLO ops without
tensorboard.
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def dump(trace_dir, top_n=30, pid_filter=None):
    paths = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    per_pid = defaultdict(lambda: defaultdict(float))
    per_pid_cnt = defaultdict(lambda: defaultdict(int))
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        name = ev.get("name", "?")
        dur_ms = ev.get("dur", 0) / 1e3
        per_pid[pid][name] += dur_ms
        per_pid_cnt[pid][name] += 1
    for pid, ops in per_pid.items():
        pname = pid_names.get(pid, str(pid))
        if pid_filter and pid_filter.lower() not in pname.lower():
            continue
        total = sum(ops.values())
        print(f"\n== pid {pid} ({pname}) total {total:.1f} ms over {sum(per_pid_cnt[pid].values())} events")
        for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:9.2f} ms  x{per_pid_cnt[pid][name]:<5d} {name[:110]}")


if __name__ == "__main__":
    dump(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        sys.argv[3] if len(sys.argv) > 3 else None,
    )
