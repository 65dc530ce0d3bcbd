"""Summarize a jax.profiler trace.json.gz: device-lane op self-times
grouped by op name, plus per-executable (jit program) totals."""

import collections
import glob
import gzip
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else max(
    glob.glob("/tmp/scaloam_trace/plugins/profile/*/vm.trace.json.gz")
)
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]

# Identify process/thread names to find TPU device lanes.
pids = {}
tids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

device_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
print("processes:", pids)

by_name = collections.Counter()
by_program = collections.Counter()
count = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pid = e.get("pid")
    if device_pids and pid not in device_pids:
        continue
    tname = tids.get((e.get("pid"), e.get("tid")), "")
    if "step" in tname.lower():
        continue  # steps lane double-counts
    dur = e.get("dur", 0) / 1e3  # ms
    name = e.get("name", "?")
    args = e.get("args", {}) or {}
    prog = args.get("long_name") or args.get("hlo_module") or ""
    base = name.split(".")[0].split("_")[0]
    by_name[name] += dur
    count[name] += 1
    total += dur

print(f"\ntotal device op time: {total:.1f} ms (5 frames -> {total/5:.1f} ms/frame)")
print(f"{'op':70s} {'ms':>9s} {'n':>5s}")
for name, ms in by_name.most_common(45):
    print(f"{name[:70]:70s} {ms:9.2f} {count[name]:5d}")
