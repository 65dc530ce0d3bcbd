"""Attribute device op events to their enclosing jit program by time range
and print the top ops per program."""

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
tids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

modules = []  # (ts, te, name)
ops = []
for e in events:
    if e.get("ph") != "X":
        continue
    lane = tids.get((e.get("pid"), e.get("tid")), "")
    if e.get("name", "").startswith("jit_"):
        modules.append((e["ts"], e["ts"] + e["dur"], e["name"].split("(")[0]))
    elif "XLA Ops" in lane or ("TensorFlow Name Scope" not in lane and not e.get("name", "").startswith("jit_")):
        ops.append((e["ts"], e.get("dur", 0), e.get("name", "?")))

modules.sort()
per = collections.defaultdict(collections.Counter)
cnt = collections.defaultdict(collections.Counter)
import bisect

starts = [m[0] for m in modules]
for ts, dur, name in ops:
    i = bisect.bisect_right(starts, ts) - 1
    if i >= 0 and ts < modules[i][1]:
        prog = modules[i][2]
    else:
        continue
    per[prog][name] += dur / 1e3
    cnt[prog][name] += 1

for prog in per:
    tot = sum(per[prog].values())
    print(f"\n=== {prog}: {tot:.1f} ms total, {tot/5:.2f} ms/frame ===")
    for name, ms in per[prog].most_common(22):
        print(f"  {name[:64]:64s} {ms/5:8.3f} ms/frame  x{cnt[prog][name]//5}")
