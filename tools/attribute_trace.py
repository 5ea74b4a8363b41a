"""Attribute the latest /tmp/rapier_trace device trace to source lines.

Computes per-op SELF time on the XLA Ops track of the newest trace.json.gz,
then maps op names to source_file:source_line via the optimized-HLO metadata
dump at /tmp/hlo_opt.txt (written by tools/profile_trace.py's companion or a
manual .compile().as_text() dump).

Usage: python tools/attribute_trace.py [n_steps_traced] [top_k]
"""
import collections
import glob
import gzip
import json
import re
import sys

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 45

path = sorted(glob.glob("/tmp/rapier_trace/plugins/profile/*/*.trace.json.gz"))[-1]
print(path)
with gzip.open(path) as f:
    t = json.load(f)
tids = {}
for e in t["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
evs = [e for e in t["traceEvents"] if e.get("ph") == "X" and "dur" in e]
ops = [e for e in evs if tids.get((e["pid"], e["tid"])) == "XLA Ops"]
ops.sort(key=lambda e: (e["ts"], -e["dur"]))
self_t = collections.Counter()
stack = []
child = collections.defaultdict(float)
for e in ops:
    while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
        p = stack.pop()
        self_t[p["name"]] += p["dur"] - child.pop(id(p), 0)
    if stack:
        child[id(stack[-1])] += e["dur"]
    stack.append(e)
while stack:
    p = stack.pop()
    self_t[p["name"]] += p["dur"] - child.pop(id(p), 0)

src_of = {}
pat = re.compile(
    r'%(\S+?) = .*?metadata={[^}]*?source_file="([^"]+)"[^}]*?source_line=(\d+)'
)
for line in open("/tmp/hlo_opt.txt"):
    m = pat.search(line)
    if m:
        src_of[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
agg = collections.Counter()
for n, d in self_t.items():
    agg[src_of.get(n, "UNK:" + n.split(".")[0])] += d
print(f"total {sum(self_t.values()) / n_steps / 1e3:.2f} ms/step; by source:")
for s, d in agg.most_common(top_k):
    print(f"{d / n_steps / 1e3:8.3f}  {s}")
