#!/usr/bin/env python3
"""Merge the round-14 ScaleCheck outputs into SCALING.json.

Adds the round-14 10x points (from /tmp/r14m/scaling10.json) into the
top-level `queries` block and the round-14 100x points (from
/tmp/r14m/scaling100.json) into `x100.queries`, tagging each new entry
with measured_at_round: 14; carried sections keep their existing tags.
"""
import json

s = json.load(open("SCALING.json"))
s10 = json.load(open("/tmp/r14m/scaling10.json"))
s100 = json.load(open("/tmp/r14m/scaling100.json"))

for q, v in s10["queries"].items():
    v = dict(v)
    v["measured_at_round"] = 14
    s["queries"][q] = v
for q, v in s100["queries"].items():
    v = dict(v)
    v["measured_at_round"] = 14
    s["x100"]["queries"][q] = v

json.dump(s, open("SCALING.json", "w"), indent=1)
print("10x additions:", sorted(s10["queries"]))
print("100x additions:", sorted(s100["queries"]))
