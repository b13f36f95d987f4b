#!/usr/bin/env python3
"""Merge the round-16 ScaleCheck outputs into SCALING.json.

Adds the round-16 10x points (from /tmp/r16m/scaling10.json) into the
top-level `queries` block and the 100x points (from
/tmp/r16m/scaling100.json) into `x100.queries` — each tagged
measured_at_round: 16; carried sections keep their existing tags.
"""
import json, os

s = json.load(open("SCALING.json"))
if os.path.exists("/tmp/r16m/scaling10.json"):
    s10 = json.load(open("/tmp/r16m/scaling10.json"))
    for q, v in s10["queries"].items():
        v = dict(v)
        v["measured_at_round"] = 16
        s["queries"][q] = v
    print("10x additions:", sorted(s10["queries"]))
if os.path.exists("/tmp/r16m/scaling100.json"):
    s100 = json.load(open("/tmp/r16m/scaling100.json"))
    for q, v in s100["queries"].items():
        v = dict(v)
        v["measured_at_round"] = 16
        s["x100"]["queries"][q] = v
    print("100x additions:", sorted(s100["queries"]))

json.dump(s, open("SCALING.json", "w"), indent=1)
