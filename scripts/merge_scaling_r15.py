#!/usr/bin/env python3
"""Merge the round-15 ScaleCheck/ChurnCheck outputs into SCALING.json.

Adds the round-15 10x points (from /tmp/r15m/scaling10.json) into the
top-level `queries` block, the 100x points (from /tmp/r15m/scaling100.json)
into `x100.queries`, and the append-churn curve (from /tmp/r15m/churn.json)
as the top-level `append_churn` block — each tagged measured_at_round: 15;
carried sections keep their existing tags.
"""
import json, os

s = json.load(open("SCALING.json"))
if os.path.exists("/tmp/r15m/scaling10.json"):
    s10 = json.load(open("/tmp/r15m/scaling10.json"))
    for q, v in s10["queries"].items():
        v = dict(v)
        v["measured_at_round"] = 15
        s["queries"][q] = v
    print("10x additions:", sorted(s10["queries"]))
if os.path.exists("/tmp/r15m/scaling100.json"):
    s100 = json.load(open("/tmp/r15m/scaling100.json"))
    for q, v in s100["queries"].items():
        v = dict(v)
        v["measured_at_round"] = 15
        s["x100"]["queries"][q] = v
    print("100x additions:", sorted(s100["queries"]))
if os.path.exists("/tmp/r15m/churn.json"):
    churn = json.load(open("/tmp/r15m/churn.json"))
    churn["measured_at_round"] = 15
    s["append_churn"] = churn
    print("append_churn block added")

json.dump(s, open("SCALING.json", "w"), indent=1)
