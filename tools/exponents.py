#!/usr/bin/env python3
"""Matched-pair stress exponents: given two Bench JSON artifacts at sf0.1
and sf1 (10x data, same cpus/mode/subset), print per-query ratio and
wall-clock exponent log10(t1/t0)."""
import json, math, sys

a, b = (json.load(open(p)) for p in sys.argv[1:3])
assert a.get("cpus") == b.get("cpus") and a.get("mode") == b.get("mode"), \
    "mismatched harness: compare only matched runs"
print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s} {'exp':>5s}")
for q in sorted(a["queries"]):
    t0, t1 = a["queries"][q], b["queries"].get(q)
    if t1 is None or t0 <= 0 or t1 <= 0:
        continue
    print(f"{q:28s} {t0:8.2f} {t1:8.2f} {t1/t0:6.1f} {math.log10(t1/t0):5.2f}")
