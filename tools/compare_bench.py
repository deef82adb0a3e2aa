#!/usr/bin/env python3
"""Diff two bench outputs and flag per-query deltas worth investigating.

Usage: compare_bench.py <old.json-or-log> <new.json-or-log> [ratio=2.0]

Accepts either a raw Bench stdout line ({"metric":...}) or the driver's
BENCH_r*.json wrapper (the line lives in its "tail"). Per SCALE.md
"Measurement noise": this VM shows +-30% routinely and isolated 4-8x
spikes under transient load — a flagged query is a re-run-and-plan-diff
prompt, not proof of a regression.
"""
import json
import re
import sys


def load(path):
    txt = open(path).read()
    m = re.findall(r'\{"metric".*?"sf":"[^"]*"\}', txt.replace('\\"', '"'))
    if not m:
        raise SystemExit(f"no bench line found in {path}")
    return json.loads(m[-1])


def main(old_p, new_p, ratio=2.0):
    old, new = load(old_p), load(new_p)
    qo, qn = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s ({len(qo)} q) -> "
          f"{new['value']:.1f}s ({len(qn)} q)")
    flagged = 0
    for k in sorted(set(qo) & set(qn)):
        a, b = qo[k], qn[k]
        if b > 0.5 and (b / max(a, 1e-9) >= ratio or a / max(b, 1e-9) >= ratio):
            flagged += 1
            print(f"  {'SLOWER' if b > a else 'faster':6s} {k:24s} "
                  f"{a:6.2f}s -> {b:6.2f}s  ({b / max(a, 1e-9):.1f}x)")
    for k in sorted(set(qn) - set(qo)):
        print(f"  new    {k:24s}          -> {qn[k]:6.2f}s")
    for k in sorted(set(qo) - set(qn)):
        print(f"  gone   {k:24s} {qo[k]:6.2f}s")
    print(f"{flagged} queries changed by >= {ratio}x (re-run before believing)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
