#!/usr/bin/env python3
"""Join-shape / pushdown census over a PLANS_r*.txt dump (the output of
`graft.Explain`): counts each physical join operator, cartesian products,
and parquet scans with / without pushed filters. Run on two dumps to diff
rounds:  python3 tools/plan_census.py docs/PLANS_r19.txt docs/PLANS_r20.txt
"""
import re
import sys
from collections import Counter

JOIN_RX = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b(?: (\w+))?")


def census(path: str) -> Counter:
    c = Counter()
    for line in open(path):
        for op, kind in JOIN_RX.findall(line):
            c[f"{op} {kind}".strip()] += 1
        if "PushedFilters:" in line:
            c["scan(PushedFilters non-empty)" if "PushedFilters: ["
               not in line or not re.search(r"PushedFilters: \[\s*\]", line)
               else "scan(PushedFilters EMPTY)"] += 1
    return c


def main() -> None:
    counts = {p: census(p) for p in sys.argv[1:]}
    keys = sorted(set().union(*counts.values()))
    width = max(len(k) for k in keys) + 2
    header = " " * width + "  ".join(f"{p.split('/')[-1]:>18}" for p in counts)
    print(header)
    diff = False
    for k in keys:
        vals = [counts[p][k] for p in counts]
        mark = "" if len(set(vals)) == 1 else "   <-- DIFFERS"
        if mark:
            diff = True
        print(f"{k:<{width}}" + "  ".join(f"{v:>18}" for v in vals) + mark)
    if len(counts) > 1:
        print("\ncensus DIFFERS between dumps" if diff
              else "\ncensus IDENTICAL across dumps")
        sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
