#!/usr/bin/env python3
"""Diff two bench outputs and flag per-query deltas worth investigating.

Usage: compare_bench.py <old.json-or-log> <new.json-or-log> [ratio=2.0]

Accepts either a raw Bench stdout line ({"metric":...}) or the driver's
BENCH_r*.json wrapper (the line lives in its "tail"). Per SCALE.md
"Measurement noise": this VM shows +-30% routinely and isolated 4-8x
spikes under transient load — a flagged query is a re-run-and-plan-diff
prompt, not proof of a regression.

Besides the headline (dropminmax-median) diff, this prints a NOISE
VERDICT: per-run stall-rep counts (a query whose raw reps span max/min
>= 3 was hit by a box stall in at least one rep) and a min-vs-min
comparison (each query's fastest raw rep — the load-insensitive floor).
A large headline delta with a near-1.0 min-vs-min median and many stall
reps is environment, not code; round 15's official 19% "regression"
decomposed exactly that way by hand — this automates it.
"""
import json
import re
import statistics
import sys

STALL_SPAN = 3.0  # raw-rep max/min at or above this = a stalled rep


def load(path):
    txt = open(path).read().replace('\\"', '"')
    m = re.findall(r'\{"metric".*?"sf":"[^"]*"\}', txt)
    if m:
        return json.loads(m[-1])
    # Salvage a driver-truncated artifact (BENCH_r*.json keeps only the
    # LAST ~2000 chars of stdout): recover whatever per-query rep arrays
    # and trailing compact fields survive, and synthesize the rest.
    arrays = {}
    for k, v in re.findall(r'"(q_\w+)":(\[[0-9.,\-]*\])', txt):
        arrays[k] = json.loads(v)  # later (raw) fragment wins over kept
    # scalar fragments: ONLY from the queries_min map's own span — a bare
    # "q_x":N regex would also match surviving entries of the `queries`
    # (median) map and failed-query -1 sentinels, and summing those as
    # floors makes the noise verdict compare medians as if they were
    # load-insensitive minima. Negative sentinels are dropped either way.
    scalars = {}
    qm_span = re.search(r'"queries_min":\{([^}]*)', txt)
    if qm_span:
        for k, v in re.findall(r'"(q_\w+)":(-?\d+(?:\.\d+)?)(?=[,}]|$)', qm_span.group(1)):
            fv = float(v)
            if fv >= 0:
                scalars[k] = fv
    if not arrays and not scalars and not re.search(
            r'"(floor_total|stalls|sweep_load)":', txt):
        raise SystemExit(f"no bench line found in {path}")
    raw = {k: v for k, v in arrays.items() if v}
    med = {k: sorted(v)[len(v) // 2] for k, v in raw.items()}
    for k, v in scalars.items():
        med.setdefault(k, v)
    out = {"value": sum(med.values()), "queries": med, "rep_times_raw": raw,
           "queries_min": scalars or None}
    for field in ("sweep_load", "sweep_ts"):
        fm = re.search(r'"%s":(\[[0-9.,\-]*\])' % field, txt)
        if fm:
            out[field] = json.loads(fm.group(1))
    for field in ("floor_total", "stalls", "best_floor_total", "best_floor_runs"):
        fm = re.search(r'"%s":(-?\d+(?:\.\d+)?)' % field, txt)
        if fm:
            out[field] = float(fm.group(1))
    print(f"note: {path} is a truncated driver artifact — salvaged "
          f"{len(raw)} rep arrays; its 'total' is the sum of their medians")
    return out


def raw_reps(bench):
    """Per-query raw rep arrays; falls back to kept reps on old artifacts."""
    return bench.get("rep_times_raw") or bench.get("rep_times") or {}


def mins(bench):
    """Per-query fastest raw rep; falls back to queries_min, then median."""
    raw = raw_reps(bench)
    if raw:
        return {k: min(v) for k, v in raw.items() if v}
    return bench.get("queries_min") or bench.get("queries") or {}


def stalled(bench):
    return sorted(k for k, v in raw_reps(bench).items()
                  if len(v) >= 2 and min(v) > 0 and max(v) / min(v) >= STALL_SPAN)


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

    # The durable cross-run floor (bench --merge / official-run folding):
    # the only headline that survives a constant-load day. A best-floor
    # regression IS code (or a corpus regen — the record resets on one);
    # an official-total regression with a flat best floor is weather.
    for run, name in ((old, "old"), (new, "new")):
        bft = run.get("best_floor_total")
        if bft and bft > 0:
            print(f"  {name} best_floor_total {bft:.1f}s "
                  f"over {int(run.get('best_floor_runs', 0))} run(s)")

    # ------------------------------------------------------- noise verdict
    st_old, st_new = stalled(old), stalled(new)
    mo, mn = mins(old), mins(new)
    shared = sorted(set(mo) & set(mn))
    def stall_label(run, st):
        rr = run.get("stall_reruns")
        suffix = f" ({int(rr)} re-run)" if rr else ""
        if raw_reps(run):
            return f"{len(st)}/{len(raw_reps(run))}{suffix}"
        s = run.get("stalls")
        return f"{int(s)} (scalar){suffix}" if s is not None else "?"
    print(f"\nstall reps (raw max/min >= {STALL_SPAN:g}): "
          f"old {stall_label(old, st_old)}, new {stall_label(new, st_new)}")
    for k in st_new[:10]:
        v = raw_reps(new)[k]
        print(f"  stalled {k:24s} reps {v} (span {max(v) / min(v):.1f}x)")
    if len(st_new) > 10:
        print(f"  ... and {len(st_new) - 10} more")
    for run, name in ((old, "old"), (new, "new")):
        la, ts = run.get("sweep_load"), run.get("sweep_ts")
        if la:
            span = f", sweeps {ts[0]}..{ts[-1]}" if ts else ""
            print(f"  {name} per-sweep loadavg: "
                  f"{', '.join(f'{x:.1f}' for x in la)}{span}")
    if shared:
        tot_o, tot_n = sum(mo[k] for k in shared), sum(mn[k] for k in shared)
        ratios = sorted(mn[k] / max(mo[k], 1e-9) for k in shared if mo[k] > 0.05)
        med = statistics.median(ratios) if ratios else float("nan")
        regressed = [k for k in shared
                     if mo[k] > 0.05 and mn[k] / mo[k] >= 1.5 and mn[k] > 0.5]
        print(f"min-vs-min (load-insensitive floor): {tot_o:.1f}s -> {tot_n:.1f}s "
              f"({tot_n / max(tot_o, 1e-9):.2f}x), per-query median ratio {med:.2f}x, "
              f"{len(regressed)} queries >= 1.5x")
        for k in regressed:
            print(f"  FLOOR-SLOWER {k:24s} {mo[k]:6.2f}s -> {mn[k]:6.2f}s "
                  f"({mn[k] / mo[k]:.1f}x)  <- a real plan change, not noise")
        headline = new["value"] / max(old["value"], 1e-9)
        if headline >= 1.1 and med <= 1.1 and not regressed:
            print("NOISE VERDICT: headline regression is ENVIRONMENT — the "
                  "min-vs-min floor is flat and no query's floor moved >= 1.5x"
                  + (f" ({len(st_new)} stalled reps in the new run)" if st_new else ""))
        elif regressed:
            print("NOISE VERDICT: REAL floor regressions present — plan-diff "
                  "the FLOOR-SLOWER queries above")
        else:
            print("NOISE VERDICT: no floor regression; headline within noise")
    else:
        # maximally truncated artifacts: the two closing scalars survive
        # any cut and still adjudicate the headline
        fo, fn = old.get("floor_total"), new.get("floor_total")
        if fo and fn:
            print(f"floor totals (scalar fallback): {fo:.1f}s -> {fn:.1f}s "
                  f"({fn / fo:.2f}x)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
