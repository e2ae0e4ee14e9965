#!/usr/bin/env python3
"""Deterministic perf gate (VERDICT r17 next #5).

Wall-clock on a shared host drifts badly (SCALE.md: the same committed
code measured q201 at 24-57s across four same-day runs), so regressions
are gated on PLAN METRICS instead: per-query Spark job counts are a pure
function of the code and the data, and survive host drift. This script
compares the `plan_metrics` maps of two bench records (the full-record
file Bench writes, e.g. target/bench_last.json or bench_rN_final.json):

    python3 tools/perfgate.py tools/plan_metrics_baseline.json target/bench_last.json

Exit 1 if any query's job count GREW versus the baseline and the query is
not listed in tools/perfgate_allow.json with a reason (the recorded-reason
escape hatch: a deliberate trade, e.g. "payload batches no longer collect
driver-side, +1 checkpoint job per trigger"). Shrinkage and new/removed
queries are reported informationally. Wall times are printed as advisory
context only — they never gate.

The committed baseline (tools/plan_metrics_baseline.json) is refreshed at
each round's end from the final bench record, so the gate always measures
"since the last accepted state", not "since the beginning of time".
"""
import json
import sys
import os


def load_metrics(path):
    with open(path) as f:
        rec = json.load(f)
    # accept either a full bench record or a bare plan_metrics map
    if "plan_metrics" in rec:
        return rec.get("plan_metrics", {}), rec.get("queries", {})
    return rec, {}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    base_pm, base_q = load_metrics(args[0])
    cur_pm, cur_q = load_metrics(args[1])
    allow_path = os.path.join(os.path.dirname(__file__), "perfgate_allow.json")
    allow = {}
    if os.path.exists(allow_path):
        with open(allow_path) as f:
            allow = json.load(f)

    common = sorted(set(base_pm) & set(cur_pm))
    grew, allowed, shrank = [], [], []
    for q in common:
        b, c = base_pm[q].get("jobs", 0), cur_pm[q].get("jobs", 0)
        if c > b:
            (allowed if q in allow else grew).append((q, b, c))
        elif c < b:
            shrank.append((q, b, c))

    for q, b, c in shrank:
        print(f"OK   {q}: jobs {b} -> {c} (improved)")
    for q, b, c in allowed:
        print(f"ALLOW {q}: jobs {b} -> {c} — {allow[q]}")
    for q, b, c in grew:
        w = ""
        if q in base_q and q in cur_q:
            w = f" (wall {base_q[q]:.1f}s -> {cur_q[q]:.1f}s, advisory)"
        print(f"FAIL {q}: jobs {b} -> {c} with no recorded reason{w}")

    new = sorted(set(cur_pm) - set(base_pm))
    gone = sorted(set(base_pm) - set(cur_pm))
    if new:
        print(f"INFO new queries (no baseline): {', '.join(new)}")
    if gone:
        print(f"INFO queries missing from current run: {', '.join(gone)}")

    tb = sum(base_pm[q].get("jobs", 0) for q in common)
    tc = sum(cur_pm[q].get("jobs", 0) for q in common)
    print(f"TOTAL jobs over {len(common)} common queries: {tb} -> {tc}")
    if grew:
        print(f"perfgate: {len(grew)} unexplained job-count growth(s)")
        return 1
    print("perfgate: pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
