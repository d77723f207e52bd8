#!/usr/bin/env python3
"""Summarize a graft.StreamSoak JSON: is per-trigger cost flat or growing?

Usage: python3 tools/soak_summary.py /tmp/soak.json

Prints the per-trigger series' first/last-quartile means, the least-squares
slope in ms/trigger (with the first trigger dropped — it pays one-time plan
analysis/codegen), and rows/s per decile, so SURVEY §8 tables come from a
tracked script instead of ad-hoc arithmetic.
"""
import json
import sys


def main():
    d = json.load(open(sys.argv[1]))
    xs = d["per_trigger_sec"]
    n = len(xs)
    if n < 3:
        sys.exit(f"need >=3 triggers to summarize (got {n}): trigger 1 is "
                 "dropped as plan warmup and quartile means need a body")
    rows = d["rows_per_trigger"]
    body = xs[1:]  # trigger 1 pays one-time plan analysis/codegen
    q = max(1, len(body) // 4)
    first_q, last_q = body[:q], body[-q:]
    mean = lambda v: sum(v) / len(v)
    # least-squares slope over the body
    m = len(body)
    mx = (m - 1) / 2
    my = mean(body)
    num = sum((i - mx) * (y - my) for i, y in enumerate(body))
    den = sum((i - mx) ** 2 for i in range(m))
    slope = num / den if den else 0.0
    print(f"sink={d['sink']} triggers={n} rows/trigger={rows} sf={d['sf']}")
    print(f"trigger 1 (plan warmup): {xs[0]:.3f} s")
    print(f"first-quartile mean (t2..): {mean(first_q):.3f} s "
          f"({rows/mean(first_q):.0f} rows/s)")
    print(f"last-quartile mean:        {mean(last_q):.3f} s "
          f"({rows/mean(last_q):.0f} rows/s)")
    print(f"growth last/first quartile: {mean(last_q)/mean(first_q):.2f}x")
    print(f"ls slope: {slope*1000:.1f} ms/trigger "
          f"({slope*1000/ (mean(body)*1000) * 100:.2f}%/trigger of mean)")
    # cadence runs (r13): per-epoch means + LS slopes between compactions —
    # a constant cross-epoch slope is the band join's semantic store-linear
    # term; a rising one would be renewed footer growth
    pts = d.get("compact_points") or []
    if pts:
        bounds = [0] + list(pts) + [n]
        for k in range(len(bounds) - 1):
            lo, hi = bounds[k], bounds[k + 1]
            seg = xs[max(lo, 1):hi]  # drop only the global warmup trigger
            if len(seg) < 3:
                continue
            sm = len(seg)
            smx = (sm - 1) / 2
            smy = mean(seg)
            snum = sum((i - smx) * (y - smy) for i, y in enumerate(seg))
            sden = sum((i - smx) ** 2 for i in range(sm))
            sslope = snum / sden if sden else 0.0
            print(f"epoch {k+1} (t{lo+1}-t{hi}): mean {smy:.3f} s, "
                  f"slope {sslope*1000:.1f} ms/trigger")
        csec = d.get("compact_sec")
        if isinstance(csec, list):
            print(f"compactions at {pts}: " +
                  ", ".join(f"{c:.1f}s" for c in csec))
    pf = d.get("preflight", {})
    print(f"preflight contended={pf.get('contended')}")
    dec = max(1, n // 10)
    series = ", ".join(f"{rows/x:.0f}" for x in xs[::dec])
    print(f"rows/s every {dec}th trigger: {series}")


if __name__ == "__main__":
    main()
