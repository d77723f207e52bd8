#!/usr/bin/env python3
"""Per-entry scaling exponents between two Bench runs a decade apart.

Usage: python3 tools/exponents.py <bench_small.json> <bench_big.json> [decades]

Reads the full bench JSON (the /tmp/bench.json artifact — `queries` map of
per-entry minima), joins entries, and prints exponent = log10(t_big/t_small)
/ decades for every entry above a noise floor, sorted descending. Entries
under the floor in BOTH runs are summarized, not listed — a 40 ms number
moving to 70 ms is host noise, not a scaling signal.
"""
import json
import math
import sys

FLOOR = 0.25  # seconds: below this, minima are dominated by fixed overhead


def main():
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    rows = []
    quiet = 0
    for k in sorted(set(small) & set(big)):
        ts, tb = small[k], big[k]
        if ts <= 0 or tb <= 0:
            print(f"SKIP {k}: failed entry (small={ts}, big={tb})")
            continue
        if ts < FLOOR and tb < FLOOR:
            quiet += 1
            continue
        rows.append((math.log10(tb / ts) / decades, k, ts, tb))
    rows.sort(reverse=True)
    print(f"{'exponent':>9}  {'small_s':>8}  {'big_s':>8}  entry")
    for e, k, ts, tb in rows:
        print(f"{e:9.2f}  {ts:8.3f}  {tb:8.3f}  {k}")
    tot_s = sum(v for v in small.values() if v > 0)
    tot_b = sum(v for v in big.values() if v > 0)
    common = set(small) & set(big)
    com_s = sum(v for k, v in small.items() if k in common and v > 0)
    com_b = sum(v for k, v in big.items() if k in common and v > 0)
    print(f"\n{len(rows)} entries above {FLOOR}s floor; {quiet} sub-floor "
          f"in both runs (fixed-overhead regime, not listed)")
    print(f"totals (each run's own entries): {tot_s:.1f}s -> {tot_b:.1f}s")
    # the honest wall exponent compares the SAME work at both SFs — the
    # bench policy may skip quadratic entries only at the larger SF, and
    # a subset run (SPARK_GRAFT_ONLY) times fewer entries by design
    print(f"totals over the {len(common)} common entries: "
          f"{com_s:.1f}s -> {com_b:.1f}s  "
          f"(wall exponent {math.log10(com_b / com_s) / decades:.2f} "
          f"over {decades} decade(s))")


if __name__ == "__main__":
    main()
