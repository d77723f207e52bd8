#!/usr/bin/env python3
"""Cross-run minima merge of two full Bench artifacts (the r11 convention).

Usage: python3 tools/min_merge.py <run1.json> <run2.json> <out.json> [note]

Per-entry minimum of `detail.*.min` (and of the `queries` map), total
recomputed as the sum of the merged minima over TIMED entries (streams are
copied from the run with the lower stream total, and excluded from `value`
exactly as Bench itself excludes them). Run 2's metadata (preflight, skips)
is kept; a `note` records the provenance. Refuses runs with different entry
sets — a protocol drift between the runs would make the minima meaningless.
"""
import json
import sys


def main():
    r1 = json.load(open(sys.argv[1]))
    r2 = json.load(open(sys.argv[2]))
    note = sys.argv[4] if len(sys.argv) > 4 else (
        f"cross-run minima of {sys.argv[1].split('/')[-1]} and "
        f"{sys.argv[2].split('/')[-1]} (the r11 minima convention)")
    k1, k2 = set(r1["detail"]), set(r2["detail"])
    if k1 != k2:
        sys.exit(f"entry sets differ: only-run1={sorted(k1 - k2)}, "
                 f"only-run2={sorted(k2 - k1)}")
    out = dict(r2)
    out["detail"] = {}
    for k in r2["detail"]:
        a, b = r1["detail"][k], r2["detail"][k]
        out["detail"][k] = a if a["min"] <= b["min"] else b
    out["queries"] = {k: min(r1["queries"][k], r2["queries"][k])
                      for k in r2["queries"]}
    out["value"] = round(sum(v["min"] for v in out["detail"].values()), 3)
    s1 = sum(v["sec"] for v in r1.get("stream", {}).values())
    s2 = sum(v["sec"] for v in r2.get("stream", {}).values())
    out["stream"] = r1["stream"] if s1 <= s2 else r2["stream"]
    out["note"] = note
    json.dump(out, open(sys.argv[3], "w"))
    print(f"minima total {out['value']} over {len(out['detail'])} entries "
          f"(run1 {r1['value']}, run2 {r2['value']})")


if __name__ == "__main__":
    main()
