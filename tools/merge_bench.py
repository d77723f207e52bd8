#!/usr/bin/env python3
"""Merge a killed Bench run's stderr progress lines into a resume run's JSON.

Usage: python3 tools/merge_bench.py <dead_run.err> <resume.json> <out.json>

The bench prints one `[bench] i/N name min=X med=Y` line per COMPLETED
entry exactly so a multi-hour large-SF study that dies keeps its partial
measurements (Bench.scala's crash-durable contract). This tool closes the
loop: entries with min > 0 in the dead run's stderr are merged into the
resume run's `queries` map (resume entries win on overlap — they are the
fresher measurement), and the `value` total is recomputed as the sum of
successful minima so downstream tools (exponents.py) see one artifact.
"""
import json
import re
import sys


def main():
    err_path, resume_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    salvaged = {}
    pat = re.compile(r"^\[bench\] \d+/\d+ (\S+) min=(-?\d+\.\d+) ")
    for line in open(err_path, errors="replace"):
        m = pat.match(line)
        if m and float(m.group(2)) > 0:
            salvaged[m.group(1)] = float(m.group(2))
    out = json.load(open(resume_path))
    merged = dict(salvaged)
    merged.update(out["queries"])  # resume wins on overlap
    out["queries"] = merged
    out["value"] = round(sum(v for v in merged.values() if v > 0), 3)
    out["merged_from_partial"] = sorted(
        k for k in salvaged if k not in json.load(open(resume_path))["queries"])
    json.dump(out, open(out_path, "w"))
    print(f"salvaged {len(salvaged)} entries from stderr, "
          f"{len(out['merged_from_partial'])} used; total {out['value']} s "
          f"over {len(merged)} entries")


if __name__ == "__main__":
    main()
