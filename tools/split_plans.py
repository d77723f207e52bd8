#!/usr/bin/env python3
"""Split graft.Explain output into plans/<round>/<query>_<suffix>.txt files.

Usage: split_plans.py <explain_output_file> <out_dir> <suffix>
The Explain main prints "========== <name> ==========" headers.
"""
import re
import sys
import os

src, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(out_dir, exist_ok=True)
name = None
buf = []


def flush():
    if name and buf:
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("".join(buf).strip() + "\n")


for line in open(src):
    m = re.match(r"=+ (\S+) =+", line)
    if m:
        flush()
        name = m.group(1)
        buf = []
    elif name:
        buf.append(line)
flush()
print("done")
