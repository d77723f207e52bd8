#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--present-only]

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
sorts columns by name + rows by value, and compares cell-by-cell.

--present-only: compare only queries that HAVE a Spark dump (a targeted
`graft.Verify <sf> <out> q_a q_b ...` subset run — e.g. the sf10+
heavy-family studies); a missing dump is then not a failure. The driver's
own gate always does the full dump, where a missing dump IS a failure.

--only=q_a,q_b: restrict to named queries (batching the heavy sf10
oracles one at a time bounds DuckDB's peak).

Large-SF resource budget (the r10 sf10 compare died of disk-then-OOM at
100/114): set DUCKDB_MEMORY_LIMIT (e.g. "48GB") and DUCKDB_TEMP_DIR (a
roomy volume) to let DuckDB spill instead of dying.
"""
import os
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or (math.isnan(a) and math.isnan(b))
        except TypeError:
            return False
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    present_only = "--present-only" in sys.argv[3:]
    only = None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(x for x in a[len("--only="):].split(",") if x)
    con = duckdb.connect()
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_TEMP_DIR"):
        Path(os.environ["DUCKDB_TEMP_DIR"]).mkdir(parents=True, exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['DUCKDB_TEMP_DIR']}'")
    if os.environ.get("DUCKDB_THREADS"):
        # bound the oracle's CPU when it shares the host with a live
        # Verify/bench JVM (the sf10 runs overlap engine dump + compare)
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        qdir = Path(out_dir, name)
        if not qdir.exists():
            if present_only:
                continue
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.read_parquet(qdir))
        duck_df = canon(con.execute(oracle[name]).fetchdf())
        status, detail = "PASS", ""
        if list(spark_df.columns) != list(duck_df.columns):
            status = "FAIL"
            detail = f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
        elif len(spark_df) != len(duck_df):
            status = "FAIL"
            detail = f"rows spark={len(spark_df)} duck={len(duck_df)}"
        else:
            for c in spark_df.columns:
                av, bv = spark_df[c].tolist(), duck_df[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv))
                       if not cells_equal(x, y)]
                if bad:
                    status = "FAIL"
                    i, x, y = bad[0]
                    detail = (f"col {c} row {i}: spark={x!r} duck={y!r} "
                              f"({len(bad)} diffs)")
                    break
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name} ({len(spark_df)} rows) {detail}")
    # queries without oracle: rows-only presence (suppressed under --only)
    if only is None:
        for qdir in sorted(Path(out_dir).iterdir()):
            if qdir.is_dir() and qdir.name not in oracle:
                n = len(pd.read_parquet(qdir))
                print(f"INFO {qdir.name}: rows-only, {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
