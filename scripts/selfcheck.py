#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL (oracle_sql.json) in DuckDB
over the same sf tables and compare rows/schema/values.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir>

Dev tool only — the engine itself has no Python/DuckDB dependency.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # floats compare EXACTLY (no rounding): queries are built for bit
    # determinism (decimal accumulation / explicit rounds), and the driver's
    # hash compare is assumed exact too
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bytes):
        return v.hex()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # driver testdata ships single files; blow-up dirs (StressSweep,
            # the sf1 heavy-class pass) are Spark-written DIRECTORIES
            pat = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = [tuple(norm(v) for v in row) for row in
                          spark_rel.select(*spark_cols).fetchall()]
            duck_rel = con.sql(oracle[name])
            duck_cols = sorted(duck_rel.columns)
            duck_rows = [tuple(norm(v) for v in row) for row in
                         duck_rel.select(*duck_cols).fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: schema {spark_cols} vs {duck_cols}")
        elif spark_rows != duck_rows:
            diff = next((i for i, (a, b) in enumerate(zip(spark_rows, duck_rows))
                         if a != b), None)
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}; "
                  f"first diff at {diff}:")
            if diff is not None:
                print(f"  spark: {spark_rows[diff]}")
                print(f"  duck : {duck_rows[diff]}")
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
            continue
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"({len(set(json.loads((Path(out_dir)/'oracle_sql.json').read_text())))} oracled)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
