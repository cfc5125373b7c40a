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


def dtype_equiv(spark_t, duck_t):
    """Equivalence for the dtype-strict gate. Spark parquet output read back
    by DuckDB vs the oracle relation's declared types. Exact match required,
    with one physical-encoding allowance: Spark writes session-local
    timestamps as parquet TIMESTAMP(isAdjustedToUTC=true) which DuckDB reads
    as TIMESTAMP WITH TIME ZONE, while oracle TIMESTAMP literals/date_trunc
    are plain TIMESTAMP — both are int64 micros on the wire with identical
    values (UTC session), so the driver's typed-value hash agrees."""
    if spark_t == duck_t:
        return True
    ts = {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}
    return spark_t in ts and duck_t in ts


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
            spark_sel = spark_rel.select(*spark_cols)
            spark_types = [str(t) for t in spark_sel.types]
            spark_rows = [tuple(norm(v) for v in row) for row in
                          spark_sel.fetchall()]
            duck_rel = con.sql(oracle[name])
            duck_cols = sorted(duck_rel.columns)
            duck_sel = duck_rel.select(*duck_cols)
            duck_types = [str(t) for t in duck_sel.types]
            duck_rows = [tuple(norm(v) for v in row) for row in
                         duck_sel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # dtype-strict: the DRIVER's value hash serializes typed values, so a
        # numerically-equal result with a different dtype (the r14/r15 c12/c13
        # red: DuckDB SUM(BIGINT) -> HUGEINT vs Spark int64) is a FAIL here
        # too, even though Python-level value compare would pass.
        dtype_diff = [(c, a, b) for c, a, b in
                      zip(spark_cols, spark_types, duck_types)
                      if not dtype_equiv(a, b)]
        if spark_cols != duck_cols:
            print(f"FAIL {name}: schema {spark_cols} vs {duck_cols}")
        elif dtype_diff:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle): " +
                  ", ".join(f"{c}: {a} vs {b}" for c, a, b in dtype_diff))
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
