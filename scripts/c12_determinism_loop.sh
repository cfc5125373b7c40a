#!/usr/bin/env bash
# Round-15 flake hunt (VERDICT r14 item 2): the driver's CORRECTNESS_r14
# flagged c12_snapshot_delete_restore / c13_snapshot_delete_mor with
# hash_match=false at sf0.01 (rows/schema matched) — not reproducible in
# isolated re-runs. This loops the full stage→DML→read pipeline in FRESH
# JVMs at the driver's oracle scale (sf0.01), across thread counts, and
# byte-diffs every run's result against the first.
#
# Usage: scripts/c12_determinism_loop.sh [N_PER_CPUS]   (default 10 → 20 total)
set -uo pipefail
cd "$(dirname "$0")/.."
N="${1:-10}"
SF=/root/testdata/sf0.01
CP="target/scala-2.13/classes:/opt/spark/jars/*"
WORK=$(mktemp -d /tmp/c12loop.XXXX)
echo "workdir: $WORK"
fail=0
for cpus in 4 32; do
  for i in $(seq 1 "$N"); do
    out="$WORK/run_${cpus}_${i}"
    SPARK_GRAFT_CPUS=$cpus java -XX:+IgnoreUnrecognizedVMOptions \
      --add-opens=java.base/java.lang=ALL-UNNAMED \
      --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
      --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
      --add-opens=java.base/java.io=ALL-UNNAMED \
      --add-opens=java.base/java.net=ALL-UNNAMED \
      --add-opens=java.base/java.nio=ALL-UNNAMED \
      --add-opens=java.base/java.util=ALL-UNNAMED \
      --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
      --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
      --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
      --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
      --add-opens=java.base/sun.security.action=ALL-UNNAMED \
      --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
      -cp "$CP" graft.Verify "$SF" "$out" \
      c12_snapshot_delete_restore,c13_snapshot_delete_mor \
      >"$out.log" 2>&1
    rc=$?
    if [ $rc -ne 0 ]; then echo "RUN cpus=$cpus i=$i: JVM exit $rc"; fail=1; continue; fi
    # content hash: sorted row dump of each result (python+duckdb, dev-only)
    python3 - "$out" <<'EOF' > "$out.hash"
import sys, duckdb, hashlib
out = sys.argv[1]
con = duckdb.connect()
for q in ("c12_snapshot_delete_restore", "c13_snapshot_delete_mor"):
    rel = con.sql(f"SELECT * FROM read_parquet('{out}/{q}/*.parquet') ORDER BY ALL")
    h = hashlib.sha256(repr(rel.fetchall()).encode()).hexdigest()
    print(q, h)
EOF
    if [ ! -f "$WORK/expected.hash" ]; then
      cp "$out.hash" "$WORK/expected.hash"
      echo "baseline (cpus=$cpus i=$i):"; cat "$WORK/expected.hash"
    elif ! diff -q "$WORK/expected.hash" "$out.hash" >/dev/null; then
      echo "MISMATCH cpus=$cpus i=$i:"; diff "$WORK/expected.hash" "$out.hash"
      fail=1
    else
      echo "ok cpus=$cpus i=$i"
      rm -rf "$out" "$out.log"
    fi
  done
done
[ $fail -eq 0 ] && echo "DETERMINISTIC: all runs byte-identical" || echo "NON-DETERMINISM FOUND (artifacts kept in $WORK)"
exit $fail
