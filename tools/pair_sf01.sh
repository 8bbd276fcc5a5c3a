#!/usr/bin/env bash
# Same-window sf0.1 bench pair: Spark full registry (full warm-min-of-3
# protocol), then BOTH DuckDB modes, back-to-back.
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
echo "[pair01] spark bench start $(date -u +%H:%M:%S)"
sbt -batch "runMain graft.Bench" > /tmp/pair01_spark.log 2>&1
echo "[pair01] spark bench done rc=$? $(date -u +%H:%M:%S)"
cp BENCH_FULL.json /tmp/bench_sf01_spark.json 2>/dev/null
echo "[pair01] duckdb default start $(date -u +%H:%M:%S)"
python3 tools/oracle_bench.py /root/testdata/sf0.1 /tmp/vout_sql/oracle_sql.json \
  > /tmp/duck_sf01_default.json 2>/tmp/duck_sf01_default.err
echo "[pair01] duckdb default rc=$? $(date -u +%H:%M:%S)"
echo "[pair01] duckdb amortize start $(date -u +%H:%M:%S)"
python3 tools/oracle_bench.py /root/testdata/sf0.1 /tmp/vout_sql/oracle_sql.json --amortize \
  > /tmp/duck_sf01_amortize.json 2>/tmp/duck_sf01_amortize.err
echo "[pair01] duckdb amortize rc=$? $(date -u +%H:%M:%S)"
echo "[pair01] ALL DONE"
