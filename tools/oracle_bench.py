#!/usr/bin/env python3
"""Time every registered oracle SQL in DuckDB over the same parquet tables.

Usage: python3 tools/oracle_bench.py <sf_dir> <oracle_sql.json from Verify> [--amortize]
Prints one JSON line: {"total": s, "queries": {name: s, ...}}

Protocol mirrors graft.Bench exactly: threads=32, one warmup execution per
query, then THREE timed executions reported as their MIN (round 11: the
Spark side made its third pass unconditional, so the oracle side matches) —
the same contention-spike rejection on both engines, so neither total
absorbs a shared-host load spike the other discards. fetchall() forces full
materialization.

--amortize: WAREHOUSE PARITY mode. The Spark side reads two derived
relations — the co-purchase edge table (6 graph queries) and the near-dup
pair table (q_dedup_clusters / q_dedup_keep) — from materialized-once
parquet (graft.Warehouse): the first consumer per corpus snapshot pays the
build, every later query reads the table. The default mode makes DuckDB
re-derive those relations inside every consumer execution — measuring
different work on the two engines for ~8 queries. With --amortize, DuckDB
gets the SAME contract: the two relations are built ONCE as temp tables
(build times reported separately under "warehouse_build_sec"), and the
consumer oracles read them via verbatim text substitution of the embedded
pipeline (the relation algebra is unchanged — same rows, same consumers).
q_dedup_minhash itself stays live in both engines: it IS the benchmark of
the pair build.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The canonical co-purchase edge pipeline every graph oracle embeds
# (mirrors graft.operators.Graph.copurchaseEdgesBuild).
EDGE_BODY = ("SELECT DISTINCT a.p AS u, b.p AS v FROM pl a "
             "JOIN pl b ON a.ok = b.ok AND a.p < b.p")
PL_BODY = "SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem"


def amortize(con, oracles):
    """Materialize the two warehouse relations once; rewrite consumers to
    read them. Returns (rewritten oracles, build-times dict)."""
    builds = {}
    t0 = time.monotonic()
    con.execute(f"CREATE TEMP TABLE wh_edges AS WITH pl AS ({PL_BODY}) {EDGE_BODY}")
    builds["copurchase_edges"] = round(time.monotonic() - t0, 4)
    mh = oracles["q_dedup_minhash"]
    # consumers embed the pair pipeline WITHOUT its trailing ORDER BY
    mh_core = mh.rsplit("ORDER BY", 1)[0].rstrip()
    t0 = time.monotonic()
    con.execute(f"CREATE TEMP TABLE wh_pairs AS {mh}")
    builds["neardup_pairs"] = round(time.monotonic() - t0, 4)
    out = {}
    for name, sql in oracles.items():
        if name in ("q_dedup_clusters", "q_dedup_keep") and mh_core in sql:
            sql = sql.replace(mh_core, "SELECT * FROM wh_pairs")
        elif EDGE_BODY in sql and name != "q_dedup_minhash":
            sql = sql.replace(EDGE_BODY, "SELECT u, v FROM wh_edges")
        out[name] = sql
    return out, builds


def main() -> None:
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    do_amortize = "--amortize" in sys.argv[3:]
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    builds = {}
    if do_amortize:
        oracles, builds = amortize(con, oracles)
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warmup
            samples = []
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                samples.append(time.monotonic() - t0)
            times[name] = round(min(samples), 4)
        except Exception as e:  # noqa: BLE001 - record and continue
            times[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = round(sum(v for v in times.values() if v >= 0), 3)
    rec = {"total": total, "queries": times}
    if do_amortize:
        rec["mode"] = "amortized"
        rec["warehouse_build_sec"] = builds
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
