#!/usr/bin/env python3
"""Time every registered oracle SQL in DuckDB over the same parquet tables.

Usage: python3 tools/oracle_bench.py <sf_dir> <oracle_sql.json from Verify>
Prints one JSON line: {"total": s, "queries": {name: s, ...}}

Protocol mirrors graft.Bench exactly: threads=32, one warmup execution per
query, then THREE timed executions reported as their MIN (round 11: the
Spark side made its third pass unconditional, so the oracle side matches) —
the same contention-spike rejection on both engines, so neither total
absorbs a shared-host load spike the other discards. fetchall() forces full
materialization.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
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
    print(json.dumps({"total": total, "queries": times}))


if __name__ == "__main__":
    main()
