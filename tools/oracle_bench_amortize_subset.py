#!/usr/bin/env python3
"""Amortize-mode oracle timing for ONLY the queries whose SQL the
--amortize rewrite actually changes (the warehouse consumers), plus the
two warehouse builds.

The full --amortize run re-times all 179 queries, but 171 of them have
byte-identical SQL in both modes — at sf1 that's hours of redundant
DuckDB work. This tool times just the rewritten consumers; an amortized
TOTAL is then default_total - sum(default[consumers]) +
sum(amortized[consumers]) (builds reported separately, the BASELINE.md
convention). Emits {"queries": {...}, "warehouse_build_sec": {...},
"rewritten": [...]}.
"""
import json
import sys
import time

import duckdb

from oracle_bench import TABLES, amortize


def main() -> None:
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rewritten, builds = amortize(con, oracles)
    changed = sorted(n for n in rewritten if rewritten[n] != oracles[n])
    times = {}
    for name in changed:
        sql = rewritten[name]
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
    print(json.dumps({"queries": times, "warehouse_build_sec": builds,
                      "rewritten": changed}))


if __name__ == "__main__":
    main()
