#!/usr/bin/env python3
"""oracle_bench.py with INCREMENTAL per-query output (one JSON line per
query as it completes, then a final total line). Protocol is identical —
threads=32, 1 warmup + 3 timed, min reported — the only difference is
that a long run killed mid-flight keeps every completed measurement.

Usage: python3 tools/oracle_bench_incremental.py <sf_dir> <oracle_sql.json> [--amortize]
"""
import json
import sys
import time

import duckdb

from oracle_bench import TABLES, amortize


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
        print(json.dumps({"warehouse_build_sec": builds}), flush=True)
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
        print(json.dumps({"q": name, "sec": times[name]}), flush=True)
    total = round(sum(v for v in times.values() if v >= 0), 3)
    rec = {"total": total, "queries": times}
    if do_amortize:
        rec["mode"] = "amortized"
        rec["warehouse_build_sec"] = builds
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
