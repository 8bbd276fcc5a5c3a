#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the sf dir's parquet tables and compares
against the parquet dumped by graft.Verify. Dev tool only — the library itself
is pure Scala/Spark.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        # the driver's gate hashes VALUES: an int64 column on one side and a
        # float64 on the other renders "123" vs "123.0" and hash-mismatches
        # even when assert_frame_equal (check_dtype=False) passes. The classic
        # source is DuckDB sum(BIGINT) -> HUGEINT -> pandas float64; fix the
        # oracle with CAST(... AS BIGINT). Flag it here so it never reaches
        # the driver.
        dtype_risk = [c for c in g.columns
                      if (g[c].dtype.kind in "iu") != (w[c].dtype.kind in "iu")
                      and {g[c].dtype.kind, w[c].dtype.kind} & {"f"}]
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            if dtype_risk:
                print(f"WARN {name}: int-vs-float dtype on {dtype_risk} — "
                      f"values equal here but the driver's value-hash may differ")
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            # show first differing cells
            for c in g.columns:
                neq = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i} got={g[c][i]!r} want={w[c][i]!r}")
            failures += 1
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
