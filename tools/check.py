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
        # the driver's gate hashes TYPED values: an int64 column on one side
        # and a float64 on the other renders "123" vs "123.0"; a DECIMAL
        # against a DOUBLE renders "0.123000000" vs "0.123" — both
        # hash-mismatch even when every value is numerically equal (the
        # round-8/9 q_media_features defect: pandas .df() flattened DECIMAL
        # to float64, so the old frame-level compare could not see it).
        # Compare the DuckDB-level types of both relations and FAIL on any
        # numeric-class divergence.
        def tclass(t: str) -> str:
            t = t.upper()
            if t.startswith("DECIMAL"):
                return "decimal"
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE", "REAL"):
                return "float"
            return t
        got_rel = con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
        want_rel = con.sql(sql)
        gt = {c: tclass(str(t)) for c, t in zip(got_rel.columns, got_rel.types)}
        wt = {c: tclass(str(t)) for c, t in zip(want_rel.columns, want_rel.types)}
        numeric = {"int", "float", "decimal"}
        type_fail = [c for c in gt
                     if gt[c] != wt.get(c) and (gt[c] in numeric or wt.get(c) in numeric)]
        if type_fail:
            print(f"FAIL {name}: numeric type class mismatch "
                  f"{[(c, gt[c], wt.get(c)) for c in type_fail]} — "
                  f"the driver's typed value-hash will differ even if values match")
            failures += 1
            continue
        dtype_risk = [c for c in gt if gt[c] != wt.get(c)]
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            if dtype_risk:
                print(f"WARN {name}: non-numeric type class differs on "
                      f"{[(c, gt[c], wt.get(c)) for c in dtype_risk]}")
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
    # SURVEY contract hygiene: the §2 footer states the oracle-query count;
    # a stale number there is a doc defect (the round-10 "84 queries" slip).
    import re
    from pathlib import Path
    try:
        with open(Path(__file__).resolve().parent.parent / "SURVEY.md") as f:
            m = re.search(r"\*\*(\d+) oracle-checked queries", f.read())
        if m and int(m.group(1)) != len(oracles):
            print(f"FAIL SURVEY.md footer: states {m.group(1)} oracle-checked "
                  f"queries, registry has {len(oracles)}")
            failures += 1
    except OSError as e:
        print(f"WARN could not check SURVEY.md footer count: {e}")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
