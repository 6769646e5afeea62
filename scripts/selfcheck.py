#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
the DuckDB oracle and diff per query (row count, sorted-column value match).

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>
(Verify must have been run first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out")
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: determinism contract says bit-identical
    return str(a) == str(b)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written replica dirs vs single files
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
