#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the bench comparator (PERF.md header).

Runs every query of <verify_out>/oracle_sql.json against the parquet
tables under <sf_dir> in embedded DuckDB, one warmup pass then K timed
passes per query (median reported, same protocol as graft.Bench), and
writes one JSON line with per-query seconds plus /proc/loadavg stamps.

Usage: python3 scripts/duckbench.py <verify_out_dir> <sf_dir> [out.json]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
PASSES = 3


def loadavg():
    try:
        with open("/proc/loadavg") as f:
            return " ".join(f.read().split()[:3])
    except OSError:
        return ""


def main(out_dir, sf_dir, out_file):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written replicas
        # (e.g. the ScaleSmoke 10x set) are part-file DIRECTORIES
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    load0 = loadavg()
    wall0 = time.time()
    times = {}
    for name, sql in sorted(oracle.items()):
        try:
            con.sql(sql).fetchall()  # warmup (buffer cache, plan)
            passes = []
            for _ in range(PASSES):
                t0 = time.time()
                con.sql(sql).fetchall()
                passes.append(time.time() - t0)
            times[name] = statistics.median(passes)
        except Exception as e:  # noqa: BLE001 - record, keep benching
            print(f"FAIL {name}: {e}", file=sys.stderr)
            times[name] = -1.0
    ok = {k: v for k, v in times.items() if v >= 0}
    out = {
        "metric": "duckdb_total", "value": sum(ok.values()), "unit": "sec",
        "n_queries": len(ok), "n_failed": len(times) - len(ok),
        "queries": times, "passes": PASSES,
        "loadavg_start": load0, "loadavg_end": loadavg(),
        "wall_sec": time.time() - wall0, "sf": sf_dir,
    }
    with open(out_file, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "/tmp/duckbench.json")
