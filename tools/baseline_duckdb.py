#!/usr/bin/env python3
"""Record DuckDB wall-times per oracle query as the de-facto single-node
baseline (dev tool, driver-side python only — VERDICT r1 asked for a
computable 2x bench gate and BASELINE.md pins no absolute numbers).

Usage: baseline_duckdb.py <sfDir> <verifyOutDir> <out.json>

DuckDB runs each oracle SQL from <verifyOutDir>/oracle_sql.json three times
over the same fixture parquet and keeps the median. Queries without an
oracle are absent. The comparison is honest in DuckDB's favor: it measures
a mature native vectorized engine with zero JVM/session overhead, reading
the same single files.
"""
import json
import os
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # full Spark query key set = the per-query output dirs Verify wrote;
    # queries with no SQL-expressible oracle are recorded explicitly so the
    # baseline and bench files share an identical key set
    all_queries = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    times = {}
    for name in sorted(oracles):
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            con.execute(oracles[name]).fetchall()
            samples.append(time.monotonic() - t0)
            # a >60 s oracle (e.g. the graph wedge joins) is past the
            # point where run-to-run jitter matters; one sample suffices
            if samples[0] > 60.0:
                break
        times[name] = round(statistics.median(samples), 3)
        print(f"{name:28s} {times[name]:8.3f} s")
    doc = {"engine": f"duckdb {duckdb.__version__}", "sf_dir": sf_dir,
           "agg": "median of 3", "total": round(sum(times.values()), 3),
           "queries": times,
           "no_oracle": [q for q in all_queries if q not in oracles]}
    json.dump(doc, open(out_json, "w"), indent=1)
    print(f"total {doc['total']} s -> {out_json}")


if __name__ == "__main__":
    main()
