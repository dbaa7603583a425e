#!/usr/bin/env python3
"""Stricter replica of the driver's EXACT hash comparison (dev tool).

Unlike check.py (tolerance-based), this mimics what the driver gate does:
sort columns by name, canonical-sort rows, stringify every value, and
require byte equality. Catches DuckDB HUGEINT/float typing artifacts that
tolerance comparison absorbs. Usage: check_exact.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_str(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            # the driver hashes a fixed-precision rendering; mimic with
            # repr at float64 precision
            out[c] = s.map(lambda v: "null" if pd.isna(v) else repr(float(v)))
        elif np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.astype(str)
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracles):
        duck = con.execute(oracles[name]).df()
        spark = pd.read_parquet(f"{out_dir}/{name}")
        if sorted(duck.columns) != sorted(spark.columns):
            print(f"FAIL {name}: SCHEMA {sorted(spark.columns)} vs {sorted(duck.columns)}")
            fails += 1
            continue
        # dtype-level mismatch between engines is exactly what the exact
        # hash trips on — flag int-vs-float before value compare
        s, d = canon_str(spark), canon_str(duck)
        for c in s.columns:
            sd, dd = spark[c].dtype, duck[c].dtype
            si = np.issubdtype(sd, np.integer)
            di = np.issubdtype(dd, np.integer)
            sf = np.issubdtype(sd, np.floating)
            df_ = np.issubdtype(dd, np.floating)
            if (si and df_) or (sf and di):
                print(f"FAIL {name}: DTYPE col={c} spark={sd} duck={dd}")
                fails += 1
                break
        else:
            if len(s) != len(d):
                print(f"FAIL {name}: ROWS {len(s)} vs {len(d)}")
                fails += 1
                continue
            neq = None
            for c in s.columns:
                eq = (s[c] == d[c])
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    neq = (c, i, s[c].iloc[i], d[c].iloc[i])
                    break
            if neq:
                c, i, a, b = neq
                print(f"FAIL {name}: VALUE col={c} row={i} spark={a!r} duck={b!r}")
                fails += 1
    print(f"== exact: {len(oracles) - fails} pass / {fails} fail ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
