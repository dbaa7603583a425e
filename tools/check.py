#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only; the
Scala library never uses Python). Runs each oracle SQL from
<outDir>/oracle_sql.json in DuckDB over the fixture parquet tables, loads the
corresponding Spark result parquet, canonical-sorts both, and compares
(float columns to tolerance). Usage: check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if np.issubdtype(sc.dtype, np.datetime64) or np.issubdtype(dc.dtype, np.datetime64):
            # timestamps compare as strings (an all-NULL side arrives as
            # float64 NaN from DuckDB — astype(float) on the datetime side
            # would throw); NaT == NaN == null
            eq = (sc.astype(str) == dc.astype(str)) | (sc.isna() & dc.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return f"VALUE col={c} row={i} spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
        elif np.issubdtype(sc.dtype, np.floating) or np.issubdtype(dc.dtype, np.floating):
            sa = sc.astype(float).to_numpy()
            da = dc.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(da)
            close = np.isclose(sa, da, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                return f"VALUE col={c} row={i} spark={sa[i]} duck={da[i]}"
        else:
            eq = (sc.astype(str) == dc.astype(str))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return f"VALUE col={c} row={i} spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
    return None


def _connect(sf_dir, memlimit):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memlimit}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Bound DuckDB's allocator: at sf1 the unbounded default (80% RAM)
    # plus pandas canon-sort spikes can exhaust the box mid-gate (the r6
    # "allocation errors cascade" failure mode) — a limit makes DuckDB
    # spill instead. Derived from RAM so the cap only ever TIGHTENS
    # DuckDB's own default (a flat 48GB would raise it on small hosts).
    # Override with GRAFT_CHECK_MEMLIMIT.
    import os as _os
    try:
        ram_gb = _os.sysconf("SC_PAGE_SIZE") * _os.sysconf("SC_PHYS_PAGES") / 2**30
        default = f"{max(1, min(48, int(ram_gb * 0.5)))}GB"
        # standalone-retry cap: the r6/r8 gates both saw exactly one
        # oracle (graph_pagerank's 10-round CTE replay at sf1) fail under
        # the shared cap by spilling past the box's free disk, then
        # value-match when re-run alone with more headroom. The retry
        # below automates that re-run: fresh connection, ~80% of RAM.
        retry_limit = f"{max(1, int(ram_gb * 0.8))}GB"
    except (ValueError, OSError):
        default = "4GB"
        retry_limit = "8GB"
    memlimit = _os.environ.get("GRAFT_CHECK_MEMLIMIT", default)
    # When the operator EXPLICITLY capped DuckDB (shared box), the
    # automatic retry must not burst past that cap — retry at the same
    # limit (a fresh connection alone often clears spill-file poisoning).
    # GRAFT_CHECK_RETRY_MEMLIMIT overrides the retry cap either way.
    if "GRAFT_CHECK_MEMLIMIT" in _os.environ:
        retry_limit = memlimit
    retry_limit = _os.environ.get("GRAFT_CHECK_RETRY_MEMLIMIT", retry_limit)
    con = _connect(sf_dir, memlimit)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GRAFT_CHECK_SKIP=a,b demotes named oracles to rows-only checks (dev
    # lever for sf1 runs where a DuckDB-side oracle is O(hours) — e.g. the
    # graph wedge joins; the Spark side still runs and row-checks)
    import os
    skip = set(filter(None,
        os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    oracle = {k: v for k, v in oracle.items() if k not in skip}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            # One automatic standalone retry on a FRESH connection at the
            # raised cap (an errored connection can hold spill files and
            # partial allocations that poison subsequent oracles too).
            print(f"RETRY {name}: oracle error under memory_limit="
                  f"{memlimit}: {e}", flush=True)
            try:
                con.close()
                con = _connect(sf_dir, retry_limit)
                duck = con.execute(sql).fetchdf()
            except Exception as e2:
                print(f"FAIL {name}: oracle error (after standalone retry "
                      f"at {retry_limit}): {e2}")
                n_fail += 1
                con.close()
                con = _connect(sf_dir, memlimit)
                continue
            finally:
                # back to the shared cap for the remaining oracles
                try:
                    con.execute(f"SET memory_limit='{memlimit}'")
                except Exception:
                    pass
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        err = compare(name, spark, duck)
        n_rows = len(spark)
        del duck, spark  # release before the next oracle's frames
        if err:
            print(f"FAIL {name}: {err}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({n_rows} rows)", flush=True)
            n_pass += 1
    # rows-only checks for queries without oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only, {n} rows)")
                if n > 0:
                    n_pass += 1
                else:
                    n_fail += 1
            except Exception as e:
                print(f"FAIL {name} (rows-only): {e}")
                n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
