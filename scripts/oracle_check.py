#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with every <sfDir>/*.parquet
registered as a view. Compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # NOTE: integer dtypes are deliberately NOT widened/normalized —
        # the driver hashes TYPED values, so a Spark INT32 column vs an
        # oracle BIGINT is exactly the drift this replica must surface.
        # Cast integer outputs to BIGINT on BOTH sides; the strict dtype
        # compare in main() enforces it.
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
            try:
                import datetime
                if df[c].map(lambda v: isinstance(v, datetime.date) or v is None).all():
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Verify emits every SQL under both "<name>" and "<name>.parquet" (the
    # driver keys its CORRECTNESS report by the result file name); collapse
    # to the bare name here so each query is checked once.
    oracles = {k[:-len(".parquet")] if k.endswith(".parquet") else k: v
               for k, v in oracles.items()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}.parquet")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # The driver hashes TYPED values: a DuckDB HUGEINT (un-cast integer
            # SUM) vs Spark BIGINT hash-mismatches even when values agree.
            # Round 2 shipped exactly this bug twice — fail it locally.
            wide = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")]
            if wide:
                print(f"FAIL {name}: oracle emits 128-bit int column(s) {wide} — "
                      f"add CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1
                continue
            want = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
            n_fail += 1
            continue
        bad_dtypes = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                      if str(g[c].dtype) != str(w[c].dtype)]
        if bad_dtypes:
            print(f"FAIL {name}: dtype drift (spark vs oracle) {bad_dtypes}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracles)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
