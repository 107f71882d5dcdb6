#!/usr/bin/env python3
"""Local oracle-parity harness (driver-side tooling, not part of the
library). Mimics the driver's correctness gate: runs each oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables and compares the
result against the Spark output parquet written by graft.Verify.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).find("ndarray") >= 0 else v)
        elif str(df[c].dtype).startswith("float32"):
            df[c] = df[c].astype("float64")
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one FILE per table; GenScale's scale dirs
        # (sf1.0/sf10) are 32-part DIRECTORIES at the same name
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    only_set = {s for s in only.split(",") if s} if only else None
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        # SPARK_GRAFT_ONLY narrows the checked subset, mirroring Verify's
        # dump filter — stale dumps for out-of-subset names are ignored.
        if only_set is not None and name not in only_set:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            # Missing output for an in-subset name means the Spark side
            # crashed in Verify — that must count as FAIL, not vanish.
            n_fail += 1
            print(f"FAIL {name}: missing Spark output dir (query crashed in Verify?)")
            continue
        try:
            want = normalize(con.execute(sql).df())
            got = normalize(pd.read_parquet(f"{out_dir}/{name}"))
            if list(want.columns) != list(got.columns):
                print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if len(want) != len(got):
                print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
                n_fail += 1
                continue
            # order-sensitive compare first; fall back to sorted compare
            eq = want.reset_index(drop=True).equals(got.reset_index(drop=True))
            mode = "ordered"
            if not eq:
                sw = want.sort_values(list(want.columns)).reset_index(drop=True)
                sg = got.sort_values(list(got.columns)).reset_index(drop=True)
                eq = sw.equals(sg)
                mode = "sorted-only" if eq else "mismatch"
            if eq:
                n_pass += 1
                tag = "" if mode == "ordered" else f"  [{mode}]"
                print(f"PASS {name} ({len(want)} rows){tag}")
            else:
                n_fail += 1
                print(f"FAIL {name}: value mismatch ({len(want)} rows)")
                merged = want.compare(got) if want.shape == got.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
