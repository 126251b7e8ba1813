#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name, and compares row counts, schema
and values. Dev tool only — the engine itself never depends on this.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else
                (tuple(v) if isinstance(v, list) else v))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        want = norm(con.execute(oracle[name]).fetchdf())
        status, detail = "PASS", ""
        if list(got.columns) != list(want.columns):
            status, detail = "FAIL", f"cols {list(got.columns)} != {list(want.columns)}"
        elif len(got) != len(want):
            status, detail = "FAIL", f"rows {len(got)} != {len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status, detail = "FAIL", str(e).split("\n")[0]
            for c in got.columns:          # dtype drift worth knowing about
                if str(got[c].dtype) != str(want[c].dtype) and status == "PASS":
                    detail += f" [dtype {c}: {got[c].dtype} vs {want[c].dtype}]"
        print(f"{status:7}  {name} {detail}")
        n_pass += status == "PASS"
        n_fail += status != "PASS"
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
