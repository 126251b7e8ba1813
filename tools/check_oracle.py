#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name, and compares row counts, schema
and values. Dev tool only — the engine itself never depends on this.
"""
import datetime
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v) -> str:
    """Type-aware cell rendering: decimal.Decimal vs numpy.float64 must NOT
    compare equal (the driver hashes cell objects, so they don't there
    either). Nulls normalize (None vs NaN is representation, not value), and
    so do date-vs-midnight-timestamp (the driver's r01 run hash-matched q14
    across exactly that pairing, so its comparison treats them as equal)."""
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        v = pd.Timestamp(v)
    return f"{type(v).__name__}:{v!r}"


def frame_hash(df: pd.DataFrame) -> str:
    # driver semantics: sort columns by name, sort rows by all columns
    # (this is exactly where array cells crash the driver — an ERR here
    # reproduces an ERR there), then hash cell objects.
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            h.update(cell(v).encode())
            h.update(b";")
        h.update(b"|")
    return h.hexdigest()


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
        # the driver reads the Spark parquet with pandas (NOT duckdb):
        # parquet DECIMAL arrives as decimal.Decimal objects, while the
        # duckdb oracle side arrives float64 — reading both through duckdb
        # would mask exactly that class of mismatch.
        got = pd.concat([pd.read_parquet(f) for f in files],
                        ignore_index=True)
        want = con.execute(oracle[name]).fetchdf()
        status, detail = "PASS", ""
        if sorted(got.columns) != sorted(want.columns):
            status = "FAIL"
            detail = f"cols {sorted(got.columns)} != {sorted(want.columns)}"
        elif len(got) != len(want):
            status, detail = "FAIL", f"rows {len(got)} != {len(want)}"
        else:
            try:
                hg, hw = frame_hash(got), frame_hash(want)
            except Exception as e:              # driver-harness ERR analog
                status, detail = "ERR", f"{type(e).__name__}: {e}"
            else:
                if hg != hw:
                    status, detail = "FAIL", "hash mismatch"
                    for c in sorted(got.columns):
                        if frame_hash(got[[c]]) != frame_hash(want[[c]]):
                            gv = got[c].iloc[0] if len(got) else None
                            wv = want[c].iloc[0] if len(want) else None
                            detail += (f" [{c}: {cell(gv)} vs {cell(wv)}]")
        print(f"{status:7}  {name} {detail}")
        n_pass += status == "PASS"
        n_fail += status != "PASS"
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
