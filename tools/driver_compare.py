#!/usr/bin/env python3
"""Pandas-path mirror of the driver's correctness gate (the harness the
driver actually runs): Spark result parquet -> pyarrow -> pandas, oracle SQL
-> duckdb .df() -> pandas, columns sorted by name, rows via sort_values,
then exact value comparison. tools/compare.py routes BOTH sides through
DuckDB's value space, which hides dtype-rendering divergence (DOUBLE repr,
DECIMAL objects, TIMESTAMP tz-awareness) that the driver's pandas path
surfaces -- this script catches those before the driver does.

Usage: driver_compare.py <sfDir> <outDir> [query ...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    """Model of the driver's value canonicalization, calibrated against
    CORRECTNESS_r07: int32 vs int64 and date vs timestamp[ns/us] compare
    equal (those queries were driver-green), but int vs float and Decimal
    vs float do NOT (those were the driver-red signatures)."""
    import datetime
    import numpy as np
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return ("f", repr(float(v)))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # driver crashes on array cells (q_hashing_tf r7) -- mimic
        raise TypeError("unhashable type: array cell")
    return ("o", repr(v))


def compare(s_df, d_df):
    if sorted(s_df.columns) != sorted(d_df.columns):
        return f"columns {sorted(s_df.columns)} vs {sorted(d_df.columns)}"
    if len(s_df) != len(d_df):
        return f"rows {len(s_df)} vs {len(d_df)}"
    s_rows = sorted(tuple(cell(v) for v in row)
                    for row in s_df[sorted(s_df.columns)].itertuples(
                        index=False, name=None))
    d_rows = sorted(tuple(cell(v) for v in row)
                    for row in d_df[sorted(d_df.columns)].itertuples(
                        index=False, name=None))
    if s_rows != d_rows:
        bad = [(s, d) for s, d in zip(s_rows, d_rows) if s != d][:3]
        return f"values {bad}"
    return None


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            s_df = load_spark(out_dir, name)
            d_df = con.sql(sql).df()
            err = compare(s_df, d_df)
        except Exception as e:
            err = f"EXC {type(e).__name__}: {e}"
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"pass {n_pass} fail {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
