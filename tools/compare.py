#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet under OUT_DIR, run the oracle SQL from oracle_sql.json in DuckDB over
the same sf dir's parquet tables, sort columns by name + rows, and compare.

Usage: compare.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            d_cols, d_rows = canon(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
        elif s_rows != d_rows:
            n_fail += 1
            print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows")
            diff_a = [r for r in s_rows if r not in set(d_rows)][:3]
            diff_b = [r for r in d_rows if r not in set(s_rows)][:3]
            print(f"  spark-only: {diff_a}")
            print(f"  duck-only:  {diff_b}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
