#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Replays the expected normalization: for each query in
<verifyOutDir>/oracle_sql.json, load the Spark result parquet from
<verifyOutDir>/<name>/, run the oracle SQL in DuckDB with views over the
same testdata parquet tables, sort columns by name, sort rows, round
floats, and diff. Prints MATCH/MISMATCH per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ROUND = 6


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, ROUND)
        return 0.0 + r  # normalize -0.0
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"{name:24s} NO-SPARK-RESULT {e}")
            n_bad += 1
            continue
        try:
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"{name:24s} ORACLE-SQL-ERROR {str(e)[:160]}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name:24s} COLUMN-MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_bad += 1
            continue
        sc, s_norm = norm_rows(s_cols, s_rows)
        dc, d_norm = norm_rows(d_cols, d_rows)
        if s_norm == d_norm:
            print(f"{name:24s} MATCH rows={len(s_norm)}")
            n_ok += 1
        else:
            n_bad += 1
            print(f"{name:24s} MISMATCH spark_rows={len(s_norm)} duck_rows={len(d_norm)}")
            sset, dset = set(s_norm), set(d_norm)
            for r in list(sset - dset)[:3]:
                print(f"   spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"   duck-only:  {r}")
            if len(s_norm) == len(d_norm):
                for a, b in zip(s_norm, d_norm):
                    if a != b:
                        print(f"   first-diff: spark={a}")
                        print(f"               duck ={b}")
                        break
    print(f"== {n_ok} match, {n_bad} mismatch ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
