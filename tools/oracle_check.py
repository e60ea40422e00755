#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf tables,
then compares: columns sorted by name, rows sorted by all columns, exact
cell equality (with a small report of float max-abs-diff on mismatch).
Dev-side only — NOT part of the Scala deliverable.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_frames(a, b, name):
    import pandas as pd
    if sorted(a.columns) != sorted(b.columns):
        return f"column mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    problems = []
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            bad = (~eq)
            detail = ""
            try:
                fa = av[bad].astype(float)
                fb = bv[bad].astype(float)
                detail = f" max|diff|={(fa - fb).abs().max():.3e}"
            except Exception:
                ia = av[bad].head(3).tolist()
                ib = bv[bad].head(3).tolist()
                detail = f" e.g. spark={ia} oracle={ib}"
            problems.append(f"col {c}: {bad.sum()}/{len(a)} cells differ{detail}")
    return "; ".join(problems) if problems else None


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
            err = cmp_frames(spark_df, oracle_df, name)
        except Exception as e:
            err = f"exception: {e}"
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only
    for d in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        if d.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {d.name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
