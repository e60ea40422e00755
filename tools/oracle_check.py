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


def cmp_types(spark_rel, oracle_rel):
    """DuckDB-level type compatibility, keyed by column name, modeling the
    DRIVER's hash behavior (it converts both sides through pandas, then
    hashes values).  Types in the same pandas-coercion class hash equal:

      - TINYINT..BIGINT all become Python ints   -> one INT class
        (verified: r06 driver PASSED 6 queries with spark=INTEGER vs
        oracle=BIGINT)
      - DATE and TIMESTAMP* both become datetime64 -> one TS class
        (r06 driver PASSED month_start TIMESTAMP-vs-DATE)
      - HUGEINT is NOT in the INT class: duckdb->pandas coerces int128 to
        float64, so an un-cast sum(INT) OVER (...) hash-FAILS against a
        Spark int64 even when every value is equal — exactly how
        q_merge_intervals shipped red in r06.  Flagged here so the oracle
        SQL gets a CAST before the driver ever sees it.
    """
    INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
    def norm(t):
        t = str(t).upper()
        if t in INTS:
            return "INT"
        if t == "DATE" or t.startswith("TIMESTAMP"):
            return "TS"
        return t
    a = {c: norm(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
    b = {c: norm(t) for c, t in zip(oracle_rel.columns, oracle_rel.types)}
    bad = [f"{c}: spark={a[c]} oracle={b[c]}"
           for c in sorted(set(a) & set(b)) if a[c] != b[c]]
    return ("type mismatch: " + "; ".join(bad)) if bad else None


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
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            oracle_rel = con.sql(sql)
            # Type-strict gate: the driver's hash encodes physical type width
            # (e.g. DuckDB types un-cast sum(INT) OVER (...) as HUGEINT while
            # Spark writes int64), and pandas silently coerces that away.
            # Compare DuckDB-level types per column BEFORE the value compare.
            err = cmp_types(spark_rel, oracle_rel)
            spark_df = spark_rel.df()
            if err is None:
                err = cmp_frames(spark_df, oracle_rel.df(), name)
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
