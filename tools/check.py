#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only; the
engine itself never uses Python). Runs graft.Verify output against DuckDB
executing SparkEntry.oracleSql on the same parquet tables, then compares.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark_result(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    # Concatenate all part files in sorted order — don't silently depend on
    # Verify's coalesce(1) producing a single part.
    tables = [pq.read_table(f) for f in sorted(files)]
    return pd.concat([t.to_pandas() for t in tables], ignore_index=True)

def canon(df):
    # column-name-sorted, like the driver; values stringified with rounding guard
    df = df[sorted(df.columns)]
    return df

def compare(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = canon(spark_df), canon(duck_df)
    # Driver-hash parity: the driver stringifies values before hashing, so an
    # int64 Spark column rendered against a float64 DuckDB column ("1" vs
    # "1.0") hash-mismatches even though 1 == 1.0 here. DuckDB promotes
    # sum(BIGINT) to HUGEINT (→ float64 in pandas); any oracle whose final
    # SELECT leaves such a column uncast fails the driver gate (r16:
    # q297/q302/q308). Flag int-vs-float dtype-kind divergence as a failure.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        num = set("iuf")
        if ka in num and kb in num and (ka in "iu") != (kb in "iu"):
            problems.append(
                f"dtype kind mismatch col={c}: spark={a[c].dtype} duck={b[c].dtype}"
                " (driver hash renders these differently, e.g. 1 vs 1.0 —"
                " CAST the oracle column to BIGINT)")
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if pd.isna(x) and pd.isna(y):
                continue
            if x != y:
                problems.append(f"value mismatch col={c} row={i}: spark={x!r} duck={y!r}")
                if len(problems) > 5:
                    return problems
    return problems

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_df = load_spark_result(outdir, name)
        if spark_df is None:
            print(f"[MISS] {name}: no spark parquet output")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}")
            n_bad += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"[FAIL] {name}:")
            for p in problems[:6]:
                print(f"       {p}")
            n_bad += 1
        else:
            print(f"[ ok ] {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
