#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <name>.parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares values column-name-sorted. NOT part of
the shipped Scala library — it exists so oracle mismatches surface
before the driver runs the real gate.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def array_cols(df: pd.DataFrame) -> list:
    """Columns holding list/array/struct cells. The DRIVER's comparator
    does NOT stringify these — pandas sort_values dies on unhashable
    numpy.ndarray before any value compare (CORRECTNESS_r08: six err
    rows). This mirror must fail exactly where the driver fails, so
    any non-scalar result column is a hard FAIL here, never silently
    canonicalized (the r8 lesson: a lenient local gate let six
    array-output queries ship "green").
    """
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            probe = df[c].dropna().head(5)
            if any(hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                   for v in probe):
                bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes BEFORE sorting: timestamps -> iso str, floats ->
    # repr. Array/struct cells never reach here — array_cols() fails
    # the query first, matching the driver's crash.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_bad = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # A registered oracle whose dump is ABSENT means graft.Verify
    # errored on that query ("[verify] <name> failed: ..." on stderr)
    # — silently skipping it once hid a broken query behind "ALL OK".
    # Only flag on FULL runs: a SPARK_GRAFT_ONLY-filtered Verify
    # legitimately dumps a subset (detected here as >20% absent).
    absent = sorted(set(oracles) - set(names))
    if absent and len(absent) <= max(1, len(oracles) // 5):
        for name in absent:
            print(f"FAIL {name}: registered oracle but NO dump "
                  f"(graft.Verify errored — check its stderr)")
            n_bad += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        spark_df = pd.concat(pd.read_parquet(f) for f in sorted(files))
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        arr = sorted(set(array_cols(spark_df)) | set(array_cols(duck_df)))
        if arr:
            print(f"FAIL {name}: array-typed result column(s) {arr} — "
                  f"the driver comparator crashes on these; reshape to "
                  f"scalar (explode or array_join)")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        # Driver hashes value REPRS: int64 7 vs float64 7.0 mismatch
        # (DuckDB SUM(BIGINT)->HUGEINT->float64 is the classic cause).
        kind_bad = [c for c in a.columns
                    if a[c].dtype.kind != b[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch {[(c, str(a[c].dtype), str(b[c].dtype)) for c in kind_bad]}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e).splitlines()[-1]}")
            diff = (a != b) & ~(a.isna() & b.isna())
            rows = diff.any(axis=1)
            print(a[rows].head(3))
            print(b[rows].head(3))
            n_bad += 1
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
