#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Loads <outdir>/oracle_sql.json, registers the sf parquet tables as DuckDB
views, runs each oracle, and compares against the Spark-written parquet in
<outdir>/<name>/ — columns sorted by name, rows sorted, exact value compare
(with a tiny float report to distinguish hash-breaking from cosmetic).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sfdir: str, outdir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype != b.dtype:
                bad_cols.append(f"{c} dtype {a.dtype}!={b.dtype}")
                continue
            if a.dtype.kind == "f":
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    d = (a - b).abs().max()
                    bad_cols.append(f"{c} float maxdiff={d}")
            else:
                eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
                if not eq.all():
                    i = (~eq).idxmax()
                    bad_cols.append(f"{c} first-mismatch row{i}: {a[i]!r} vs {b[i]!r}")
        if bad_cols:
            print(f"FAIL {name}: {'; '.join(bad_cols)}"); n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
