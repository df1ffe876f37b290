#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir> [--json out.json]

With --json, also writes a driver-CORRECTNESS-style artifact: per-query
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err} plus
a run-evidence block (timestamp, git SHA, sf dir).

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

def main(sfdir: str, outdir: str, json_out: str = None) -> None:
    report = {}
    def record(name, rows_match, schema_match, hash_match, sr, orr, err):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            record(name, False, False, False, 0, 0, "no spark output"); continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            record(name, False, False, False, 0, 0, str(e)[:200]); continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            n_bad += 1
            record(name, len(got) == len(exp), False, False, len(got), len(exp),
                   "schema mismatch"); continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); n_bad += 1
            record(name, False, True, False, len(got), len(exp), "row count"); continue
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
            record(name, True, True, False, len(got), len(exp),
                   "; ".join(bad_cols)[:200])
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
            record(name, True, True, True, len(got), len(exp), None)
    print(f"== {n_ok} ok, {n_bad} bad ==")
    if json_out:
        import subprocess, time
        try:
            sha = subprocess.run(["git", "rev-parse", "HEAD"],
                                 capture_output=True, text=True).stdout.strip()
        except OSError:
            sha = None
        report["_run"] = {"run_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                          "git_sha": sha, "sf_dir": sfdir,
                          "n_ok": n_ok, "n_bad": n_bad,
                          "tool": "tools/check_oracle.py"}
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
            f.write("\n")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    jout = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py <sfdir> <outdir> [--json out.json]")
        jout = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) != 2:
        sys.exit("usage: check_oracle.py <sfdir> <outdir> [--json out.json]")
    main(args[0], args[1], jout)
