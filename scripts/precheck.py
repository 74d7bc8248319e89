#!/usr/bin/env python3
"""Dev-only pre-flight mirror of the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark); this just
replays what the driver does each round — run graft.Verify at a given SF,
then execute every oracleSql entry in DuckDB over the same parquet tables
and diff against the Spark result — so mismatches are caught before the
round ends.

Usage: python3 scripts/precheck.py [sfdir] [outdir] [--skip-verify]
"""
import json
import math
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def diff(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return [f"{name}: COLUMNS spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"{name}: ROWS spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            errs.append(f"{name}.{c}: DTYPE spark={sv.dtype} duck={dv.dtype}")
        for i, (a, b) in enumerate(zip(sv.tolist(), dv.tolist())):
            eq = (a == b) or (a is None and b is None)
            try:
                if isinstance(a, float) and isinstance(b, float):
                    eq = (a == b) or (math.isnan(a) and math.isnan(b))
            except TypeError:
                pass
            if not eq and not (pd.isna(a) and pd.isna(b)):
                errs.append(f"{name}.{c}[{i}]: spark={a!r} duck={b!r}")
                if len(errs) > 5:
                    return errs
    return errs


def main() -> int:
    # flags may appear at any position; positionals must skip them
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = positional[0] if len(positional) > 0 else "/root/testdata/sf0.01"
    outdir = positional[1] if len(positional) > 1 else "/tmp/verify_out"
    # dev-only: --only=q01_x,q02_y runs/checks just those queries
    only = None
    for a in sys.argv:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    if "--skip-verify" not in sys.argv:
        names = f" {','.join(sorted(only))}" if only else ""
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}{names}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-3000:])
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            return 1
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        errs = diff(name, spark_df, duck_df)
        if errs:
            n_bad += 1
            print(f"FAIL {name}")
            for e in errs[:6]:
                print("   ", e)
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} oracle-checked queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
