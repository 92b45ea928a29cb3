#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/compare_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def run_verify():
    subprocess.run(
        ["spark-submit", "--driver-memory", "8g",
         "--class", "graft.Verify",
         "target/scala-2.13/classes", SF_DIR, OUT_DIR],
        env={"PATH": "/usr/bin:/bin:/opt/spark/bin",
             "SPARK_GRAFT_CPUS": "8",
             "JAVA_HOME": os.environ.get(
                 "JAVA_HOME", "/usr/lib/jvm/java-17-openjdk-amd64")},
        check=False)


def spark_result(name):
    import glob
    files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        sdf = spark_result(name)
        if sdf is None:
            failures.append((name, "no spark output"))
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"schema: spark={list(s.columns)} oracle={list(o.columns)}"))
            continue
        if len(s) != len(o):
            failures.append((name, f"rows: spark={len(s)} oracle={len(o)}"))
            continue
        # exact compare, mirroring the driver's value hash
        mismatch = None
        for c in s.columns:
            sv, ov = s[c], o[c].astype(s[c].dtype, errors="ignore")
            # The driver hashes raw values, so an int column vs a float
            # column (e.g. DuckDB HUGEINT -> float64) mismatches even when
            # numerically equal. Flag kind differences before coercion hides
            # them (r4's q58: uncast sum(CASE..) came back HUGEINT->float64).
            if s[c].dtype.kind in "if" and o[c].dtype.kind in "if" \
                    and s[c].dtype.kind != o[c].dtype.kind:
                mismatch = (f"col {c}: dtype kind spark={s[c].dtype} "
                            f"oracle={o[c].dtype} (driver hash would differ)")
                break
            try:
                eq = (sv.fillna("__null__") == ov.fillna("__null__")) \
                    if sv.dtype == object else \
                    ((sv == ov) | (sv.isna() & ov.isna()))
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (f"col {c}: first diff row {i}: "
                            f"spark={sv[i]!r} oracle={ov[i]!r} "
                            f"({int((~eq).sum())} diffs)")
                break
        if mismatch:
            failures.append((name, mismatch))
        else:
            print(f"PASS {name} ({len(s)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if "--skip-verify" not in sys.argv:
        run_verify()
    main()
