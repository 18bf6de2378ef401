#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfdir> <verify_out_dir> [names]

Loads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB with views over the sfdir
parquet tables, and compares as column-name-sorted multisets.
Optional 3rd arg: comma-separated query names — check only those
(chunked runs on big fixtures; per-query lines are flushed).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple("NULL" if pd.isna(v) else str(v) for v in t))
    return sorted(rows)


def main(sfdir: str, outdir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(oracle)
    if only:
        names = [n for n in names if n in only]
    # verify_meta.json (written by graft.Verify) records the DECLARED
    # query count and any queries that crashed during the dump. A
    # crashing query must turn this gate red even though it has no
    # comparable result (round 7: q76 crashed -> absent -> "117/117
    # green" on a 118-query suite).
    n_declared = len(names)
    meta_failures = {}
    try:
        meta = json.load(open(f"{outdir}/verify_meta.json"))
        meta_failures = meta.get("failures", {})
        if only is None:
            n_declared = max(n_declared, meta.get("declared", 0))
    except FileNotFoundError:
        pass
    for name, err in sorted(meta_failures.items()):
        if only is None or name in only:
            print(f"FAIL {name}: verify crash: {err}", flush=True)
    for name in names:
        if name in meta_failures:
            continue  # already reported as a verify crash above
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark result parquet")
                continue
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).fetchdf()
            a, b = canon(spark_df), canon(duck_df)
            if a == b:
                print(f"OK   {name}: {len(a)} rows", flush=True)
                n_ok += 1
            else:
                print(f"FAIL {name}: spark {len(a)} rows vs duck {len(b)} rows", flush=True)
                sa, sb = set(a), set(b)
                for r in list(sa - sb)[:3]:
                    print(f"  spark-only: {r}")
                for r in list(sb - sa)[:3]:
                    print(f"  duck-only:  {r}")
                if len(a) == len(b) and sa == sb:
                    print("  (same sets, different multiplicities)")
        except Exception as e:
            print(f"ERR  {name}: {e}", flush=True)
    print(f"== {n_ok}/{n_declared} green ==")
    return 0 if n_ok == n_declared else 1


if __name__ == "__main__":
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
