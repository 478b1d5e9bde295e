#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only — the
graft library itself is pure Scala/Spark; this script just replays the
DuckDB-oracle comparison so oracle mismatches are caught before the round
ends).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 scripts/check_oracle.py <sfDir> <outDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list:
    problems = []
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows {len(a)} vs {len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
        if not np.all(eq):
            i = int(np.argmin(np.asarray(eq)))
            problems.append(f"col {c}: first diff at row {i}: {av[i]!r} vs {bv[i]!r} "
                            f"({int((~np.asarray(eq)).sum())} diffs)")
    return problems


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.execute(sql).df()
            problems = compare(normalize(spark_df), normalize(oracle_df))
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} " + ("" if not problems else " | ".join(problems)))
        if problems:
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
