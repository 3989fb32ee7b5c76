#!/usr/bin/env python3
"""Dev-side oracle checker (mirrors the driver's DuckDB compare; NOT part
of the engine). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]
Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the sfDir
tables registered as views, sorts columns by name, and diffs values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
                status.append(f"dtypes spark={list(map(str, got.dtypes))} duck={list(map(str, want.dtypes))}")
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append("values: " + str(e).split("\n")[0])
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
