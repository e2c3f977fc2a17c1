#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Dev tool only (NOT part of the Scala library): replays what the driver
does — run each oracle_sql.json query in DuckDB over the fixture parquet
tables, and diff against the Spark-written parquet in outDir/<name>/.

Usage: python3 scripts/oracle_check.py <sfDir> <outDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) < 1e-9 * max(1.0, abs(fa))
    except (TypeError, ValueError):
        pass
    # pandas NaN for missing
    if (a != a) and (b != b):  # noqa: PLR0124
        return True
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(exp)):
            for c in exp.columns:
                if not cmp_cell(exp[c].iloc[i], got[c].iloc[i]):
                    bad = (i, c, exp[c].iloc[i], got[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff row={bad[0]} col={bad[1]} exp={bad[2]!r} got={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
