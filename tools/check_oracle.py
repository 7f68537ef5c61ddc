#!/usr/bin/env python3
"""Local dev harness approximating the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load Spark's parquet result, run
the matching oracle SQL in DuckDB over the same parquet tables, sort
columns by name, sort rows, and compare values. Dev-only tool (the real
gate is driver-side); NOT part of the Scala library.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def kinds(df: pd.DataFrame):
    """Per-column dtype KIND (int/float/object/...), sorted by name.

    A value-equal but representation-unequal cell (DuckDB HUGEINT ->
    pandas float64 `31.0` vs Spark int64 `31`) passes a `==` compare but
    flips a representation-sensitive hash — the round-13 red-row cause.
    """
    return [(c, df[c].dtype.kind) for c in sorted(df.columns)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).fetchdf()
            sc, sr = canon(spark_df)
            dc, dr = canon(duck_df)
            if sc != dc:
                print(f"FAIL {name}: columns {sc} vs {dc}")
                n_fail += 1
            elif len(sr) != len(dr):
                print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
                n_fail += 1
            elif sr != dr:
                bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
                print(f"FAIL {name}: first diff row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
                n_fail += 1
            elif kinds(spark_df) != kinds(duck_df):
                diff = [(a, b) for a, b in zip(kinds(spark_df), kinds(duck_df)) if a != b]
                print(f"FAIL {name}: dtype-kind mismatch (spark vs duck): {diff}")
                n_fail += 1
            else:
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
