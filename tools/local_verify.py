#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Usage: python tools/local_verify.py <outDir> <sfDir>
  - expects graft.Verify to have been run first:
      sbt "runMain graft.Verify <sfDir> <outDir>"
  - loads each <outDir>/<name> parquet (Spark result),
    runs <outDir>/oracle_sql.json[name] in DuckDB over <sfDir> tables,
    compares: schema (column names, sorted), row count, and values
    (columns sorted by name, rows sorted by all columns, stringified).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if hasattr(v, "isoformat"):  # datetime-ish
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns), kind="mergesort") \
              .reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY(EMPTY!)"
            if len(got) > 0:
                n_rowsonly += 1
            else:
                n_fail += 1
            print(f"  {status:10s} {name} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  SCHEMA-MISMATCH {name}: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"  ROWCOUNT-MISMATCH {name}: spark={len(g)} duck={len(e)}")
            n_fail += 1
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"  VALUE-MISMATCH {name}: first diffs at rows {list(idx)}")
            for i in idx:
                print(f"    spark: {g.loc[i].to_dict()}")
                print(f"    duck : {e.loc[i].to_dict()}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"  PASS       {name} rows={len(g)}")
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
