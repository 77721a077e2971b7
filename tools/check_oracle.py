"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and
order-insensitive canonicalized values. Usage:

    python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as E
    from dp_data_quality_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"[SPARK-ERR ] {name}")
            traceback.print_exc(limit=4)
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY ] {name}: {len(sdf)} rows")
            if len(sdf) == 0:
                print("             !! zero rows")
                failures.append(name)
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"[ORACLE-ERR] {name}")
            traceback.print_exc(limit=4)
            failures.append(name)
            continue
        # dtype KIND drift (int vs float vs object) is a hard failure:
        # the driver's value hash is dtype-sensitive there, so
        # int64-vs-float64 drift fails the gate even when canonicalized
        # values match (r3 vocab_coverage postmortem).  Same-kind width /
        # resolution differences (datetime64[ns] vs [us]) are canonical-
        # ized by the driver — r3 green rows prove it — so warn only.
        dtype_drift = False
        for col in sorted(set(sdf.columns) & set(odf.columns)):
            a, b = sdf[col].dtype, odf[col].dtype
            if str(a) == str(b):
                continue
            if a.kind == b.kind:
                print(f"    [dtype-warn] {name}.{col}: spark={a} oracle={b}")
            else:
                print(f"[DTYPE-DIFF] {name}.{col}: spark={a} oracle={b}")
                dtype_drift = True
        if dtype_drift:
            failures.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        if list(cs.columns) != list(co.columns):
            print(f"[COLS-DIFF ] {name}: spark={list(cs.columns)} oracle={list(co.columns)}")
            failures.append(name)
            continue
        if len(cs) != len(co):
            print(f"[ROWS-DIFF ] {name}: spark={len(cs)} oracle={len(co)}")
            failures.append(name)
            continue
        if not cs.equals(co):
            neq = (cs != co).any(axis=1)
            print(f"[VALS-DIFF ] {name}: {int(neq.sum())}/{len(cs)} rows differ; first diffs:")
            idx = neq[neq].index[:5]
            for i in idx:
                for col in cs.columns:
                    if cs.at[i, col] != co.at[i, col]:
                        print(f"    row {i} col {col}: spark={cs.at[i, col]!r} oracle={co.at[i, col]!r}")
            failures.append(name)
            continue
        print(f"[OK        ] {name}: {len(cs)} rows")
    spark.stop()
    if failures:
        print("\nFAILURES:", failures)
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
