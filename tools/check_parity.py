"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every catalog query through Spark and its oracle SQL through DuckDB on
the same sf dir, then compares row count, column names, and values (columns
sorted by name, rows sorted by all columns). Exits non-zero on mismatch.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"row count: spark={len(got)} oracle={len(want)}")
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        problems.append(f"columns: spark={gc} oracle={wc}")
        return problems
    if problems:
        return problems
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        a, b = g[col].to_numpy(), w[col].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            af = np.asarray(a, np.float64)
            bf = np.asarray(b, np.float64)
            exact = np.array_equal(af, bf, equal_nan=True)
            if not exact:
                diff = np.nanmax(np.abs(af - bf)) if len(af) else 0
                problems.append(f"col {col}: float mismatch, max abs diff {diff:.3e}")
        else:
            if not (pd.Series(a).astype(str).equals(pd.Series(b).astype(str))):
                bad = np.where(pd.Series(a).astype(str) != pd.Series(b).astype(str))[0][:3]
                problems.append(
                    f"col {col}: mismatch at rows {bad.tolist()}: "
                    f"spark={[a[i] for i in bad]} oracle={[b[i] for i in bad]}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from vectorchord_spark.queries import catalog
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="parity-check")
    con = duck_con(sf_dir)
    cat = catalog()
    failures = 0
    for name, q in cat.items():
        if only and name not in only:
            continue
        try:
            got = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.sql is None:
            print(f"SKIP {name}: no oracle (rows-only check), rows={len(got)}")
            continue
        try:
            want = con.sql(q.sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: rows={len(got)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
