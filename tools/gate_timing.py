"""Time every catalog entry at sf0.01 the way the driver's gate does
(run the Spark fn, collect; run the oracle SQL in DuckDB) so we can see
which entries dominate the gate's time budget. Not part of the product;
diagnostic only."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import duckdb

    from vectorchord_spark.queries import catalog
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="vc-gate-timing")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name, q in catalog().items():
        t0 = time.perf_counter()
        err = None
        try:
            rows = q.fn(spark, SF_DIR).collect()
            n = len(rows)
        except Exception as e:  # noqa: BLE001
            err = repr(e)[:120]
            n = -1
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_oracle = -1
        if q.sql is not None and err is None:
            try:
                n_oracle = len(con.execute(q.sql).fetchall())
            except Exception as e:  # noqa: BLE001
                err = "oracle: " + repr(e)[:120]
        t_oracle = time.perf_counter() - t0
        out[name] = {
            "spark_s": round(t_spark, 2),
            "oracle_s": round(t_oracle, 2),
            "rows": n,
            "oracle_rows": n_oracle,
            "err": err,
        }
        print(
            f"{name:24s} spark={t_spark:7.2f}s oracle={t_oracle:6.2f}s "
            f"rows={n} oracle_rows={n_oracle} {err or ''}",
            flush=True,
        )
    total = time.perf_counter() - t_start
    print(f"TOTAL {total:.1f}s")
    with open("/tmp/gate_timing.json", "w") as f:
        json.dump({"total_s": round(total, 1), "entries": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
