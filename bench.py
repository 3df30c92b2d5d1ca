"""Benchmark harness: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall-clock seconds."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from vectorchord_spark.queries import catalog
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="vectorchord-bench")
    cat = catalog()
    headline = {n: q for n, q in cat.items() if q.headline}

    # warm the JVM/parquet footer caches with one cheap action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # two passes per query: the first pays one-time costs (python worker
    # spawn, codegen, index build caches), the second measures steady-state
    # serving — the regime the reference's QPS claims describe. Both totals
    # are reported; the headline value is steady-state.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name, q in headline.items():
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(
            f"# {name}: cold={cold[name]:.3f}s warm={timings[name]:.3f}s rows={n}",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock_steady_state",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()), 3),
                "cold_queries": cold,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
