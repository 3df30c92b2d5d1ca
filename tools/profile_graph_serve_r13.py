"""r13 interleaved A/B: graph cold-serve exchange path vs per-shard-
directory reads (VC_GRAPH_SERVE_EXCHANGE flips the legacy path).

Times the exact bench configuration (serving_overrides ann_graph: one
search, probe_shards=3, auto ef) under the noop sink, alternating
old/new in one session, with result-equality asserted every round.
Also times search_batch (the streaming serve inner loop) and the
exhaustive route (graph_recall). Writes the after-plan to
plans/r13/ann_graph_after.txt when PLANS=1.

Usage: RUNS=6 python tools/profile_graph_serve_r13.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from window_probe import probe

    from vectorchord_spark.queries import QUERY_VEC, _get_graph_index
    from vectorchord_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "6"))
    spark = get_spark(app_name="vc-r13-graph-serve-ab")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"window: {probe()}")

    idx = _get_graph_index(spark, sf_dir)
    rng = np.random.default_rng(99)
    qs = [[float(x) for x in rng.uniform(-1, 1, len(QUERY_VEC))] for _ in range(8)]

    def serve():
        return idx.search(QUERY_VEC, k=10, probe_shards=3).select("id", "dist")

    def batch():
        return idx.search_batch(qs, k=10, probe_shards=3)

    def exhaustive():
        return idx.search(QUERY_VEC, k=10, ef_search=1 << 20, probe_shards=None)

    # equality first (both paths, all three shapes)
    for name, fn in [("serve", serve), ("batch", batch), ("exh", exhaustive)]:
        new = sorted(map(tuple, fn().collect()))
        os.environ["VC_GRAPH_SERVE_EXCHANGE"] = "1"
        old = sorted(map(tuple, fn().collect()))
        del os.environ["VC_GRAPH_SERVE_EXCHANGE"]
        assert new == old, f"{name}: rows differ"
        print(f"{name} equality OK ({len(new)} rows)")

    times: dict[str, list[float]] = {}
    for i in range(runs):
        for label, env, fn in [
            ("serve_old", "1", serve), ("serve_new", "", serve),
            ("batch_old", "1", batch), ("batch_new", "", batch),
            ("exh_old", "1", exhaustive), ("exh_new", "", exhaustive),
        ]:
            if env:
                os.environ["VC_GRAPH_SERVE_EXCHANGE"] = env
            else:
                os.environ.pop("VC_GRAPH_SERVE_EXCHANGE", None)
            spark.sparkContext.setJobDescription(f"{label} {i}")
            t = time.perf_counter()
            noop(fn())
            times.setdefault(label, []).append(time.perf_counter() - t)
    for k, v in times.items():
        print(f"{k}: {['%.3f' % x for x in v]} median {statistics.median(v):.3f}")

    if os.environ.get("PLANS") == "1":
        from vectorchord_spark.plans.explain import explain_str

        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r13", "ann_graph_after.txt",
        )
        df = idx.search(QUERY_VEC, k=10, probe_shards=3).select(
            F.col("id").alias("vec_id"), "dist"
        )
        with open(out, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {out}")
    print(f"window after: {probe()}")
    spark.stop()


if __name__ == "__main__":
    main()
