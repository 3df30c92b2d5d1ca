"""Profile the ann_ivf_probes warm-slower-than-cold anomaly (r03 verdict #2).

Times N consecutive serving searches in several configurations to isolate
which stage accumulates cross-run state.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from vectorchord_spark.queries import QUERY_VEC, _get_ivf_index  # noqa: E402
from vectorchord_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="probe-profile")
spark.sparkContext.setLogLevel("ERROR")
idx = _get_ivf_index(spark, sf_dir, "l2")

N = 6


def run(label, **kw):
    times = []
    for i in range(N):
        t0 = time.perf_counter()
        idx.search(QUERY_VEC, k=10, probes=[4], epsilon=1.9, **kw).count()
        times.append(time.perf_counter() - t0)
    print(f"{label:35s} " + " ".join(f"{t:.2f}" for t in times), flush=True)


run("guarantee=True rerank=4 (serving)", rerank_factor=4)
run("guarantee=False rerank=4", rerank_factor=4, guarantee=False)
run("guarantee=True rerank=4 again", rerank_factor=4)


# knn_batch_ivf isolated steady-state (r04 verdict #3: the bench showed a
# noise-banded 0.83->1.49s regression; this times the exact bench serving
# configuration N consecutive times with nothing else on the machine)
def run_batch(label):
    from vectorchord_spark.queries import _BATCH_QUERIES

    times = []
    for i in range(N):
        t0 = time.perf_counter()
        idx.search_batch(
            _BATCH_QUERIES, k=10, probes=None, rerank_factor=None
        ).count()
        times.append(time.perf_counter() - t0)
    print(f"{label:35s} " + " ".join(f"{t:.2f}" for t in times), flush=True)


run_batch("search_batch exhaustive (bench cfg)")
