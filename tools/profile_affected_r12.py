"""Time the bench entries affected by the r12 optimization batch with
bench.py's exact methodology (cold + 5 warm runs, median), in isolation.

Usage: python tools/profile_affected_r12.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from tools.capture_plans import extra_fns
    from vectorchord_spark.queries import catalog, serving_overrides
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="profile-affected-r12")
    fns = {n: q.fn for n, q in catalog().items()}
    fns.update({n: f for n, f in serving_overrides().items() if n in fns})
    fns.update(extra_fns())
    names = sys.argv[1:] or [
        "dedup_minhash_lsh",
        "decontaminate",
        "semdedup",
        "quality_learned",
        "dsir_resample",
        "curate",
    ]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    for name in names:
        fn = fns[name]
        spark.sparkContext.setJobDescription(f"affected:{name}")
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            warm.append(time.perf_counter() - t0)
        warm.sort()
        print(
            f"# {name}: cold={cold:.3f}s warm_median={warm[2]:.3f}s "
            f"(runs={['%.3f' % w for w in warm]}) rows={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
