"""vectorchord-spark: a PySpark-native vector analytics engine.

Quickstart::

    from vectorchord_spark import get_spark, IvfIndex, IvfOptions, functions as vf

    spark = get_spark()
    df = spark.read.parquet(".../embeddings.parquet")

    # exact k-NN (pure Catalyst expression)
    df.orderBy(vf.l2("embedding", vf.vec_lit(q))).limit(10)

    # indexed ANN
    idx = IvfIndex.build(spark, df, "vec_id", "embedding", "/path/idx",
                         IvfOptions(metric="l2", lists=[4096]))
    idx.search(q, k=10, probes=[64])
"""

def _limit_blas_in_workers() -> None:
    # Executor Python workers import this package when unpickling UDF
    # closures; cap their BLAS to 1 thread there (parallelism across
    # workers is Spark's job — see kernels.limit_blas_threads for the
    # 6.7x measurement). pyspark.worker/daemon are only ever loaded
    # inside worker processes, so the driver is untouched.
    # VC_WORKER_BLAS_THREADS overrides the cap for deployments that run
    # ONE Python worker per executor and want threaded BLAS (0 = leave
    # the library default untouched). See MIGRATION.md.
    import os
    import sys

    if "pyspark.worker" in sys.modules or "pyspark.daemon" in sys.modules:
        try:
            n = int(os.environ.get("VC_WORKER_BLAS_THREADS", "1"))
        except ValueError:
            n = 1
        if n > 0:
            from vectorchord_spark.kernels import limit_blas_threads

            limit_blas_threads(n)


_limit_blas_in_workers()

from vectorchord_spark import functions
from vectorchord_spark.operators.graph import VamanaIndex, VamanaOptions
from vectorchord_spark.operators.ivf import IvfIndex, IvfOptions
from vectorchord_spark.operators.knn import knn_exact
from vectorchord_spark.operators.maxsim import maxsim_search
from vectorchord_spark.session import get_spark, load_tables

__all__ = [
    "get_spark",
    "load_tables",
    "functions",
    "IvfIndex",
    "IvfOptions",
    "VamanaIndex",
    "VamanaOptions",
    "knn_exact",
    "maxsim_search",
]
