"""Canonical reader for the ``events`` table and its nanos-timestamp
normalization.

``events.parquet`` stores TIMESTAMP(NANOS). Spark's reading of that
physical type changed across versions: older builds need the legacy
``nanosAsLong`` conf (``ts`` comes back BIGINT nanos), newer builds read it
natively as TIMESTAMP_NTZ (micro precision, nanos floored) and ignore the
conf. Every consumer (batch queries, streaming jobs, tests) derives the
canonical µs-epoch ``ts_us`` column through THIS module, so the
magnitude-guard heuristic lives in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

#: µs epochs stay < 4e16 until year ~3200 while nano epochs exceed it from
#: 1971 on, so the cutoff is safe for any realistic event time under
#: either reader behavior.
NANO_CUTOFF = 40_000_000_000_000_000


def ts_us_expr(col: str = "ts") -> F.Column:
    """Normalize a LONG epoch column of unknown scale (nanos or µs) to µs."""
    return F.expr(
        f"CASE WHEN abs({col}) >= {NANO_CUTOFF} THEN {col} div 1000 ELSE {col} END"
    )


def normalize_epoch_py(t: int) -> int:
    """The same magnitude guard for driver/worker-side Python code paths
    (e.g. the sessionize state loop)."""
    return t // 1000 if abs(t) >= NANO_CUTOFF else t


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with a version-independent µs-epoch ``ts_us``
    column (both reader behaviors floor sub-µs digits identically for
    post-1970 data)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts_us", ts_us_expr("ts"))
    return df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
