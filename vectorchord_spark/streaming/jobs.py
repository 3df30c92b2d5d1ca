"""Structured Streaming surface of the engine.

Two streaming shapes re-expressed from the reference's online paths:

- **streaming index insert** (the DML insert path, Q12 —
  /root/reference/crates/vchordrq/src/insert.rs:70-212): a ``readStream`` of
  new vector rows is encoded with the existing (broadcast) centroid tree and
  appended to the codes table per micro-batch via ``foreachBatch``; the
  appendable-tape/compaction split maps onto append files + ``compact()``.
- **watermarked windowed aggregation** over the events stream (the standard
  late-data-tolerant rollup; batch twin is the ``events_hourly`` catalog
  query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectorchord_spark.operators.ivf import IvfIndex

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def streaming_index_insert(
    index: IvfIndex,
    source_path: str,
    checkpoint_path: str,
    schema: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously index new vector rows landing as parquet files.

    Exactly-once per micro-batch via the checkpointed ``foreachBatch``; each
    batch is one encode+append job (same code path as batch insert)."""
    stream = index.spark.readStream.schema(schema).parquet(source_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.insert(batch_df, id_col, vec_col)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_event_counts_stream(
    spark: SparkSession,
    source_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    query_name: str = "hourly_event_counts",
    available_now: bool = True,
) -> StreamingQuery:
    """Watermarked hourly rollup of the events stream into a memory sink.

    Late events beyond ``watermark`` are dropped (state is bounded — the
    property that makes this run forever on an unbounded stream)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_path)
    t = F.timestamp_micros(F.expr("ts div 1000"))
    agg = (
        stream.withColumn("t", t)
        .withWatermark("t", watermark)
        .groupBy(F.window("t", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
