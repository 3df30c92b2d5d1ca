from vectorchord_spark.streaming.jobs import (
    hourly_event_counts_stream,
    minhash_band_keys,
    streaming_dedup,
    streaming_index_insert,
    streaming_knn_serve,
    streaming_neardup_pairs,
    streaming_sessionize,
)

__all__ = [
    "streaming_index_insert",
    "hourly_event_counts_stream",
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_knn_serve",
    "streaming_neardup_pairs",
    "minhash_band_keys",
]
