from vectorchord_spark.sources.events import read_events, ts_us_expr
from vectorchord_spark.sources.tables import (
    binary_to_rabitq,
    binary_to_vector,
    parse_vector,
    rabitq_to_binary,
    read_vectors,
    vector_to_binary,
    vector_to_text,
    write_vectors,
)

__all__ = [
    "parse_vector",
    "vector_to_text",
    "vector_to_binary",
    "binary_to_vector",
    "rabitq_to_binary",
    "binary_to_rabitq",
    "read_vectors",
    "write_vectors",
    "read_events",
    "ts_us_expr",
]
