from vectorchord_spark.sources.tables import (
    parse_vector,
    read_vectors,
    vector_to_text,
    write_vectors,
)

__all__ = ["parse_vector", "vector_to_text", "read_vectors", "write_vectors"]
