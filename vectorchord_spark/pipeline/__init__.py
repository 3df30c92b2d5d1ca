from vectorchord_spark.pipeline import (
    dedup,
    embed,
    multimodal,
    sparse,
    splits,
    text,
)

__all__ = ["dedup", "embed", "text", "multimodal", "sparse", "splits"]
