from vectorchord_spark.pipeline import dedup, multimodal, text

__all__ = ["dedup", "text", "multimodal"]
