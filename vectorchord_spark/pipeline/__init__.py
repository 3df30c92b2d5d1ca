from vectorchord_spark.pipeline import dedup, embed, multimodal, text

__all__ = ["dedup", "embed", "text", "multimodal"]
