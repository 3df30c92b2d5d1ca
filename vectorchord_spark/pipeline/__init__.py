from vectorchord_spark.pipeline import dedup, embed, multimodal, splits, text

__all__ = ["dedup", "embed", "text", "multimodal", "splits"]
