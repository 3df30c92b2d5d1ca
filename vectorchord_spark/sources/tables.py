"""Vector table sources/sinks and the text I/O format.

Re-expresses the reference's type I/O surface (S10: the ``[1,2,3]`` text
format — /root/reference/src/datatype/text_rabitq8.rs and pgvector's vector
text format) as Spark expressions, plus reader/writer helpers for the
formats a vector pipeline actually ingests (parquet, csv/json with
text-encoded vectors)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_vector(col: Column | str) -> Column:
    """Parse pgvector text format ``[1, 2.5, -3e1]`` → array<float>."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[\[\]\s]", "")
    return F.when(F.length(cleaned) == 0, F.array().cast("array<float>")).otherwise(
        F.transform(F.split(cleaned, ","), lambda x: x.cast("float"))
    )


def vector_to_text(col: Column | str) -> Column:
    """array<float> → pgvector text format ``[1,2,3]``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.lit("["),
        F.concat_ws(",", F.transform(c, lambda x: x.cast("string"))),
        F.lit("]"),
    )


def read_vectors(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    vec_col: str = "vec",
    text_encoded: bool = False,
    schema: str | None = None,
) -> DataFrame:
    """Read a vector table from parquet / csv / json; ``text_encoded=True``
    parses a pgvector-format string column into array<float>."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "csv":
        df = reader.option("header", "true").csv(path)
    elif fmt == "json":
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if text_encoded:
        df = df.withColumn(vec_col, parse_vector(vec_col))
    return df


def write_vectors(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    vec_col: str = "vec",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a vector table; csv/json sinks text-encode the vector column
    (csv has no native arrays)."""
    if fmt in ("csv", "json"):
        df = df.withColumn(vec_col, vector_to_text(vec_col))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
