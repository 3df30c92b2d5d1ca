"""Vector table sources/sinks and the text I/O format.

Re-expresses the reference's type I/O surface (S10: the ``[1,2,3]`` text
format — /root/reference/src/datatype/text_rabitq8.rs and pgvector's vector
text format) as Spark expressions, plus reader/writer helpers for the
formats a vector pipeline actually ingests (parquet, csv/json with
text-encoded vectors)."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ---------------------------------------------------------------------------
# Binary wire formats (S10 send/recv: pgvector's vector wire format and the
# reference's rabitq8 stream — /root/reference/src/datatype/binary_rabitq8.rs
# :21-36: dim u32 BE, then sum_of_x2 / norm_of_lattice / sum_of_code /
# sum_of_abs_x as f32 BE, then the packed code bytes)
# ---------------------------------------------------------------------------


def pack_vector_wire(arr: "np.ndarray") -> bytes:
    """One vector → pgvector binary wire bytes (u16 dim BE, u16 unused=0,
    f32 BE elements; bit-preserving incl. NaN payloads)."""
    import struct

    arr = np.asarray(arr, np.float32)
    return struct.pack(">HH", len(arr), 0) + arr.astype(">f4").tobytes()


def unpack_vector_wire(buf: bytes) -> "np.ndarray":
    """pgvector binary wire bytes → f32 vector."""
    import struct

    b = bytes(buf)
    (dim, _unused) = struct.unpack(">HH", b[:4])
    return np.frombuffer(b[4 : 4 + 4 * dim], ">f4").astype(np.float32)


def vector_to_binary(col: Column | str) -> Column:
    """array<float> → pgvector binary wire format (u16 dim BE, u16
    unused=0, f32 BE elements)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _send(series: pd.Series) -> pd.Series:
        return pd.Series([pack_vector_wire(v) for v in series])

    return _send(F.col(col) if isinstance(col, str) else col)


def binary_to_vector(col: Column | str) -> Column:
    """pgvector binary wire format → array<float>."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    @pandas_udf(ArrayType(FloatType()))
    def _recv(series: pd.Series) -> pd.Series:
        return pd.Series([unpack_vector_wire(b) for b in series])

    return _recv(F.col(col) if isinstance(col, str) else col)


def rabitq_to_binary(col: Column | str) -> Column:
    """rabitq struct → the reference's send() stream (binary_rabitq8.rs:21):
    dim u32 BE + 4 metadata f32 BE + packed code bytes."""
    import struct

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _send(sdf: pd.DataFrame) -> pd.Series:
        out = []
        for _, r in sdf.iterrows():
            out.append(
                struct.pack(
                    ">Iffff",
                    int(r["dim"]),
                    float(r["dis_u_2"]),
                    float(r["norm_of_lattice"]),
                    float(r["sum_of_code"]),
                    float(r["sum_of_abs_x"]),
                )
                + bytes(r["code"])
            )
        return pd.Series(out)

    return _send(F.col(col) if isinstance(col, str) else col)


def binary_to_rabitq(col: Column | str) -> Column:
    """The reference's recv() stream → rabitq struct
    (binary_rabitq8.rs:36)."""
    import struct

    from pyspark.sql.functions import pandas_udf

    from vectorchord_spark.functions.quantize import RABITQ_SCHEMA

    @pandas_udf(RABITQ_SCHEMA)
    def _recv(series: pd.Series) -> pd.DataFrame:
        dims, du2, nol, soc, sax, codes = [], [], [], [], [], []
        for buf in series:
            b = bytes(buf)
            d, a, c, e, g = struct.unpack(">Iffff", b[:20])
            dims.append(d)
            du2.append(a)
            nol.append(c)
            soc.append(e)
            sax.append(g)
            codes.append(b[20:])
        return pd.DataFrame(
            {
                "dim": np.asarray(dims, np.int32),
                "dis_u_2": np.asarray(du2, np.float32),
                "norm_of_lattice": np.asarray(nol, np.float32),
                "sum_of_code": np.asarray(soc, np.float32),
                "sum_of_abs_x": np.asarray(sax, np.float32),
                "code": codes,
            }
        )

    return _recv(F.col(col) if isinstance(col, str) else col)
