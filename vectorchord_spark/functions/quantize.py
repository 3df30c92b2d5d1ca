"""Quantized vector column types (``rabitq8`` / ``rabitq4``) as Spark structs.

Re-expresses the reference's on-disk quantized types and their SQL functions
(`quantize_to_rabitq8/4`, `dequantize_to_vector`, rabitq-vs-rabitq `<->`,
`<#>`, `<=>`):

- type layout: /root/reference/sql/install/vchord--1.1.1.sql:712-728
- quantize pipeline (rotate → lattice code):
  /root/reference/src/datatype/functions_rabitq8.rs:23-56
- pairwise estimators: /root/reference/crates/rabitq/src/extended.rs:155-205

Arrow-batched pandas UDFs over numpy matrices — the vectorized slow path for
what Spark's built-ins genuinely can't express (bit packing + FHT rotation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from vectorchord_spark import kernels as K

RABITQ_SCHEMA = StructType(
    [
        StructField("dim", IntegerType()),
        StructField("dis_u_2", FloatType()),
        StructField("norm_of_lattice", FloatType()),
        StructField("sum_of_code", FloatType()),
        StructField("sum_of_abs_x", FloatType()),
        StructField("code", BinaryType()),
    ]
)


def _vec_matrix(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, np.float32) for v in series])


def quantize_to_rabitq(vec: Column | str, bits: int = 8) -> Column:
    """Quantize an ``array<float>`` column to a rabitq8/rabitq4 struct."""
    assert bits in (4, 8)

    @pandas_udf(RABITQ_SCHEMA)
    def _quantize(series: pd.Series) -> pd.DataFrame:
        if len(series) == 0:
            return pd.DataFrame(
                columns=[f.name for f in RABITQ_SCHEMA.fields]
            )
        mat = _vec_matrix(series)
        rot = K.rotate(mat)
        c = K.extended_code(rot, bits)
        codes = (
            [r.tobytes() for r in c["code"]]
            if bits == 8
            else K.pack_nibbles(c["code"])
        )
        return pd.DataFrame(
            {
                "dim": np.full(len(series), mat.shape[1], np.int32),
                "dis_u_2": c["dis_u_2"],
                "norm_of_lattice": c["norm_of_lattice"],
                "sum_of_code": c["sum_of_code"],
                "sum_of_abs_x": c["sum_of_abs_x"],
                "code": codes,
            }
        )

    return _quantize(vec if isinstance(vec, Column) else F.col(vec))


def dequantize_to_vector(q: Column | str, bits: int = 8) -> Column:
    """Reconstruct an approximate ``array<float>`` from a rabitq struct."""
    assert bits in (4, 8)

    @pandas_udf(ArrayType(FloatType()))
    def _dequantize(sdf: pd.DataFrame) -> pd.Series:
        if len(sdf) == 0:
            return pd.Series([], dtype=object)
        d = int(sdf["dim"].iloc[0])
        codes = list(sdf["code"])
        code = (
            np.frombuffer(b"".join(codes), np.uint8).reshape(len(codes), -1)[:, :d]
            if bits == 8
            else K.unpack_nibbles(codes, d)
        )
        out = K.extended_dequantize(
            code,
            sdf["dis_u_2"].to_numpy(np.float32),
            sdf["norm_of_lattice"].to_numpy(np.float32),
            bits,
        )
        return pd.Series(list(out.astype(np.float32)))

    return _dequantize(q if isinstance(q, Column) else F.col(q))


def rabitq_distance(metric: str, a: Column | str, b: Column | str, bits: int = 8) -> Column:
    """Estimated distance between two rabitq structs (same bit width).

    ``l2`` → sqrt'd (SQL-surface ``<->``), ``dot`` → negated ip, ``cos`` →
    negated similarity (raw ``<=>`` on quantized types; see
    /root/reference/crates/rabitq/src/extended.rs:193-205).
    """
    assert metric in ("l2", "dot", "cos")

    @pandas_udf(FloatType())
    def _dist(adf: pd.DataFrame, bdf: pd.DataFrame) -> pd.Series:
        if len(adf) == 0:
            return pd.Series([], dtype=np.float32)
        d = int(adf["dim"].iloc[0])

        def unpack(sdf):
            codes = list(sdf["code"])
            code = (
                np.frombuffer(b"".join(codes), np.uint8).reshape(len(codes), -1)[:, :d]
                if bits == 8
                else K.unpack_nibbles(codes, d)
            )
            return {
                "code": code,
                "dis_u_2": sdf["dis_u_2"].to_numpy(np.float32),
                "norm_of_lattice": sdf["norm_of_lattice"].to_numpy(np.float32),
                "sum_of_code": sdf["sum_of_code"].to_numpy(np.float32),
            }

        est = K.extended_distance(metric, unpack(adf), unpack(bdf), bits, bits)
        if metric == "l2":
            est = np.sqrt(np.maximum(est, 0.0))
        return pd.Series(est.astype(np.float32))

    a = a if isinstance(a, Column) else F.col(a)
    b = b if isinstance(b, Column) else F.col(b)
    return _dist(a, b)


def register_sql_functions(spark) -> None:
    """Register the scalar operator surface for ``spark.sql`` users.

    The expression builders in :mod:`distances` are the fast path; these
    Arrow-batched registrations exist so plain SQL strings can call the same
    semantics (mirrors the reference's SQL function surface). Each batch is
    stacked into one (n, d) f64 matrix and reduced with a single einsum —
    no per-row Python.
    """

    def _stack(s: pd.Series) -> np.ndarray:
        # one C-level conversion of the whole Arrow batch; rows of a column
        # share a dimension so the stack is rectangular
        return np.array(s.tolist(), dtype=np.float64)

    @pandas_udf("double")
    def vc_l2(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        diff = _stack(a) - _stack(b)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", diff, diff)))

    @pandas_udf("double")
    def vc_ip(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        return pd.Series(-np.einsum("ij,ij->i", _stack(a), _stack(b)))

    @pandas_udf("double")
    def vc_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=np.float64)
        A, B = _stack(a), _stack(b)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(
            np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(1.0 - num / den)

    @pandas_udf("double")
    def vc_maxsim(doc: pd.Series, q: pd.Series) -> pd.Series:
        # token counts vary per row, so rows can't share one stack — but
        # each row is a single (ndoc, d) x (d, nq) matmul, not a token loop
        out = np.empty(len(doc), dtype=np.float64)
        for i, (dvecs, qvecs) in enumerate(zip(doc, q)):
            dmat = np.array(list(dvecs), dtype=np.float64)
            qmat = np.array(list(qvecs), dtype=np.float64)
            out[i] = (-(dmat @ qmat.T)).min(axis=0).sum()
        return pd.Series(out)

    spark.udf.register("vc_l2", vc_l2)
    spark.udf.register("vc_ip", vc_ip)
    spark.udf.register("vc_cosine", vc_cosine)
    spark.udf.register("vc_maxsim", vc_maxsim)
