"""Vector distance operators as native Spark column expressions.

These are the Spark-first re-expression of the reference's SQL operator
surface (`<->`, `<#>`, `<=>`, sphere ops, `@#` MaxSim):

- kernels: /root/reference/crates/vector/src/vect.rs:128-143
- output transforms (sqrt for L2, +1 for cosine on the order-by path):
  /root/reference/src/index/vchordrq/opclass.rs:244-262
- MaxSim: /root/reference/src/datatype/operators_vector.rs:93-109

Everything here is a JVM-side expression built from higher-order functions
(`zip_with`/`aggregate`/`transform`), so the hot path stays inside Catalyst /
whole-stage codegen with no Python round-trip — at 100 TB these run fully
vectorized in the Parquet scan stage. Accumulation is a sequential left fold
over double-cast elements, which makes results bit-identical to a
left-associated ``+`` chain in any engine that evaluates IEEE doubles (used
by the DuckDB oracle harness).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_lit(values: Sequence[float]) -> Column:
    """A literal ``array<double>`` column from a Python sequence."""
    return F.array(*[F.lit(float(v)) for v in values])


def _as_col(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return vec_lit(v)


def dot(a, b) -> Column:
    """Inner product Σ a_i·b_i with double accumulation (left fold)."""
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_squared(a, b) -> Column:
    """Squared L2 distance (the engine-internal distance for L2 opclasses)."""
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2(a, b) -> Column:
    """SQL-surface ``<->``: sqrt of squared L2."""
    return F.sqrt(l2_squared(a, b))


def ip(a, b) -> Column:
    """SQL-surface ``<#>``: negated inner product."""
    return -dot(a, b)


def norm(a) -> Column:
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a) -> Column:
    """L2-normalize (the store-time transform of cosine opclasses,
    /root/reference/src/index/vchordrq/opclass.rs:49-68).

    The norm is bound to a lambda variable (``transform`` over a
    one-element array): referencing the norm EXPRESSION inside the
    division lambda inlines the full O(dim) aggregate into every
    element — O(dim²) per row, a 64-768x blowup on store-time
    normalization of cos-metric tables."""
    a = _as_col(a)
    return F.element_at(
        F.transform(
            F.array(norm(a)),
            lambda n: F.transform(a, lambda x: x.cast("double") / n),
        ),
        1,
    )


def cosine_distance(a, b) -> Column:
    """SQL-surface ``<=>``: 1 - cos similarity."""
    a, b = _as_col(a), _as_col(b)
    return F.lit(1.0) - dot(a, b) / (norm(a) * norm(b))


def output_distance(metric: str, a, b) -> Column:
    """Distance as emitted by the index order-by path (opclass output
    transform applied): l2 → sqrt(l2²), dot → -ip, cos → 1-sim (internally
    -sim on normalized vectors, +1 at output)."""
    if metric == "l2":
        return l2(a, b)
    if metric == "dot":
        return ip(a, b)
    if metric == "cos":
        return cosine_distance(a, b)
    raise ValueError(f"unknown metric {metric!r}")


def sphere_contains(metric: str, a, center, radius: float) -> Column:
    """Sphere operators ``<<->>``/``<<#>>``/``<<=>>``: true iff the
    output-space distance to ``center`` is strictly less than ``radius``."""
    return output_distance(metric, a, center) < F.lit(float(radius))


def sphere(center, radius: float) -> Column:
    """``sphere(v, r)`` constructor (S6): the composite sphere literal used
    by the range operators (/root/reference/sql/install/vchord--1.1.1.sql:900-910)."""
    return F.struct(
        _as_col(center).alias("center"), F.lit(float(radius)).alias("radius")
    )


def sphere_contains_struct(metric: str, a, sphere_col: Column) -> Column:
    """Sphere operator against a sphere struct column (center, radius)."""
    return output_distance(metric, a, sphere_col["center"]) < sphere_col["radius"]


def maxsim(doc_vecs, query_vecs) -> Column:
    """``@#`` late-interaction MaxSim: Σ over query tokens of the minimum
    negated dot against the document's tokens (lower = more similar)."""
    doc_vecs = _as_col(doc_vecs)
    if not isinstance(query_vecs, Column):
        query_vecs = F.array(*[vec_lit(t) for t in query_vecs])
    return F.aggregate(
        query_vecs,
        F.lit(0.0),
        lambda acc, q: acc + F.array_min(F.transform(doc_vecs, lambda d: -dot(d, q))),
    )
