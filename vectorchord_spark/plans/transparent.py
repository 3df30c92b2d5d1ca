"""SQL-transparent ANN: rewrite ``ORDER BY distance LIMIT k`` to an index scan.

The reference is planner-transparent: a plain ``ORDER BY embedding <-> q
LIMIT k`` is rewritten by the Postgres planner into a vchordrq index scan
(operator strategies installed by
/root/reference/sql/install/vchord--1.1.1.sql:1138-1228). This module is the
Spark-first analogue: the user writes ordinary SQL against a registered
table using the engine's SQL distance functions (``vc_l2`` / ``vc_ip`` /
``vc_cosine``), and :func:`ann_sql` inspects the *analyzed* Catalyst plan —
not the SQL text — for the top-k-by-distance shape:

    GlobalLimit(k) → LocalLimit(k) → Sort(vc_*(vec_col, literal) ASC)
        → Project → ... → table

When the shape matches a registered index (same table, vector column, and
metric), the query is answered by ``IvfIndex.search`` (k ids + distances,
joined back for any other projected columns); otherwise the original
DataFrame is returned untouched. Matching on the analyzed plan means
aliases, views, and formatting differences all resolve correctly — exactly
what the Postgres planner's strategy matching buys the reference.

With the registration default (``probes=None`` → scan every cell with the
quantized estimate, exact rerank) the rewrite is exact, so it is gated by
the driver's hash-match oracle (catalog entry ``sql_ann``); probed configs
trade recall for latency per the registered ``probes``/``epsilon``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from vectorchord_spark.operators.ivf import IvfIndex

#: SQL function name → index metric it computes the output-space distance of
_UDF_METRIC = {"vc_l2": "l2", "vc_ip": "dot", "vc_cosine": "cos"}


@dataclass
class _Registration:
    index: "IvfIndex"
    id_col: str
    vec_col: str
    probes: "list[int] | int | None" = None
    epsilon: float = 1.9
    rerank_factor: "int | None" = None
    #: MaxSim (vc_maxsim order-by) config; candidates default = exhaustive
    #: per-token rerank, which makes the rewrite exact
    maxsim_candidates: int = 1 << 30
    maxsim_threshold: int = 0
    #: when set, top-k serving calls ``index.search(q, k=k, **search_kwargs)``
    #: verbatim — this is how a non-IVF index (e.g. the Vamana graph, with
    #: ``ef_search``/``probe_shards``) plugs into the transparent rewrite
    search_kwargs: "dict | None" = None


#: (lower-cased table name) → registration
_REGISTRY: dict[str, _Registration] = {}


def register_ann_index(
    table: str,
    vec_col: str,
    index: "IvfIndex",
    id_col: str = "id",
    probes: "list[int] | int | None" = None,
    epsilon: float = 1.9,
    rerank_factor: "int | None" = None,
    maxsim_candidates: int = 1 << 30,
    maxsim_threshold: int = 0,
    search_kwargs: "dict | None" = None,
) -> None:
    """Attach an index to a (temp view / table, vector column) pair so that
    ``ann_sql`` can accelerate top-k-by-distance queries against it.

    ``probes=None`` (default) probes every cell — exact results, the
    safe default; pass the probed configuration you'd use in production
    (e.g. ``probes=[10]`` mirroring the reference's default probes GUC)
    to trade recall for latency."""
    _REGISTRY[table.lower()] = _Registration(
        index=index,
        id_col=id_col,
        vec_col=vec_col,
        probes=probes,
        epsilon=epsilon,
        rerank_factor=rerank_factor,
        maxsim_candidates=maxsim_candidates,
        maxsim_threshold=maxsim_threshold,
        search_kwargs=search_kwargs,
    )


def unregister_ann_index(table: str) -> None:
    _REGISTRY.pop(table.lower(), None)


def ann_sql(spark: SparkSession, query: str) -> DataFrame:
    """``spark.sql`` with transparent ANN: if the analyzed plan is a
    top-k-by-registered-distance query (or a strict ``distance < r``
    sphere filter), serve it from the index."""
    df = spark.sql(query)
    rewritten = try_rewrite_topk(spark, df)
    if rewritten is None:
        rewritten = try_rewrite_range(spark, df)
    return rewritten if rewritten is not None else df


# ---------------------------------------------------------------------------
# Catalyst plan inspection (py4j; defensive — any surprise shape → no rewrite)
# ---------------------------------------------------------------------------


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def sort_order_size(sort) -> int:
    return sort.order().size()


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _unwrap_cast(expr):
    while _cls(expr) in ("Cast", "AnsiCast"):
        expr = expr.children().apply(0)
    return expr


def _literal_array(expr) -> "list[float] | None":
    """CreateArray of foldable literals → python list of floats."""
    expr = _unwrap_cast(expr)
    if _cls(expr) != "CreateArray":
        return None
    out = []
    for item in _children(expr):
        item = _unwrap_cast(item)
        if _cls(item) != "Literal":
            return None
        v = item.value()
        if v is None:
            return None
        out.append(float(str(v)))
    return out


def _literal_nested_array(expr) -> "list[list[float]] | None":
    """CreateArray of CreateArrays of literals → list of float lists."""
    expr = _unwrap_cast(expr)
    if _cls(expr) != "CreateArray":
        return None
    out = []
    for item in _children(expr):
        sub = _literal_array(item)
        if sub is None:
            return None
        out.append(sub)
    return out


def _match_maxsim_udf(expr) -> "tuple[str, list[list[float]]] | None":
    """PythonUDF vc_maxsim(AttributeReference, nested literal array) →
    (multivector_col_name, query_tokens)."""
    if _cls(expr) != "PythonUDF" or str(expr.name()) != "vc_maxsim":
        return None
    args = _children(expr)
    if len(args) != 2:
        return None
    col_arg, lit_arg = args[0], args[1]
    toks = _literal_nested_array(lit_arg)
    if toks is None:
        toks, col_arg = _literal_nested_array(col_arg), lit_arg
    col_arg = _unwrap_cast(col_arg)
    if toks is None or _cls(col_arg) != "AttributeReference":
        return None
    return str(col_arg.name()), toks


def _match_distance_udf(expr) -> "tuple[str, str, list[float]] | None":
    """PythonUDF vc_*(AttributeReference, literal array) →
    (udf_name, vec_col_name, query_vector)."""
    if _cls(expr) != "PythonUDF":
        return None
    name = str(expr.name())
    if name not in _UDF_METRIC:
        return None
    args = _children(expr)
    if len(args) != 2:
        return None
    col_arg, lit_arg = args[0], args[1]
    # allow either argument order: vc_l2(col, q) or vc_l2(q, col)
    vec = _literal_array(lit_arg)
    if vec is None:
        vec, col_arg = _literal_array(col_arg), lit_arg
    col_arg = _unwrap_cast(col_arg)
    if vec is None or _cls(col_arg) != "AttributeReference":
        return None
    return name, str(col_arg.name()), vec


def _find_table_name(node) -> "str | None":
    """First SubqueryAlias identifier on the way down (temp views and
    catalog tables both surface one in the analyzed plan)."""
    if _cls(node) == "SubqueryAlias":
        try:
            return str(node.identifier().name())
        except Exception:
            return None
    kids = _children(node)
    if len(kids) == 1:
        return _find_table_name(kids[0])
    return None


def try_rewrite_topk(spark: SparkSession, df: DataFrame) -> "DataFrame | None":
    """Return an index-served equivalent of ``df`` if its analyzed plan is
    ``GlobalLimit(k) → LocalLimit → Sort(registered distance ASC) →
    Project → registered table``; else None."""
    try:
        return _try_rewrite(spark, df)
    except Exception:
        return None


def _try_rewrite(spark: SparkSession, df: DataFrame) -> "DataFrame | None":
    plan = df._jdf.queryExecution().analyzed()
    if _cls(plan) != "GlobalLimit":
        return None
    k_expr = plan.limitExpr()
    if _cls(k_expr) != "Literal":
        return None
    k = int(str(k_expr.value()))
    node = _children(plan)[0]
    if _cls(node) != "LocalLimit":
        return None
    node = _children(node)[0]
    # two analyzed shapes:
    #   A) SELECT ..., vc_l2(...) AS d ... ORDER BY d      → Sort → Project
    #   B) SELECT ... ORDER BY vc_l2(...) (inline)          → Project → Sort → Project
    outer_proj = None
    if _cls(node) == "Project":
        outer_proj = node
        node = _children(node)[0]
    if _cls(node) != "Sort" or sort_order_size(node) != 1:
        return None
    sort = node
    so = sort.order().apply(0)
    if "Ascending" not in str(so.direction()):
        return None
    proj = _children(sort)[0]
    if _cls(proj) != "Project":
        return None
    # the SELECT list is the outer Project when present (shape B), else the
    # Project under the Sort (shape A)
    sel_proj = outer_proj if outer_proj is not None else proj
    proj_list = [
        sel_proj.projectList().apply(i)
        for i in range(sel_proj.projectList().size())
    ]

    # the sort key: either a distance/maxsim UDF inline, or an attribute
    # that resolves (by exprId) to a projected alias of one
    sort_expr = so.child()
    if _cls(sort_expr) == "AttributeReference":
        want = sort_expr.exprId().id()
        below = [proj.projectList().apply(i) for i in range(proj.projectList().size())]
        for ne in below:
            if _cls(ne) == "Alias" and ne.exprId().id() == want:
                sort_expr = ne.child()
                break

    table = _find_table_name(proj)
    if table is None:
        return None
    reg = _REGISTRY.get(table.lower())
    if reg is None:
        return None

    match = _match_distance_udf(sort_expr)
    if match is None:
        mm = _match_maxsim_udf(sort_expr)
        if mm is not None:
            return _serve_maxsim(spark, reg, mm, proj_list, table, k)
        return None
    udf_name, vec_col, qvec = match
    if reg.vec_col != vec_col:
        return None
    if reg.index.meta["metric"] != _UDF_METRIC[udf_name]:
        return None

    if reg.search_kwargs is not None:
        res = reg.index.search(qvec, k=k, **reg.search_kwargs)
    else:
        res = reg.index.search(
            qvec,
            k=k,
            probes=reg.probes,
            epsilon=reg.epsilon,
            rerank_factor=reg.rerank_factor,
        )  # (id, dist), already ordered and limited

    def matches(expr) -> bool:
        m = _match_distance_udf(expr)
        return m is not None and m[1] == vec_col and m[2] == qvec

    built = _build_output(spark, reg, res, proj_list, matches, table)
    if built is None:
        return None
    joined, sel = built
    return joined.orderBy("dist", "id").select(*sel).limit(k)


def _build_output(spark, reg, res, proj_list, matches_dist, table, bounded=True):
    """Map the query's projection onto the index result (id, dist): plain
    attributes come from a join back to the table, a projected alias for
    which ``matches_dist(expr)`` is true becomes ``dist``. Returns
    (joined_df, select_list) or None when an unrelated computed column
    blocks the rewrite.

    ``bounded=True`` (top-k: the result is k rows) broadcasts the result
    side so the join never shuffles the base table; a sphere result has no
    row bound, so the range path leaves the strategy to AQE."""
    out_cols: list = []
    need_table_join = False
    for ne in proj_list:
        nm = str(ne.name())
        if _cls(ne) == "Alias":
            if matches_dist(ne.child()):
                out_cols.append(("dist", nm))
                continue
            return None  # unrelated computed column — don't rewrite
        if nm == reg.id_col:
            out_cols.append(("id", nm))
        else:
            out_cols.append(("table", nm))
            need_table_join = True
    if need_table_join:
        base = spark.table(table).withColumnRenamed(reg.id_col, "id")
        joined = base.join(F.broadcast(res) if bounded else res, "id", "inner")
    else:
        joined = res
    sel = []
    for src, nm in out_cols:
        if src == "dist":
            sel.append(F.col("dist").alias(nm))
        elif src == "id":
            sel.append(F.col("id").alias(nm))
        else:
            sel.append(F.col(nm))
    return joined, sel


def _serve_maxsim(spark, reg, mm, proj_list, table, k) -> "DataFrame | None":
    """Serve ``ORDER BY vc_maxsim(vecs_col, tokens) LIMIT k`` from a
    multi-vector index (the reference's ``@#`` order-by strategy,
    src/index/vchordrq/opclass.rs:70-141 + scanners/maxsim.rs). Requires a
    ``build_multivector`` dot-metric index registered on the column; exact
    when ``maxsim_candidates`` is exhaustive (the default)."""
    vecs_col, toks = mm
    if reg.vec_col != vecs_col:
        return None
    meta = reg.index.meta
    if not meta.get("multivector") or meta["metric"] != "dot":
        return None
    from vectorchord_spark.operators.maxsim import maxsim_search

    res = maxsim_search(
        reg.index,
        None,
        toks,
        k=k,
        per_token_candidates=reg.maxsim_candidates,
        probes=reg.probes,
        epsilon=reg.epsilon,
        maxsim_threshold=reg.maxsim_threshold,
    ).select(F.col("doc_id").alias("id"), F.col("score").alias("dist"))

    def matches(expr) -> bool:
        return _match_maxsim_udf(expr) == (vecs_col, toks)

    built = _build_output(spark, reg, res, proj_list, matches, table)
    if built is None:
        return None
    joined, sel = built
    return joined.orderBy("dist", "id").select(*sel).limit(k)


def try_rewrite_range(spark: SparkSession, df: DataFrame) -> "DataFrame | None":
    """Rewrite ``SELECT ... FROM registered WHERE vc_*(col, q) < r`` (the
    sphere/range-filter shape — the reference's ``<<->>`` strategy,
    scanners/default.rs:104-121) onto ``IvfIndex.range_search``. Only the
    strict ``<`` comparison matches (the reference's take_while contract)."""
    try:
        return _try_rewrite_range(spark, df)
    except Exception:
        return None


def _try_rewrite_range(spark: SparkSession, df: DataFrame) -> "DataFrame | None":
    plan = df._jdf.queryExecution().analyzed()
    if _cls(plan) != "Project":
        return None
    filt = _children(plan)[0]
    if _cls(filt) != "Filter":
        return None
    cond = filt.condition()
    sides = None
    if _cls(cond) == "LessThan":
        sides = (_children(cond)[0], _children(cond)[1])
    elif _cls(cond) == "GreaterThan":  # r > dist(col, q)
        sides = (_children(cond)[1], _children(cond)[0])
    if sides is None:
        return None
    udf_side, lit_side = sides
    match = _match_distance_udf(udf_side)
    if match is None:
        return None
    lit_side = _unwrap_cast(lit_side)
    if _cls(lit_side) != "Literal" or lit_side.value() is None:
        return None
    radius = float(str(lit_side.value()))
    udf_name, vec_col, qvec = match

    table = _find_table_name(filt)
    if table is None:
        return None
    reg = _REGISTRY.get(table.lower())
    if reg is None or reg.vec_col != vec_col:
        return None
    if reg.index.meta["metric"] != _UDF_METRIC[udf_name]:
        return None
    if not hasattr(reg.index, "range_search"):
        return None  # e.g. a graph index: top-k only

    proj_list = [plan.projectList().apply(i) for i in range(plan.projectList().size())]
    res = reg.index.range_search(
        qvec, radius, probes=reg.probes, epsilon=reg.epsilon
    )  # (id, dist) with dist < radius

    def matches(expr) -> bool:
        m = _match_distance_udf(expr)
        return m is not None and m[1] == vec_col and m[2] == qvec

    built = _build_output(
        spark, reg, res, proj_list, matches, table, bounded=False
    )
    if built is None:
        return None
    joined, sel = built
    return joined.select(*sel)
