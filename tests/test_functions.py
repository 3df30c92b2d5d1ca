"""Scalar operator surface tests (mirrors tests/general/*.slt goldens)."""

import numpy as np
from pyspark.sql import functions as F

from vectorchord_spark import functions as V


def test_distance_goldens(spark):
    # /root/reference/tests/general/distance.slt
    df = spark.range(1).select(
        V.vec_lit([1, 2, 3]).alias("a"), V.vec_lit([2, 3, 4]).alias("b")
    )
    row = df.select(
        F.round(V.l2("a", "b"), 3).alias("l2"),
        F.round(V.ip("a", "b"), 3).alias("ip"),
        F.round(V.cosine_distance("a", "b"), 3).alias("cos"),
    ).first()
    assert row.l2 == 1.732
    assert row.ip == -20.0
    assert row.cos == 0.007


def test_sphere_semantics(spark):
    # FIXTURES.md F3 / tests/vchordrq/pushdown_range.slt: threshold applies
    # to the *output* (sqrt'd) distance
    rows = [([0.1] * 3,), ([0.2] * 3,), ([0.3] * 3,), ([0.4] * 3,)]
    df = spark.createDataFrame(rows, "val array<float>")
    center = [0.24, 0.24, 0.24]
    got = (
        df.where(V.sphere_contains("l2", "val", V.vec_lit(center), 0.12))
        .orderBy(V.l2("val", V.vec_lit(center)))
        .select("val")
        .collect()
    )
    assert [[round(x, 1) for x in r.val] for r in got] == [
        [0.2, 0.2, 0.2],
        [0.3, 0.3, 0.3],
    ]


def test_maxsim_expression(spark):
    # MaxSim = sum over query tokens of min over doc tokens of -dot
    doc = [[1.0, 0.0], [0.0, 1.0]]
    q = [[1.0, 1.0], [2.0, 0.0]]
    df = spark.createDataFrame([(doc,)], "val array<array<float>>")
    got = df.select(V.maxsim("val", q).alias("m")).first().m
    # token1: min(-1, -1) = -1 ; token2: min(-2, 0) = -2 → -3
    assert abs(got - (-3.0)) < 1e-9


def test_maxsim_reference_golden(spark):
    """The reference's own multivector fixture at full size: 10k rows of
    3x dim-2 cos/sin tokens; the expected 18-id order is copied verbatim
    from /root/reference/tests/vchordrq/multivector.slt:30-49."""
    import math

    n = 10000
    rows = []
    for i in range(1, n + 1):
        toks = []
        for j in (0, 22, 777):
            ang = ((i + j) % n) / float(n) * 6.283185307179586
            toks.append([float(np.float32(math.cos(ang))), float(np.float32(math.sin(ang)))])
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "id int, val array<array<float>>")
    q = [
        [0.7197411498053302, 0.6942425205048314],
        [0.10645067063129976, 0.9943179847122079],
    ]
    got = [r.id for r in df.orderBy(V.maxsim("val", q), "id").limit(18).collect()]
    expected = [
        1387, 1388, 1386, 1389, 1385, 1390, 1384, 1391, 1383,
        1392, 1382, 1393, 1381, 1394, 1380, 1395, 1379, 1396,
    ]
    assert got == expected


def test_maxsim_fixture_order(spark):
    """FIXTURES.md F4 (tests/vchordrq/multivector.slt:30-49): exact id order
    for the cos/sin constructed fixture, scaled down to 2k rows."""
    n = 2000
    import math

    rows = []
    for i in range(1, n + 1):
        toks = []
        for j in (0, 22, 777):
            ang = 2 * math.pi * ((i + j) % n) / n
            toks.append([math.cos(ang), math.sin(ang)])
        rows.append((i, toks))
    df = spark.createDataFrame(rows, "id int, val array<array<float>>")
    q = [
        [0.7197411498053302, 0.6942425205048314],
        [0.10645067063129976, 0.9943179847122079],
    ]
    got = [
        r.id
        for r in df.orderBy(V.maxsim("val", q), "id").limit(6).collect()
    ]
    # brute-force numpy oracle
    qm = np.array(q)
    best = []
    for i in range(1, n + 1):
        toks = np.array(
            [
                [
                    math.cos(2 * math.pi * ((i + j) % n) / n),
                    math.sin(2 * math.pi * ((i + j) % n) / n),
                ]
                for j in (0, 22, 777)
            ]
        )
        best.append((float(np.sum(np.min(-(qm @ toks.T), axis=1))), i))
    best.sort()
    assert got == [i for _, i in best[:6]]


def test_quantize_dequantize_roundtrip(spark):
    # /root/reference/tests/general/dequantize.slt error contracts
    df = spark.createDataFrame(
        [([float(x) for x in range(1, 9)],)], "v array<float>"
    )
    for bits, bound in [(8, 0.07), (4, 1.00)]:
        out = df.select(
            V.l2(
                V.dequantize_to_vector(
                    V.quantize_to_rabitq("v", bits=bits), bits=bits
                ),
                "v",
            ).alias("err")
        ).first()
        assert out.err < bound, (bits, out.err)


def test_rabitq_distance_estimates(spark):
    rng = np.random.default_rng(0)
    a = rng.normal(size=32).astype(np.float32)
    b = rng.normal(size=32).astype(np.float32)
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a array<float>, b array<float>"
    )
    df = df.select(
        "a",
        "b",
        V.quantize_to_rabitq("a").alias("qa"),
        V.quantize_to_rabitq("b").alias("qb"),
    )
    row = df.select(
        V.l2("a", "b").alias("exact_l2"),
        V.rabitq_distance("l2", "qa", "qb").alias("est_l2"),
        V.ip("a", "b").alias("exact_ip"),
        V.rabitq_distance("dot", "qa", "qb").alias("est_ip"),
    ).first()
    assert abs(row.est_l2 - row.exact_l2) / row.exact_l2 < 0.05
    assert abs(row.est_ip - row.exact_ip) < 0.5


def test_sql_registration(spark):
    V.register_sql_functions(spark)
    row = spark.sql(
        "SELECT round(vc_l2(array(1.0,2.0,3.0), array(2.0,3.0,4.0)), 3) AS d"
    ).first()
    assert row.d == 1.732
