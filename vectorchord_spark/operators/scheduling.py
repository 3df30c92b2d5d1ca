"""Longest-processing-time-first (LPT) task layout for grouped
applyInPandas stages.

Spark launches tasks in partition-index order, and a groupBy →
applyInPandas stage over skewed CPU-bound groups (graph shards, SemDeDup
clusters) pays a makespan penalty when a big group lands in the tail
wave — measured ~12s of a 95s 1M-row graph build. The classic fix is
LPT scheduling: start the biggest groups first. Spark has no task-order
API, but partition INDEX is controllable: for hash partitioning the
index is ``pmod(murmur3(key), n)``, so for every target index there is a
small int ("golden key") that lands exactly there. Mapping each group to
the golden key of its size-rank partition turns a plain
``repartition(n, key_col)`` into strict LPT launch order — no custom
partitioner, no extra shuffle (HashPartitioning on the key column
satisfies the grouped distribution when the key is included in the
grouping columns), and no empty partitions.

First used by the graph build (`operators/graph.py`); `lpt_grouped_apply`
is the reusable form for any (group → pandas fn) stage.
"""

from __future__ import annotations

from typing import Callable, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: above this group count, lpt_grouped_apply ships the group→partition
#: mapping as a broadcast-joined frame instead of a create_map literal —
#: a 10⁵-entry literal map is O(#groups) PLAN nodes that every optimizer
#: rule re-walks; the join keeps plan size constant at any group count
_LPT_MAP_LITERAL_MAX = 4096


def spark_int_hash(k: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt (what ``F.hash``/HashPartitioning
    compute for an int32 column, seed 42) — verified bit-equal against
    ``F.hash`` on positive/negative/extreme int32 values in tests."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    k1 = (k & 0xFFFFFFFF) * 0xCC9E2D51 & 0xFFFFFFFF
    k1 = rotl(k1, 15) * 0x1B873593 & 0xFFFFFFFF
    h1 = seed ^ k1
    h1 = (rotl(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def lpt_partition_keys(n: int) -> list[int]:
    """For each partition index p in [0, n): a small non-negative int key
    with ``pmod(murmur3(key), n) == p``. Expected search cost is
    O(n·log n) hash evaluations (coupon collector)."""
    keys: list[int | None] = [None] * n
    found, k = 0, 0
    while found < n:
        idx = spark_int_hash(k) % n
        if keys[idx] is None:
            keys[idx] = k
            found += 1
        k += 1
    return keys  # type: ignore[return-value]


def lpt_grouped_apply(
    df: DataFrame,
    key_col: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    sizes: Mapping[int, float] | None = None,
    max_partitions: int | None = None,
) -> DataFrame:
    """``df.groupBy(key_col).applyInPandas(fn, schema)`` with LPT launch
    order: one group per partition, biggest group first.

    ``sizes`` maps group key → cost estimate (row count is the usual
    proxy; pass a superlinear transform for quadratic-cost groups). When
    None, a narrow count pass derives it (one JVM aggregation over the
    key column only; driver memory O(#groups) — the same bound the
    golden-key array needs anyway). ``fn`` receives the group's rows
    including the extra ``_lpt_pkey`` column; its output must match
    ``schema`` exactly (the usual applyInPandas contract).

    ``max_partitions`` caps the task count by LPT *bin-packing* groups
    into that many partitions (biggest group into the least-loaded bin;
    bins launch heaviest-first). One-partition-per-group is right for a
    few hundred heavy groups — the dynamic scheduler keeps load
    balanced — but at 10⁴-10⁵ TINY groups (the SemDeDup k=10k+ regime)
    per-task overhead dominates: 4096 one-group tasks measured ~60s of
    pure scheduling at ~24 rows/group. applyInPandas still delivers each
    group separately within a shared partition, so ``fn`` semantics are
    unchanged.
    """
    if sizes is None:
        sizes = {
            r[0]: r[1]
            for r in df.groupBy(key_col).agg(F.count(F.lit(1))).collect()
        }
    groups = sorted(sizes, key=lambda g: (-sizes[g], g))
    if max_partitions is not None and len(groups) > max_partitions:
        import heapq

        n = max(1, int(max_partitions))
        heap = [(0.0, b) for b in range(n)]
        bin_of: dict = {}
        loads = [0.0] * n
        for g in groups:  # descending cost → classic LPT packing
            load, b = heapq.heappop(heap)
            bin_of[g] = b
            loads[b] = load + float(sizes[g])
            heapq.heappush(heap, (loads[b], b))
        # heaviest bin launches first: rank bins by final load
        rank_of_bin = {
            b: r
            for r, b in enumerate(
                sorted(range(n), key=lambda b: (-loads[b], b))
            )
        }
        keys = lpt_partition_keys(n)
        mapping = {g: keys[rank_of_bin[bin_of[g]]] for g in groups}
    else:
        n = max(1, len(groups))
        keys = lpt_partition_keys(n)
        mapping = {g: keys[rank] for rank, g in enumerate(groups)}
    if len(groups) <= _LPT_MAP_LITERAL_MAX:
        mexpr = F.create_map(
            *[x for g, k in mapping.items() for x in (F.lit(g), F.lit(int(k)))]
        )
        keyed = df.withColumn("_lpt_pkey", mexpr[F.col(key_col)].cast("int"))
    else:
        # above the literal budget a create_map would inline O(#groups)
        # plan nodes (10⁵ groups → a 10⁵-node expression the optimizer
        # re-walks per rule); ship the mapping as a broadcast-joined frame
        # instead — same row routing, constant plan size, no extra shuffle
        # on the data side
        spark = df.sparkSession
        from pyspark.sql.types import IntegerType, StructField, StructType

        # build the mapping frame in the key's ACTUAL dtype — the
        # create_map literal path supports string/any keys, and this
        # path must not silently diverge above the literal budget
        key_type = df.schema[key_col].dataType
        tn = key_type.typeName()
        conv: Callable = (
            int if tn in ("byte", "short", "integer", "long")
            else str if tn == "string"
            else float if tn in ("float", "double")
            else (lambda x: x)
        )
        mdf = spark.createDataFrame(
            [(conv(g), int(k)) for g, k in mapping.items()],
            StructType([
                StructField(key_col, key_type),
                StructField("_lpt_pkey", IntegerType()),
            ]),
        )
        keyed = df.join(F.broadcast(mdf), key_col, "left")
    return (
        keyed.repartition(n, "_lpt_pkey")
        .groupBy("_lpt_pkey", key_col)
        .applyInPandas(fn, schema)
    )
