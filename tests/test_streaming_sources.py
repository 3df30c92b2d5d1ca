"""Streaming insert / windowed rollup and vector source/sink tests."""

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.operators.ivf import IvfIndex, IvfOptions
from vectorchord_spark.sources import parse_vector, read_vectors, vector_to_text, write_vectors
from vectorchord_spark.streaming import (
    hourly_event_counts_stream,
    streaming_index_insert,
)


def test_parse_vector_roundtrip(spark):
    df = spark.createDataFrame(
        [("[1, 2.5, -3]",), ("[0,0,1e2]",)], "s string"
    )
    out = df.select(parse_vector("s").alias("v")).collect()
    assert out[0].v == [1.0, 2.5, -3.0]
    assert out[1].v == [0.0, 0.0, 100.0]
    back = (
        df.select(parse_vector("s").alias("v"))
        .select(vector_to_text("v").alias("s"))
        .collect()
    )
    assert back[0].s == "[1.0,2.5,-3.0]"


def test_csv_vector_roundtrip(spark):
    with tempfile.TemporaryDirectory() as tmp:
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, vec array<float>"
        )
        write_vectors(df, f"{tmp}/v", fmt="csv")
        back = read_vectors(
            spark, f"{tmp}/v", fmt="csv", text_encoded=True,
            schema="id long, vec string",
        )
        rows = {r.id: r.vec for r in back.collect()}
        assert rows[1] == [1.0, 2.0] and rows[2] == [3.0, 4.0]


def test_streaming_index_insert(spark):
    rng = np.random.default_rng(0)
    base = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(500)],
        "id long, vec array<float>",
    )
    with tempfile.TemporaryDirectory() as tmp:
        idx = IvfIndex.build(
            spark, base, "id", "vec", f"{tmp}/idx", IvfOptions(metric="l2", lists=[8])
        )
        src = f"{tmp}/incoming"
        os.makedirs(src)
        extra = spark.createDataFrame(
            [(1000 + i, [float(x) for x in rng.normal(size=8)]) for i in range(100)],
            "id long, vec array<float>",
        )
        extra.write.mode("append").parquet(src)
        q = streaming_index_insert(
            idx, src, f"{tmp}/ckpt", schema="id long, vec array<float>"
        )
        q.awaitTermination(120)
        got = idx.search([0.0] * 8, k=600, probes=None, rerank_factor=None).count()
        assert got == 600  # all 500 base + 100 streamed rows indexed

        # idempotency under epoch replay: wipe the checkpoint (the
        # crashed-between-append-and-commit scenario — epoch 0 fires again
        # for the same stream) and rerun; the epoch marker skips the
        # duplicate append
        shutil.rmtree(f"{tmp}/ckpt")
        q2 = streaming_index_insert(
            idx, src, f"{tmp}/ckpt", schema="id long, vec array<float>"
        )
        q2.awaitTermination(120)
        got2 = idx.search([0.0] * 8, k=700, probes=None, rerank_factor=None).count()
        assert got2 == 600  # replayed epoch appended nothing


def test_streaming_dedup(spark):
    from vectorchord_spark.streaming import streaming_dedup

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        os.makedirs(src)
        spark.createDataFrame(
            [(1, "aaa", 1000), (2, "bbb", 1000), (3, "aaa", 1001)],
            "id long, text string, ts long",
        ).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(4, "bbb", 2000), (5, "ccc", 2000)],
            "id long, text string, ts long",
        ).write.mode("append").parquet(src)
        q = streaming_dedup(
            spark, src, f"{tmp}/ckpt", f"{tmp}/out",
            schema="id long, text string, ts long", key_cols=["text"],
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{tmp}/out")
        texts = sorted(r.text for r in out.collect())
        assert texts == ["aaa", "bbb", "ccc"]  # one survivor per key


def test_hourly_stream_matches_batch(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        q = hourly_event_counts_stream(
            spark, sf_dir, f"{tmp}/ckpt", query_name="hourly_test"
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT count(*) AS n, sum(n) AS total FROM hourly_test"
        ).first()
        from vectorchord_spark.sources.events import read_events

        ev = read_events(spark, sf_dir)
        batch = (
            ev.withColumn("t", F.timestamp_micros(F.col("ts_us")))
            .groupBy(F.date_trunc("hour", "t"), "event_type")
            .count()
        )
        # watermark drops nothing in availableNow mode over sorted history
        # except possibly the trailing open window; allow ≤ #types slack
        assert abs(got.n - batch.count()) <= 5
        assert got.total <= ev.count()


def test_streaming_sessionize_stateful(spark, sf_dir):
    """applyInPandasWithState sessionization: emitted (closed) sessions must
    agree with the batch sessionizer for the same gap."""
    from vectorchord_spark.streaming import streaming_sessionize

    with tempfile.TemporaryDirectory() as tmp:
        q = streaming_sessionize(
            spark, sf_dir, f"{tmp}/ckpt", gap_minutes=30, query_name="sess_test"
        )
        q.awaitTermination(180)
        got = spark.sql(
            "SELECT user_id, session_start, n_events, round(total_value, 2) AS tv "
            "FROM sess_test"
        ).collect()
        got_set = {(r.user_id, r.session_start, r.n_events, r.tv) for r in got}
        # batch oracle
        from vectorchord_spark.queries import catalog

        batch = catalog()["sessionize"].fn(spark, sf_dir).collect()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        import datetime

        batch_set = set()
        for r in batch:
            start_us = int(
                datetime.datetime.strptime(
                    r.session_start, "%Y-%m-%d %H:%M:%S"
                ).replace(tzinfo=datetime.timezone.utc).timestamp()
            )
            batch_set.add((r.user_id, start_us, r.n_events, r.total_value))
        got_trunc = {(u, s // 1_000_000, n, v) for (u, s, n, v) in got_set}
        # the stream can only emit *closed* sessions (the last session per
        # user may still be open at end-of-input), so stream ⊆ batch and
        # covers all but ≤ 1 session per user
        assert got_trunc <= batch_set
        n_users = len({u for (u, *_rest) in batch_set})
        assert len(got_trunc) >= len(batch_set) - n_users


def test_prewarm(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        idx = IvfIndex.build(
            spark, emb, "vec_id", "embedding", f"{tmp}/idx",
            IvfOptions(metric="l2", lists=[8]),
        )
        assert idx.prewarm() == emb.count()


def test_binary_wire_roundtrip(spark):
    """S10 send/recv: pgvector vector wire format and the reference's
    rabitq8 stream (binary_rabitq8.rs:21-36) round-trip exactly."""
    import numpy as np

    from vectorchord_spark.functions import quantize as Qz
    from vectorchord_spark.sources.tables import (
        binary_to_rabitq,
        binary_to_vector,
        rabitq_to_binary,
        vector_to_binary,
    )

    rng = np.random.default_rng(5)
    rows = [(i, rng.uniform(-1, 1, 16).astype("f4").tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    rt = df.select(
        "id", "vec", binary_to_vector(vector_to_binary("vec")).alias("back")
    )
    assert rt.where(F.col("vec") != F.col("back")).count() == 0
    # wire bytes are the documented layout: u16 dim BE + u16 zero + f32 BE
    first = df.select(vector_to_binary("vec").alias("b")).first().b
    assert first[:2] == (16).to_bytes(2, "big") and first[2:4] == b"\x00\x00"
    assert len(first) == 4 + 4 * 16

    q = df.select("id", Qz.quantize_to_rabitq("vec", bits=8).alias("q"))
    back = q.select(
        "id",
        F.col("q").alias("orig"),
        binary_to_rabitq(rabitq_to_binary("q")).alias("rq"),
    )
    assert back.where(F.col("orig") != F.col("rq")).count() == 0
    blob = q.select(rabitq_to_binary("q").alias("b")).first().b
    assert blob[:4] == (16).to_bytes(4, "big") and len(blob) == 20 + 16


def test_streaming_knn_serve(spark):
    """Streaming ANN serving: query vectors landing as files are answered
    per micro-batch with one search_batch pass; results must equal the
    per-query exhaustive searches."""
    from vectorchord_spark.streaming import streaming_knn_serve

    rng = np.random.default_rng(71)
    base = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(800)],
        "id long, vec array<float>",
    )
    with tempfile.TemporaryDirectory() as tmp:
        idx = IvfIndex.build(
            spark, base, "id", "vec", f"{tmp}/idx", IvfOptions(metric="l2", lists=[8])
        )
        qsrc = f"{tmp}/queries"
        os.makedirs(qsrc)
        queries = [(qi, [float(x) for x in rng.normal(size=8)]) for qi in range(5)]
        spark.createDataFrame(
            queries, "qid long, query array<float>"
        ).write.mode("append").parquet(qsrc)
        q = streaming_knn_serve(
            idx, qsrc, f"{tmp}/ckpt", f"{tmp}/out",
            k=5, probes=None, rerank_factor=None,
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{tmp}/out")
        got = {}
        for r in out.collect():
            got.setdefault(r.qid, []).append((r.rank, r.id))
        assert set(got) == {0, 1, 2, 3, 4}
        for qi, qv in queries:
            want = [
                r.id
                for r in idx.search(qv, k=5, probes=None, rerank_factor=None).collect()
            ]
            assert [i for _, i in sorted(got[qi])] == want


def test_minhash_band_keys_match_batch_banding(spark):
    """The per-row band-key expression must reproduce the batch
    minhash_signatures + banding exactly (same md5 family, same string
    min, same band concat) — the equivalence that makes the streaming
    near-dup the batch op's true online twin."""
    from vectorchord_spark.pipeline.dedup import minhash_signatures
    from vectorchord_spark.streaming import minhash_band_keys

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    num_hashes, band_rows = 8, 2
    per_row = {
        r.doc_id: list(r.keys)
        for r in df.select(
            "doc_id",
            minhash_band_keys("text", 3, num_hashes, band_rows).alias("keys"),
        ).collect()
    }
    sig = {r.doc_id: r for r in minhash_signatures(df, num_hashes=num_hashes).collect()}
    import hashlib

    for did, row in sig.items():
        want = []
        for b in range(num_hashes // band_rows):
            concat = "".join(
                row[f"mh{b * band_rows + r}"] for r in range(band_rows)
            )
            want.append(hashlib.md5(concat.encode()).hexdigest())
        assert per_row[did] == want, did


def test_streaming_neardup_pairs_stateful(spark):
    """Stateful streaming near-dup: duplicates arriving in LATER
    micro-batches pair with the first-seen canonical doc (state carries
    across batches); the emitted star induces the same dedup components
    as the batch all-pairs band join."""
    from vectorchord_spark.pipeline.dedup import minhash_lsh_pairs
    from vectorchord_spark.streaming import streaming_neardup_pairs

    d_main = "the quick brown fox jumps over the lazy dog again and again"
    d_other = "completely different words about storage engines and parquet"
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        os.makedirs(src)
        # batch 1: canonical docs
        spark.createDataFrame(
            [(1, d_main), (2, d_other)], "doc_id long, text string"
        ).write.mode("append").parquet(src)
        q = streaming_neardup_pairs(spark, src, f"{tmp}/ckpt", f"{tmp}/out")
        q.awaitTermination(120)
        # batch 2: two near-dups of doc 1 land later
        spark.createDataFrame(
            [(7, d_main), (9, d_main)], "doc_id long, text string"
        ).write.mode("append").parquet(src)
        q2 = streaming_neardup_pairs(spark, src, f"{tmp}/ckpt", f"{tmp}/out")
        q2.awaitTermination(120)
        got = {
            (r.ida, r.idb)
            for r in spark.read.parquet(f"{tmp}/out").collect()
        }
        # star to the canonical doc 1; doc 2 never pairs
        assert got == {(1, 7), (1, 9)}, got
        # same components as the batch clique {(1,7),(1,9),(7,9)}
        batch_pairs = {
            (r.ida, r.idb)
            for r in minhash_lsh_pairs(
                spark.createDataFrame(
                    [(1, d_main), (2, d_other), (7, d_main), (9, d_main)],
                    "doc_id long, text string",
                )
            ).collect()
        }
        assert batch_pairs == {(1, 7), (1, 9), (7, 9)}

        def comps(pairs, nodes):
            parent = {x: x for x in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                parent[find(a)] = find(b)
            groups = {}
            for x in nodes:
                groups.setdefault(find(x), set()).add(x)
            return {frozenset(g) for g in groups.values()}

        nodes = {1, 2, 7, 9}
        assert comps(got, nodes) == comps(batch_pairs, nodes)


def test_streaming_neardup_state_ttl_plateaus(spark):
    """Bounded-state contract: with state_ttl_seconds set (continuous
    trigger), band keys idle past the TTL are evicted, so state size
    tracks the ACTIVE window's distinct keys instead of growing with
    every key ever seen. Two disjoint-content waves separated by > TTL:
    state must peak at wave-1's 40 keys, then plateau at wave-2's 24
    (wave-1 evicted) rather than the cumulative 64. Also: TTL with
    available_now=True must be rejected (the backfill would never
    terminate)."""
    import time

    from vectorchord_spark.streaming import streaming_neardup_pairs

    def wave(tag, ids):
        return [(i, f"wave {tag} doc {i} unique words " + " ".join(
            f"{tag}t{i}w{j}" for j in range(8))) for i in ids]

    with pytest.raises(ValueError, match="available_now"):
        streaming_neardup_pairs(
            spark, "/tmp/x", "/tmp/y", "/tmp/z",
            state_ttl_seconds=1.0, available_now=True,
        )

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        os.makedirs(src)
        n_bands = 4  # 8 hashes / 2 rows
        ttl = 6.0

        def state_total(q):
            for pr in reversed(q.recentProgress):
                if pr["stateOperators"]:
                    return pr["stateOperators"][0]["numRowsTotal"]
            return None

        def wait_for(q, want, deadline_s=90):
            t0 = time.time()
            while time.time() - t0 < deadline_s:
                if state_total(q) == want:
                    return True
                time.sleep(0.5)
            return False

        spark.createDataFrame(
            wave("a", range(10)), "doc_id long, text string"
        ).write.mode("append").parquet(src)
        q = streaming_neardup_pairs(
            spark, src, f"{tmp}/ckpt", f"{tmp}/out",
            state_ttl_seconds=ttl, available_now=False,
        )
        try:
            # 10 unique docs x 4 bands = 40 distinct band keys
            assert wait_for(q, 10 * n_bands), state_total(q)
            time.sleep(ttl + 2)  # let wave-a go idle past the TTL
            spark.createDataFrame(
                wave("b", range(100, 106)), "doc_id long, text string"
            ).write.mode("append").parquet(src)
            # plateau: wave-a's 40 keys evicted, only wave-b's 24 remain
            assert wait_for(q, 6 * n_bands), state_total(q)
        finally:
            q.stop()
        # offline confirmation from the committed checkpoint itself
        st = spark.read.format("statestore").load(f"{tmp}/ckpt")
        assert st.count() <= 6 * n_bands


def test_streaming_neardup_event_time_ttl(spark):
    """Event-time TTL (r11 verdict #6): eviction keyed to the DATA's
    timestamps via the watermark, not wall-clock idleness — so it is
    replay-safe (composes with availableNow backfills, which terminate)
    and a stalled-then-resumed stream keeps state a processing-time TTL
    would have evicted. Five availableNow phases over one checkpoint:

      1. canonical doc 1 at T0            -> state created
      2. dup 7 at T0+30s (inside the 60s event-time TTL, though phases
         are separated by arbitrary wall time) -> pair (1, 7) emitted
      3. unrelated doc at T0+3h           -> watermark jumps past the
         doc-1 keys' timeout (but eviction needs a later batch)
      4. unrelated doc                    -> doc-1 keys EVICTED
      5. dup 9 of doc 1 at T0+3h+2s       -> NO pair to 1 (new hub)
    """
    import datetime

    from vectorchord_spark.streaming import streaming_neardup_pairs

    d_main = "the quick brown fox jumps over the lazy dog again and again"

    def other(tag):
        return f"unrelated {tag} content " + " ".join(
            f"{tag}w{j}" for j in range(8)
        )

    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    schema = "doc_id long, text string, ts timestamp"
    kw = dict(
        schema=schema,
        state_ttl_seconds=60.0,
        event_time_col="ts",
        watermark_delay="0 seconds",
        available_now=True,  # allowed in event mode; must terminate
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        os.makedirs(src)

        def run_phase(rows):
            spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
            from vectorchord_spark.streaming import streaming_neardup_pairs

            q = streaming_neardup_pairs(
                spark, src, f"{tmp}/ckpt", f"{tmp}/out", **kw
            )
            assert q.awaitTermination(120)

        run_phase([(1, d_main, ts(0))])
        run_phase([(7, d_main, ts(30))])            # inside event TTL
        run_phase([(50, other("x"), ts(3 * 3600))])  # watermark jump
        run_phase([(51, other("y"), ts(3 * 3600 + 1))])  # fires eviction
        run_phase([(9, d_main, ts(3 * 3600 + 2))])   # past TTL: new hub

        got = {
            (r.ida, r.idb)
            for r in spark.read.parquet(f"{tmp}/out").collect()
        }
        assert got == {(1, 7)}, got  # 9 never pairs with the evicted hub

        # offline: doc-1/7's band keys are gone; only the post-eviction
        # keys (doc 50, 51, 9 hubs) remain
        st = spark.read.format("statestore").load(f"{tmp}/ckpt")
        firsts = {r.value.groupState.first for r in st.collect()}
        assert 1 not in firsts and 7 not in firsts
        assert 9 in firsts


def test_streaming_neardup_event_ttl_nonutc_session(spark):
    """The event-time timeout must be armed at the true UTC epoch of
    last-seen-event + TTL even when the session timezone is not UTC
    (applyInPandasWithState hands the worker tz-NAIVE session-local
    timestamps, while GroupState timeouts are UTC epoch ms — interpreting
    local wall-clock as UTC shifts eviction by the UTC offset)."""
    import datetime

    from vectorchord_spark.streaming import streaming_neardup_pairs

    tz = "America/New_York"  # UTC-5 (winter)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        # tz-AWARE instant (unambiguous): 2026-01-01T10:00:00Z. The worker
        # receives it converted to the session tz and made tz-naive
        # (05:00 NY wall clock); unlocalized naive-as-UTC arithmetic would
        # arm the timeout 5h early (05:01Z instead of 10:01Z).
        t0 = datetime.datetime(
            2026, 1, 1, 10, 0, 0, tzinfo=datetime.timezone.utc
        )
        utc_epoch_ms = 1_767_261_600_000  # 2026-01-01T10:00:00Z
        ttl = 60.0
        schema = "doc_id long, text string, ts timestamp"
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/in"
            os.makedirs(src)
            spark.createDataFrame(
                [(1, "a b c d e f g h i j", t0)], schema
            ).write.mode("append").parquet(src)
            q = streaming_neardup_pairs(
                spark, src, f"{tmp}/ckpt", f"{tmp}/out",
                schema=schema, state_ttl_seconds=ttl,
                event_time_col="ts", watermark_delay="0 seconds",
                available_now=True,
            )
            assert q.awaitTermination(120)
            st = spark.read.format("statestore").load(f"{tmp}/ckpt")
            touts = {r.value.timeoutTimestamp for r in st.collect()}
            # every band key armed at exactly event-UTC + TTL — a naive
            # epoch read would be 5h (18,000,000 ms) early
            assert touts == {utc_epoch_ms + int(ttl * 1000)}, touts
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
