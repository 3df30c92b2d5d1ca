"""LLM-data-pipeline operator tests (dedup families, text analysis,
multimodal plumbing) against brute-force Python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline import dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def _py_shingles(t, n=3):
    w = t.split(" ")
    if len(w) < n:
        return {t}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _py_jaccard_pairs(docs_pd, threshold):
    sets = {r.doc_id: _py_shingles(r.text) for r in docs_pd.itertuples()}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= threshold:
                out.add((a, b))
    return out


def test_jaccard_join_matches_bruteforce(docs, docs_pd):
    got = {
        (r.ida, r.idb)
        for r in dedup.jaccard_similarity_join(docs, threshold=0.8).collect()
    }
    want = _py_jaccard_pairs(docs_pd, 0.8)
    assert got == want
    assert len(want) > 0  # the driver plants near-dups


def test_minhash_lsh_recall(docs, docs_pd):
    cand = {
        (r.ida, r.idb) for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    want = _py_jaccard_pairs(docs_pd, 0.8)
    # banding (8 hashes, 4 bands of 2) must recall nearly all 0.8-jaccard
    # pairs: P(candidate) = 1-(1-j^2)^4 ≈ 0.99 at j=0.8
    assert len(want - cand) <= max(1, int(0.1 * len(want)))


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    got = {
        (r.keeper_id, r.n_copies)
        for r in dedup.exact_dedup(df, ["text"]).collect()
    }
    assert got == {(1, 2), (3, 1)}


def test_simhash_near_pairs(spark):
    # true 16-bit simhash hammings on these docs: (1,2)=1, (1,3)=7,
    # (2,3)=6 — budget 4 admits exactly the near-dup pair. (The test
    # formerly ran max_hamming=6 asserting (2,3) absent, which only held
    # because the old band_bits=8 default was pigeonhole-INCOMPLETE and
    # hid that genuine ≤6 pair.)
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content about spark engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.ida, r.idb)
        for r in dedup.simhash_near_pairs(df, max_hamming=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_lsh_null_vector_names_contract(spark):
    """A null embedding must fail with the column-contract message, not an
    opaque numpy reshape error (r13 advisor note)."""
    import pytest
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.1, 0.2]), Row(vec_id=2, embedding=None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="non-null"):
        dedup.embedding_lsh_pairs(df, threshold=0.5, dim=2).collect()


def test_embedding_lsh_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    sims = (mat @ mat.T) / (
        np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    thr = 0.35
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= thr
    }
    # sim≈0.35 is a *low*-similarity target: collision prob per 4-plane
    # table is (1-θ/π)^4 ≈ 0.14, so 16 tables give ≈ 0.91 recall at the
    # threshold and more above it
    got = {
        (r.ida, r.idb)
        for r in dedup.embedding_lsh_pairs(
            emb, threshold=thr, n_planes=4, n_tables=16
        ).collect()
    }
    assert got <= want  # verification step admits no false positives
    if want:
        assert len(got) / len(want) >= 0.6


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], "ida long, idb long"
    )
    want = {(1, 1), (2, 1), (3, 1), (9, 1), (8, 1), (5, 5), (6, 5)}
    got = {
        (r.id, r.component)
        for r in dedup.connected_components(edges).collect()
    }
    assert got == want
    # the distributed label-propagation path (driver_threshold=0 forces it)
    # must produce identical components
    got_dist = {
        (r.id, r.component)
        for r in dedup.connected_components(edges, driver_threshold=0).collect()
    }
    assert got_dist == want


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir enables periodic RELIABLE checkpoints (r05 verdict
    #8: localCheckpoint blocks live on executors — an executor loss on a
    multi-hour run forces a restart; a checkpoint dir bounds replay).
    Labels must be identical to the local-only path, and checkpoint files
    must actually land in the directory (interval=1 ⇒ every round)."""
    import os as _os

    # a 9-node chain needs several pointer-doubling rounds, so interval=1
    # exercises the reliable branch repeatedly
    chain = [(i, i + 1) for i in range(1, 9)]
    edges = spark.createDataFrame(chain, "ida long, idb long")
    want = {(i, 1) for i in range(1, 10)}
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        (r.id, r.component)
        for r in dedup.connected_components(
            edges, driver_threshold=0, checkpoint_dir=ckpt, checkpoint_interval=1
        ).collect()
    }
    assert got == want
    written = [
        f
        for root, _dirs, files in _os.walk(ckpt)
        for f in files
    ]
    assert written, "no reliable checkpoint files written under checkpoint_dir"


def test_text_operators(spark):
    df = spark.createDataFrame(
        [(1, "the fast fox and the slow dog")], "doc_id long, text string"
    )
    row = text.doc_stats(df).first()
    assert row.n_words == 7
    assert row.n_distinct == 6
    assert row.n_chars == 29
    lang = df.select(
        text.detect_language(
            "text", {"en": ["the", "and"], "xx": ["zzz"]}
        ).alias("lang")
    ).first()
    assert lang.lang == "en"
    fp1 = df.select(text.fingerprint("text").alias("f")).first().f
    df2 = spark.createDataFrame(
        [(2, "slow dog and the fast fox the")], "doc_id long, text string"
    )
    fp2 = df2.select(text.fingerprint("text").alias("f")).first().f
    assert fp1 == fp2  # reordering collapses to the same fingerprint
    q = df.select(text.quality_score("text").alias("q")).first().q
    assert 0.0 <= q <= 1.0
    rf = df.select(text.rolling_fingerprints("text", k=2, window=2).alias("r")).first().r
    assert len(rf) >= 1


def test_embedding_transforms(spark, sf_dir):
    from vectorchord_spark.pipeline import embed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    normed = embed.normalize_embeddings(emb)
    from vectorchord_spark.functions import distances as D

    norms = [r.n for r in normed.select(D.norm("embedding").alias("n")).take(5)]
    assert all(abs(n - 1.0) < 1e-6 for n in norms)

    model = embed.fit_pca(emb, out_dim=8)
    proj = embed.project_embeddings(emb, model)
    rows = proj.take(3)
    assert all(len(r.projected) == 8 for r in rows)
    # PCA projection must match the numpy computation
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = (mat - model["mean"]) @ model["components"].T
    got = {r.vec_id: r.projected for r in proj.collect()}
    ids = pdf["vec_id"].to_numpy()
    for i in range(5):
        np.testing.assert_allclose(got[ids[i]], want[i], rtol=1e-4, atol=1e-4)

    rp = embed.random_projection(emb, out_dim=4)
    assert len(rp.first().projected) == 4


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes-1")), (2, bytearray(b"fake-image-bytes-2"))],
        "id long, data binary",
    )
    feats = multimodal.decode_image_features(df, dim=8)
    rows = {r.id: r for r in feats.collect()}
    assert rows[1].n_bytes == 18
    assert len(rows[1].embedding) == 8
    # deterministic: same bytes → same features
    again = {r.id: r for r in multimodal.decode_image_features(df, dim=8).collect()}
    assert list(rows[1].embedding) == list(again[1].embedding)
    assert rows[1].embedding != rows[2].embedding
    with pytest.raises(Exception):
        multimodal.decode_image_features(df, strict=True).collect()
    frames = multimodal.frame_sample(
        spark.createDataFrame([(1, bytearray(b"x" * 6400))], "id long, data binary"),
        every_n=10,
    )
    assert frames.count() == 10

    resized = {r.id: r for r in multimodal.resize_image(df, width=4, height=4).collect()}
    assert len(resized[1].resized) == 4 * 4 * 3
    assert resized[1].out_w == 4 and resized[1].out_h == 4
    assert resized[1].resized != resized[2].resized  # content-dependent

    import numpy as np

    pcm = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype("<i2").tobytes()
    au = spark.createDataFrame([(1, bytearray(pcm))], "id long, data binary")
    arow = multimodal.audio_features(au, sample_rate=16000).first()
    assert arow.n_samples == 1600
    assert abs(arow.duration_s - 0.1) < 1e-9
    assert 0.3 < arow.rms < 0.9 and arow.zero_cross > 0


def test_multimodal_real_png_decode(spark):
    """The REAL decode branch (stdlib PNG codec; PIL would take precedence
    when importable): width/height/features come from actual pixel data,
    and strict=True succeeds on decodable input."""
    import numpy as np

    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    grey = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    png_rgb = multimodal.encode_png(rgb)
    png_grey = multimodal.encode_png(grey)

    # unit: decoder round-trips the exact pixels
    w, h, px = multimodal._decode_png(png_rgb)
    assert (w, h) == (23, 17)
    assert np.array_equal(px, rgb)
    w2, h2, px2 = multimodal._decode_png(png_grey)
    assert (w2, h2) == (5, 9)
    assert np.array_equal(px2[:, :, 0], grey)

    df = spark.createDataFrame(
        [(1, bytearray(png_rgb)), (2, bytearray(png_grey))], "id long, data binary"
    )
    # strict no longer raises: the real branch decodes these
    rows = {r.id: r for r in multimodal.decode_image_features(df, dim=9, strict=True).collect()}
    assert (rows[1].width, rows[1].height) == (23, 17)
    assert (rows[2].width, rows[2].height) == (5, 9)
    want = multimodal._pixel_features(rgb, 9)
    assert np.allclose(rows[1].embedding, want)
    # non-PNG bytes still raise under strict
    bad = spark.createDataFrame([(3, bytearray(b"not-an-image"))], "id long, data binary")
    with pytest.raises(Exception):
        multimodal.decode_image_features(bad, strict=True).collect()

    # REAL resize branch: decodable input is nearest-neighbor resampled
    # and re-encoded as PNG (strict succeeds); the pixel-center mapping is
    # checked against a hand-computed gather
    res = {
        r.id: r
        for r in multimodal.resize_image(df, width=6, height=4, strict=True).collect()
    }
    rw, rh, rpx = multimodal._decode_png(bytes(res[1].resized))
    assert (rw, rh) == (6, 4)
    ys = ((np.arange(4) + 0.5) * 17 / 4).astype(np.int64)
    xs = ((np.arange(6) + 0.5) * 23 / 6).astype(np.int64)
    assert np.array_equal(rpx, rgb[ys][:, xs])
    with pytest.raises(Exception):
        multimodal.resize_image(bad, strict=True).collect()


def test_decode_png_all_filter_types():
    """The decoder handles every PNG filter type (0 None / 1 Sub / 2 Up /
    3 Average / 4 Paeth) and mixed streams — the all-zero fast path must
    not change what mixed-filter streams decode to. The writer below
    forward-filters with explicit per-scanline types (encode_png only
    emits filter 0)."""
    import struct
    import zlib

    import numpy as np

    def png_with_filters(pixels, filters):
        pixels = np.ascontiguousarray(pixels, np.uint8)
        if pixels.ndim == 2:
            pixels = pixels[:, :, None]
        h, w, ch = pixels.shape
        color = {1: 0, 3: 2, 4: 6}[ch]
        stride = w * ch
        flat = pixels.reshape(h, stride).astype(np.int64)
        rows = []
        prev = np.zeros(stride, np.int64)
        for y in range(h):
            f = filters[y % len(filters)]
            cur = flat[y]
            enc = cur.copy()
            if f == 1:
                for x in range(ch, stride):
                    enc[x] = (cur[x] - cur[x - ch]) & 0xFF
            elif f == 2:
                enc = (cur - prev) & 0xFF
            elif f == 3:
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    enc[x] = (cur[x] - ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (cur[x] - pr) & 0xFF
            rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
            prev = cur

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(7)
    for chn in (1, 3, 4):
        px = rng.integers(0, 256, size=(17, 13, chn)).astype(np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 2], [4, 3, 1, 0, 2]):
            got = multimodal._decode_png(png_with_filters(px, filters))
            assert got is not None, filters
            w, h, out = got
            assert (w, h) == (13, 17)
            assert np.array_equal(out, px), (chn, filters)


def test_multimodal_real_video_decode(spark):
    """The REAL video branch: a concatenated-PNG image sequence (the
    MJPEG shape with a stdlib-decodable codec) splits into actual frames;
    each sampled frame is a complete decodable PNG, and strict=True
    succeeds on sequences but still raises on arbitrary bytes."""
    import numpy as np

    frames_px = [
        np.full((4, 6, 3), 10 * (f + 1), np.uint8) for f in range(5)
    ]
    seq = b"".join(multimodal.encode_png(p) for p in frames_px)

    # unit: the splitter recovers the exact per-frame byte strings
    parts = multimodal._split_png_stream(seq)
    assert parts is not None and len(parts) == 5
    for f, part in enumerate(parts):
        _, _, px = multimodal._decode_png(part)
        assert np.array_equal(px, frames_px[f])
    assert multimodal._split_png_stream(b"not-a-video") is None
    assert multimodal._split_png_stream(seq + b"trailing-garbage") is None

    df = spark.createDataFrame([(1, bytearray(seq))], "id long, data binary")
    rows = sorted(
        multimodal.frame_sample(df, every_n=2, strict=True).collect(),
        key=lambda r: r.frame_no,
    )
    assert [r.frame_no for r in rows] == [0, 2, 4]
    for r in rows:
        _, _, px = multimodal._decode_png(bytes(r.frame))
        assert np.array_equal(px, frames_px[r.frame_no])
    # sampled frames compose with the downstream image decode
    feats = multimodal.decode_image_features(
        multimodal.frame_sample(df, every_n=2, strict=True), "frame", strict=True
    )
    assert {(r.width, r.height) for r in feats.collect()} == {(6, 4)}
    bad = spark.createDataFrame([(2, bytearray(b"x" * 640))], "id long, data binary")
    with pytest.raises(Exception):
        multimodal.frame_sample(bad, every_n=2, strict=True).collect()
    # non-strict keeps the documented byte-slice stub for arbitrary bytes
    assert multimodal.frame_sample(bad, every_n=10).count() == 1


def test_image_neardup_via_ahash(spark):
    """Image near-dup: a lightly perturbed copy lands within a few Hamming
    bits of the original's average hash, and the generic banded pair join
    (hamming_near_pairs) finds exactly that pair — never the unrelated
    image. Composes the real decode branch with the SimHash-style
    pigeonhole banding."""
    import numpy as np

    rng = np.random.default_rng(7)
    # structured content (a gradient, like any natural image) — average
    # hash thresholds cells against the global mean, so pure noise where
    # every cell sits at the mean is exactly the content it cannot
    # fingerprint (that is the documented property of aHash, not a bug)
    grad = np.tile((np.arange(32) * 7).astype(np.uint8), (32, 1))
    base = np.stack([grad] * 3, axis=2) + rng.integers(
        0, 8, size=(32, 32, 3)
    ).astype(np.uint8)
    near = base.copy()
    near[:2, :2] = 255  # small edit: a corner patch
    far = np.stack([grad.T] * 3, axis=2)  # rotated structure: distinct
    df = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_png(base))),
            (2, bytearray(multimodal.encode_png(near))),
            (3, bytearray(multimodal.encode_png(far))),
        ],
        "doc_id long, data binary",
    )
    hashed = multimodal.image_ahash(df, "data", strict=True)
    rows = {r.doc_id: r.ahash for r in hashed.collect()}
    assert bin((rows[1] ^ rows[2]) & ((1 << 64) - 1)).count("1") <= 4
    pairs = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(
            hashed, "doc_id", "ahash", bits=64, max_hamming=4, band_bits=8
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    with pytest.raises(Exception):
        multimodal.image_ahash(
            spark.createDataFrame([(9, bytearray(b"junk"))], "doc_id long, data binary"),
            "data",
            strict=True,
        ).collect()


def test_audio_neardup_via_fingerprint(spark):
    """Audio near-dup: a lightly edited copy of a clip stays within a few
    Hamming bits of its energy-envelope fingerprint and the banded pair
    join finds it; a different envelope shape does not pair."""
    import io
    import wave

    import numpy as np

    def wav_of(pcm):
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(pcm.astype("<i2").tobytes())
        return bio.getvalue()

    t = np.linspace(0, 4 * np.pi, 6400)
    base = (np.sin(t) * 12000 * (0.2 + 0.8 * (t / t.max()))).astype("<i2")
    near = base.copy()
    near[:50] = 0  # clipped leading edge
    far = base[::-1].copy()  # reversed envelope
    df = spark.createDataFrame(
        [
            (1, bytearray(wav_of(base))),
            (2, bytearray(wav_of(near))),
            (3, bytearray(wav_of(far))),
        ],
        "doc_id long, data binary",
    )
    fp = multimodal.audio_fingerprint(df, "data", strict=True)
    rows = {r.doc_id: r.afp for r in fp.collect()}
    assert bin((rows[1] ^ rows[2]) & ((1 << 64) - 1)).count("1") <= 4
    pairs = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(
            fp, "doc_id", "afp", bits=64, max_hamming=4, band_bits=8
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_multimodal_real_wav_decode(spark):
    """The REAL audio branch (stdlib wave codec, no external deps):
    sample count / duration / rms come from the decoded WAV (honoring its
    own sample rate and downmixing stereo), and strict=True succeeds."""
    import io
    import wave

    import numpy as np

    rate = 8000
    t = np.linspace(0, 0.25, rate // 4, endpoint=False)
    mono = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")

    def wav_bytes(frames: bytes, n_ch: int, width: int, rate: int) -> bytes:
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(frames)
        return bio.getvalue()

    wav_mono = wav_bytes(mono.tobytes(), 1, 2, rate)
    stereo = np.repeat(mono, 2).astype("<i2")  # L==R
    wav_stereo = wav_bytes(stereo.tobytes(), 2, 2, rate)

    # unit: decoder honors rate, width, and channel downmix
    got_rate, got_pcm = multimodal._decode_wav(wav_mono)
    assert got_rate == rate and np.array_equal(got_pcm, mono)
    st_rate, st_pcm = multimodal._decode_wav(wav_stereo)
    assert st_rate == rate and np.array_equal(st_pcm, mono)
    assert multimodal._decode_wav(b"not-audio-at-all") is None

    df = spark.createDataFrame(
        [(1, bytearray(wav_mono)), (2, bytearray(wav_stereo))],
        "id long, data binary",
    )
    # strict=True passes through the REAL branch (sample_rate arg is the
    # stub fallback only — the WAV's own 8kHz must win)
    rows = {
        r.id: r
        for r in multimodal.audio_features(
            df, sample_rate=16000, strict=True
        ).collect()
    }
    assert rows[1].n_samples == rate // 4
    assert abs(rows[1].duration_s - 0.25) < 1e-9
    assert 0.3 < rows[1].rms < 0.9 and rows[1].zero_cross > 100
    assert rows[2].n_samples == rows[1].n_samples  # stereo downmixed
    # non-WAV bytes still raise under strict
    bad = spark.createDataFrame([(3, bytearray(b"\x00" * 64))], "id long, data binary")
    with pytest.raises(Exception):
        multimodal.audio_features(bad, strict=True).collect()


def test_hash_split_deterministic(spark):
    """hash_split: reproducible, partition-invariant, fractions ~honored,
    and stable under corpus growth (old rows keep their split)."""
    from vectorchord_spark.pipeline.splits import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    s2 = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(7), "doc_id").collect()
    }
    assert s1 == s2
    frac_train = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.85 < frac_train < 0.95
    assert set(s1.values()) == {"train", "val", "test"}
    # growth stability: a bigger corpus keeps every old row's split
    big = spark.range(4000).withColumnRenamed("id", "doc_id")
    s3 = {r.doc_id: r.split for r in hash_split(big, "doc_id").collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # a different salt reshuffles
    s4 = {r.doc_id: r.split for r in hash_split(df, "doc_id", salt="other").collect()}
    assert s4 != s1


def test_redact_pii(spark):
    """PII scrub: every pattern kind is replaced and counted; clean text
    passes through byte-identical with zero counts."""
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org or 192.168.1.10"),
            (2, "card 4111 1111-1111 1111 phone +44 020 794-6000x"),
            (3, "nothing sensitive in here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert rows[1].n_email == 1 and rows[1].n_ipv4 == 1
    assert "[email]" in rows[1].text_redacted
    assert "[ipv4]" in rows[1].text_redacted
    assert "jane.doe" not in rows[1].text_redacted
    assert "192.168" not in rows[1].text_redacted
    assert rows[2].n_card == 1 and "[card]" in rows[2].text_redacted
    assert rows[2].n_phone == 1 and "[phone]" in rows[2].text_redacted
    assert rows[3].text_redacted == rows[3].text
    assert (rows[3].n_email, rows[3].n_ipv4, rows[3].n_phone, rows[3].n_card) == (0, 0, 0, 0)


def test_repetition_stats(spark):
    """Gopher-style repetition signals on hand-computed docs: top 2-gram
    occurrence count, duplicated-3-gram occurrence total, and the edge
    cases (single word, empty-ish doc)."""
    docs = spark.createDataFrame(
        [
            # 'a b' x3 (max2=3); 3-grams: 'a b a','b a b','a b a','b a b',
            # 'a b c' -> dup3 = 2+2 = 4
            (1, "a b a b a b c"),
            (2, "all words here are unique tokens"),  # max2=1, dup3=0
            (3, "word"),  # no grams at all
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in text.repetition_stats(docs).collect()
    }
    assert (rows[1].max_2gram_count, rows[1].dup_3gram_count) == (3, 4)
    assert rows[1].top_2gram_frac == pytest.approx(6 / 7)
    assert rows[1].dup_3gram_frac == 1.0  # 12/7 capped
    assert (rows[2].max_2gram_count, rows[2].dup_3gram_count) == (1, 0)
    assert (rows[3].max_2gram_count, rows[3].dup_3gram_count) == (0, 0)


def test_repetition_stats_split_edge_cases(spark):
    """The r13 mapInArrow gram kernel must reproduce Spark split(" ", -1)
    semantics exactly: empty parts from leading/trailing/consecutive
    spaces count as words (and form grams), NULL text takes the
    size(split(NULL)) = -1 sentinel with zero gram counts, and the empty
    string is one empty word. Fractions keep the JVM op order
    ((2*max2)/n, min((3*dup3)/n, 1))."""
    docs = spark.createDataFrame(
        [
            (1, None),              # -> (-1, 0, 0)
            (2, ""),                # [''] -> (1, 0, 0)
            (3, "a  a  a"),         # ['a','','a','','a']: 'a '/' a' x2 -> max2=2
            (4, " x "),             # ['','x',''] -> 3 words, max2=1
            (5, "b b b b"),         # 'b b' x3; 'b b b' x2 -> dup3=2
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    assert (rows[1].n_words, rows[1].max_2gram_count, rows[1].dup_3gram_count) == (-1, 0, 0)
    assert (rows[2].n_words, rows[2].max_2gram_count, rows[2].dup_3gram_count) == (1, 0, 0)
    assert (rows[3].n_words, rows[3].max_2gram_count) == (5, 2)
    assert (rows[4].n_words, rows[4].max_2gram_count, rows[4].dup_3gram_count) == (3, 1, 0)
    assert (rows[5].max_2gram_count, rows[5].dup_3gram_count) == (3, 2)
    assert rows[5].top_2gram_frac == (2.0 * 3) / 4
    assert rows[5].dup_3gram_frac == min((3.0 * 2) / 4, 1.0)
    # null sentinel: 2.0*0/-1.0 = -0.0 like the old JVM expression
    assert rows[1].top_2gram_frac == 0.0 and rows[1].dup_3gram_frac == 0.0


def test_stratified_sample(spark):
    """stratified_sample: per-group rates ~honored, deterministic and
    partition-invariant, growth-stable (a kept row stays kept when the
    corpus grows), and independent of hash_split under a different salt."""
    from vectorchord_spark.pipeline.splits import hash_split, stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    kept = {r.doc_id for r in stratified_sample(df, "lang", rates).collect()}
    kept2 = {
        r.doc_id
        for r in stratified_sample(df.repartition(7), "lang", rates).collect()
    }
    assert kept == kept2
    n_en = sum(1 for k in kept if k % 3 == 0)
    n_de = len(kept) - n_en
    assert 0.4 < n_en / 1000 < 0.6
    assert 0.05 < n_de / 2000 < 0.15
    big = df.union(
        spark.range(3000, 6000).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        )
    )
    kept3 = {r.doc_id for r in stratified_sample(big, "lang", rates).collect()}
    assert kept == {k for k in kept3 if k < 3000}
    # sampling composes with splitting: different salts ⇒ the kept set's
    # split fractions match the full corpus's (independence)
    sp = hash_split(stratified_sample(df, "lang", rates), "doc_id")
    frac_train = sp.where("split = 'train'").count() / max(1, len(kept))
    assert 0.82 < frac_train < 0.97


def test_mixture_weights(spark):
    """Temperature mixing: weights normalize to 1; alpha=1 is proportional
    and alpha=0 uniform; the emitted rates realize the target fraction of
    the corpus in expectation and feed stratified_sample directly."""
    from vectorchord_spark.pipeline.splits import mixture_weights, stratified_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "small").otherwise("big").alias("dom"),
    )  # 1000 small, 3000 big
    w = {r.dom: r for r in mixture_weights(df, "dom", alpha=0.5, target_fraction=0.25).collect()}
    assert abs(w["small"].weight + w["big"].weight - 1.0) < 1e-12
    assert w["small"].weight / w["big"].weight == pytest.approx((1000 / 3000) ** 0.5)
    # expected kept rows = sum(rate_g * n_g) == 0.25 * 4000
    exp = w["small"].rate * 1000 + w["big"].rate * 3000
    assert exp == pytest.approx(1000.0)
    u = {r.dom: r.weight for r in mixture_weights(df, "dom", alpha=0.0).collect()}
    assert u["small"] == pytest.approx(0.5)
    p = {r.dom: r.weight for r in mixture_weights(df, "dom", alpha=1.0).collect()}
    assert p["big"] == pytest.approx(0.75)
    # the loop closes: rates feed stratified_sample, realized counts land
    # near the temperature mixture (md5 buckets ~ binomial)
    rates = {r.dom: float(r.rate) for r in w.values()}
    kept = stratified_sample(df, "dom", rates).groupBy("dom").count().collect()
    got = {r.dom: r["count"] for r in kept}
    assert abs(got["small"] - w["small"].rate * 1000) < 80
    assert abs(got["big"] - w["big"].rate * 3000) < 120


def test_decontaminate(spark):
    """decontaminate: corpus docs sharing >= min_overlap word n-grams with
    a benchmark doc are removed, clean docs survive, and the report's
    overlap counts are exact distinct-gram intersections."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated sentence about spark pipelines here"),
            (3, "quick brown fox jumps again and again in the field"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    rep = {
        r.doc_id: r.overlap
        for r in dedup.contamination(corpus, benchmark, min_overlap=2).collect()
    }
    # doc 1 shares 'the quick brown','quick brown fox','brown fox jumps',
    # 'fox jumps over'; doc 3 shares 'quick brown fox','brown fox jumps';
    # doc 2 none
    assert rep == {1: 4, 3: 2}
    surv = {r.doc_id for r in dedup.decontaminate(corpus, benchmark, min_overlap=2).collect()}
    assert surv == {2}
    # disjoint corpora: empty report, full survival
    assert dedup.contamination(corpus.where("doc_id = 2"), benchmark).count() == 0


def test_connected_components_string_ids(spark):
    """The driver union-find path must accept non-numeric id types (string
    doc hashes) just like the distributed path."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "ida string, idb string"
    )
    got = {
        (r.id, r.component)
        for r in dedup.connected_components(edges).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_chunk_documents_windows(spark):
    """chunk_documents: exact window boundaries, overlap, final partial
    window, and the single-window short-doc case."""
    from vectorchord_spark.pipeline.text import chunk_documents

    words_200 = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, words_200), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.chunk_no): (r.chunk_text, r.chunk_n_words)
        for r in chunk_documents(df, chunk_words=64, overlap_words=16).collect()
    }
    # doc 1: 200 words, stride 48 -> chunks at 0,48,96,144 (last is 56 wide)
    assert sorted(k[1] for k in out if k[0] == 1) == [0, 1, 2, 3]
    assert out[(1, 0)][1] == 64 and out[(1, 0)][0].startswith("w0 w1 ")
    assert out[(1, 1)][0].split()[0] == "w48"  # overlap: starts 48, not 64
    assert out[(1, 3)][1] == 200 - 144
    # doc 2: one partial window; doc 3: split('') == [''] -> one 1-word chunk
    assert out[(2, 0)] == ("a b c", 3)
    assert out[(3, 0)][1] == 1
    # every word of doc 1 appears in at least one chunk
    covered = set()
    for (d, _), (txt, _) in out.items():
        if d == 1:
            covered.update(txt.split())
    assert len(covered) == 200


def test_paragraph_dedup_first_occurrence(spark):
    """paragraph_dedup: globally-first occurrence wins (by doc_id, para_no),
    later copies drop, docs re-assemble in paragraph order, and a doc whose
    every paragraph is a repeat survives with empty text."""
    from vectorchord_spark.pipeline.dedup import paragraph_dedup

    # 4-word paragraphs. doc 1: [P0 P1]; doc 2 repeats P1 then adds P2;
    # doc 3 is entirely P0 + P1 (all repeats); doc 4 repeats P0 inside
    # ITSELF (second copy must drop too).
    p0, p1, p2 = "a b c d", "e f g h", "i j k l"
    df = spark.createDataFrame(
        [
            (1, f"{p0} {p1}"),
            (2, f"{p1} {p2}"),
            (3, f"{p0} {p1}"),
            (4, f"{p0} {p0}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_paras_kept, r.dedup_text)
        for r in paragraph_dedup(df, para_words=4).collect()
    }
    assert got[1] == (2, 2, f"{p0} {p1}")
    assert got[2] == (2, 1, p2)  # p1 already owned by doc 1
    assert got[3] == (2, 0, "")  # every paragraph a repeat, doc kept
    assert got[4] == (2, 0, "")  # doc 4's p0 lost to doc 1's first window
    # self-repeat check: make doc 4 the owner of p0 by removing docs 1/3
    got2 = {
        r.doc_id: (r.n_paras_kept, r.dedup_text)
        for r in paragraph_dedup(
            df.where("doc_id in (2, 4)"), para_words=4
        ).collect()
    }
    assert got2[4] == (1, p0)  # first in-doc copy kept, second dropped


def test_pack_sequences_stream_identity(spark):
    """pack_sequences: within every bucket, replaying the doc stream in id
    order reproduces pack_first/pack_last/pack_offset exactly; windows are
    gapless; assignment is partition-invariant."""
    from collections import defaultdict

    from vectorchord_spark.pipeline.splits import pack_sequences

    rng_lens = [(i, (i * 37) % 700 + 1) for i in range(500)] + [(900, 0)]
    df = spark.createDataFrame(rng_lens, "doc_id long, n_tokens long")
    rows = pack_sequences(df, "n_tokens", context_len=256, n_buckets=8).collect()
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r.pack_bucket].append(r)
    assert len(by_bucket) > 1
    for b, rs in by_bucket.items():
        cum = 0
        for r in sorted(rs, key=lambda r: r.doc_id):
            assert r.pack_first == cum // 256
            assert r.pack_offset == cum % 256
            cum += r.n_tokens
            assert r.pack_last == max(r.pack_first, (cum - 1) // 256)
    # zero-token doc is point-located, not inverted
    z = next(r for r in rows if r.doc_id == 900)
    assert z.pack_first == z.pack_last
    # partition-invariance
    again = {
        r.doc_id: (r.pack_bucket, r.pack_first, r.pack_last, r.pack_offset)
        for r in pack_sequences(
            df.repartition(13), "n_tokens", context_len=256, n_buckets=8
        ).collect()
    }
    for r in rows:
        assert again[r.doc_id] == (
            r.pack_bucket, r.pack_first, r.pack_last, r.pack_offset
        )


@pytest.mark.perf
def test_long_document_text_ops_scale_linearly(spark):
    """Regression guard for the r06 lambda-binding fixes: shingles,
    rolling_fingerprints, and repetition_stats on multi-thousand-word
    documents must run in seconds, not hours. Before the fixes these were
    O(words^2..3) per doc (the gram lambdas re-derived the split per
    element) and this workload did not finish in minutes; fixed, it runs
    in ~5s total. The 120s ceiling is ~20x headroom for host noise while
    still failing fast on any quadratic regression."""
    import time

    from pyspark.sql import functions as F

    from vectorchord_spark.pipeline.dedup import shingles
    from vectorchord_spark.pipeline.text import (
        repetition_stats,
        rolling_fingerprints,
    )

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(4000)),
                lambda i: F.concat(F.lit("w"), (i % F.lit(797)).cast("string")),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.perf_counter()
    assert docs.select(F.explode(shingles("text", 3))).count() > 0
    assert docs.select(F.explode(rolling_fingerprints("text"))).count() > 0
    assert (
        repetition_stats(docs).agg(F.sum("dup_3gram_count")).first()[0] > 0
    )
    assert time.perf_counter() - t0 < 120


@pytest.mark.perf
def test_repetition_stats_high_entropy_outlier_doc(spark):
    """Web-scale outlier guard (r06 verdict #3): a 60k-word doc where
    nearly every gram is DISTINCT — the worst case for the old
    per-distinct filter count, O(distinct·grams) ≈ 3.6e9 comparisons per
    doc. The sort-based run-length fold is O(g log g); 8 such docs finish
    in a few seconds. Values are pinned exactly: words cycle mod 59999 so
    exactly one word repeats → max 2-gram count 1 (all distinct) and zero
    duplicated 3-grams."""
    import time

    from pyspark.sql import functions as F

    from vectorchord_spark.pipeline.text import repetition_stats

    n_words = 60_000
    docs = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.concat(
                    F.lit("tok"), (i % F.lit(n_words - 1)).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.perf_counter()
    rows = repetition_stats(docs).select(
        "n_words", "max_2gram_count", "dup_3gram_count"
    ).collect()
    elapsed = time.perf_counter() - t0
    for r in rows:
        assert r.n_words == n_words
        assert r.max_2gram_count == 1
        assert r.dup_3gram_count == 0
    assert elapsed < 120


def test_hash_embed_terms_exact_counts(spark):
    """hash_embed: weights are exact signed word counts per bucket; a
    repeated word doubles its weight; zero-sum collision buckets drop."""
    from vectorchord_spark.pipeline.sparse import (
        hash_embed_query,
        hash_embed_terms,
    )

    df = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha")], "doc_id long, text string"
    )
    t = hash_embed_terms(df, dim=64).collect()
    by_doc: dict = {}
    for r in t:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    # doc 2 is a sub-bag of doc 1: its single bucket appears in doc 1 with
    # exactly twice the weight (alpha x2), same sign
    (b2, w2), = by_doc[2].items()
    assert by_doc[1][b2] == 2 * w2 and abs(w2) == 1
    # weights are integers, never zero
    assert all(r.weight != 0 and isinstance(r.weight, int) for r in t)
    # query embedding of the same text equals the doc's posting rows
    q = {
        (r.bucket, r.weight)
        for r in hash_embed_query(spark, "alpha alpha beta", dim=64).collect()
    }
    assert q == {(b, w) for b, w in by_doc[1].items()}


def test_sparse_knn_self_retrieval_and_ordering(spark):
    """sparse_knn: a doc queried with its own text scores cosine 1.0 and
    ranks first; scores are descending; dot metric returns exact ints."""
    from vectorchord_spark.pipeline.sparse import hash_embed_terms, sparse_knn

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (4, "alpha beta gamma delta"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    terms = hash_embed_terms(df, dim=256)
    qt = terms.where("doc_id = 1").select("bucket", "weight")
    got = sparse_knn(terms, qt, k=4).collect()
    assert [r.doc_id for r in got[:2]] == [1, 4]  # cos 1.0, id tiebreak
    assert abs(got[0].score - 1.0) < 1e-12 and abs(got[1].score - 1.0) < 1e-12
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    # doc 3 shares no word (whp no bucket) with the query: inverted-index
    # semantics never score it at all
    assert all(r.doc_id != 3 for r in got)
    dot = sparse_knn(terms, qt, k=4, metric="dot").collect()
    assert all(float(r.score).is_integer() for r in dot)


def test_bm25_topk_matches_reference_formula(spark):
    """bm25_topk: scores equal a direct Python computation of the
    Robertson/Lucene BM25 over the same hashed term frequencies, and a
    term-exclusive doc outranks docs sharing only common terms."""
    import math

    from vectorchord_spark.pipeline.sparse import bm25_topk, hash_embed_terms

    corpus = {
        1: "rare alpha alpha common common",
        2: "common common common common",
        3: "rare common",
        4: "beta beta beta common",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    dim = 512
    terms = hash_embed_terms(df, dim=dim, signed=False)
    qt = hash_embed_terms(
        spark.createDataFrame([(0, "rare alpha")], "doc_id long, text string"),
        dim=dim,
        signed=False,
    ).select("bucket", "weight")
    got = {r.doc_id: r.score for r in bm25_topk(terms, qt, k=4).collect()}

    # reference computation over the same hash buckets
    def bucket(w):
        import hashlib

        h = hashlib.md5(f"hb|{w}".encode()).hexdigest()
        return int(h[:6], 16) % dim

    tf = {i: {} for i in corpus}
    for i, t in corpus.items():
        for w in t.split():
            b = bucket(w)
            tf[i][b] = tf[i].get(b, 0) + 1
    n = len(corpus)
    dl = {i: sum(m.values()) for i, m in tf.items()}
    avgdl = sum(dl.values()) / n
    want = {}
    k1, b_ = 1.2, 0.75
    for qb in {bucket("rare"), bucket("alpha")}:
        dfreq = sum(1 for m in tf.values() if qb in m)
        idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        for i, m in tf.items():
            if qb in m:
                f = m[qb]
                want[i] = want.get(i, 0.0) + idf * f * (k1 + 1) / (
                    f + k1 * (1 - b_ + b_ * dl[i] / avgdl)
                )
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])
    # doc 1 holds the exclusive high-idf terms -> must rank first
    assert max(got, key=got.get) == 1


def test_rrf_fuse_matches_hand_computation(spark):
    """rrf_fuse: fused scores equal the closed-form RRF sum over each
    list's (score, id)-tiebroken ranks; ascending/descending score
    conventions both rank correctly; docs absent from a list contribute
    no term for it."""
    from vectorchord_spark.pipeline.sparse import rrf_fuse

    # dense arm: distances, ASC better. ranks: 10->1, 20->2, 30->3
    dense = spark.createDataFrame(
        [(10, 0.1), (20, 0.2), (30, 0.3)], "doc_id long, dist double"
    )
    # sparse arm: similarities, DESC better. ranks: 20->1, 40->2, 10->3
    sparse = spark.createDataFrame(
        [(20, 9.0), (40, 5.0), (10, 1.0)], "doc_id long, score double"
    )
    got = rrf_fuse(
        [(dense, "dist", True), (sparse, "score", False)], k=10, rrf_k=60.0
    ).collect()
    want = {
        10: 1 / 61 + 1 / 63,
        20: 1 / 62 + 1 / 61,
        30: 1 / 63,
        40: 1 / 62,
    }
    assert {r.doc_id for r in got} == set(want)
    for r in got:
        assert abs(r.score - want[r.doc_id]) < 1e-15, (r.doc_id, r.score)
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    # 20 wins: rank 1 in sparse + rank 2 in dense beats 10's (1, 3)
    assert got[0].doc_id == 20


def test_hybrid_retrieval_dense_plus_bm25(spark):
    """End-to-end hybrid retrieval: BM25 and sparse-cosine arms over the
    same corpus fused with RRF. A doc that is merely mid-ranked in each
    arm but present in both outranks docs that appear in only one."""
    from vectorchord_spark.pipeline.sparse import (
        bm25_topk,
        hash_embed_terms,
        rrf_fuse,
        sparse_knn,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta sigma tau"),
            (3, "gamma delta upsilon phi"),
            (4, "psi omega chi xi"),
        ],
        "doc_id long, text string",
    )
    dim = 512
    terms_u = hash_embed_terms(df, dim=dim, signed=False)
    terms_s = hash_embed_terms(df, dim=dim, signed=True)
    q = spark.createDataFrame([(0, "alpha beta gamma delta")], "doc_id long, text string")
    qt_u = hash_embed_terms(q, dim=dim, signed=False).select("bucket", "weight")
    qt_s = hash_embed_terms(q, dim=dim, signed=True).select("bucket", "weight")
    arm_bm25 = bm25_topk(terms_u, qt_u, k=4)
    arm_cos = sparse_knn(terms_s, qt_s, k=4)
    fused = rrf_fuse(
        [(arm_bm25, "score", False), (arm_cos, "score", False)], k=3
    ).collect()
    # doc 1 matches all four query words: first in both arms -> first fused
    assert fused[0].doc_id == 1
    # doc 4 shares nothing with the query: absent from every arm
    assert all(r.doc_id != 4 for r in fused)


def test_paragraph_neardup_pairs(spark):
    """paragraph_neardup_pairs: two docs sharing a near-identical 8-word
    paragraph (one word changed) pair up at paragraph granularity; an
    unrelated paragraph stays unpaired."""
    from vectorchord_spark.pipeline.dedup import paragraph_neardup_pairs

    p_shared = "alpha beta gamma delta epsilon zeta eta theta"
    p_near = "alpha beta gamma delta epsilon zeta eta iota"  # 1 word off
    p_other = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, f"{p_shared} {p_other}"),
            (2, f"{p_near} {p_other.upper()}"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.ida, r.para_a, r.idb, r.para_b)
        for r in paragraph_neardup_pairs(df, para_words=8).collect()
    }
    assert ("1", 0, "2", 0) in got  # the near-dup paragraph pair
    # the unrelated paragraphs (1,#1) vs (2,#1) must not pair (uppercased)
    assert ("1", 1, "2", 1) not in got


def test_deterministic_shuffle(spark):
    """deterministic_shuffle: a pure function of (ids, seed) — identical
    order across runs, an independent permutation per seed, all rows
    preserved, and never a global sort exchange in the plan."""
    from vectorchord_spark.pipeline.splits import deterministic_shuffle
    from vectorchord_spark.plans import explain as P

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in deterministic_shuffle(df, n_buckets=8).collect()]
    b = [r.doc_id for r in deterministic_shuffle(df, n_buckets=8).collect()]
    assert a == b, "same seed must reproduce the permutation"
    assert sorted(a) == list(range(5000)), "no rows lost or duplicated"
    assert a != sorted(a), "order must actually be shuffled"
    c = [
        r.doc_id
        for r in deterministic_shuffle(df, seed="other", n_buckets=8).collect()
    ]
    assert c != a, "a different seed must give a different permutation"
    plan = P.explain_str(deterministic_shuffle(df, n_buckets=8))
    # hash distribution + in-partition sort; NOT a rangepartitioning sort
    assert "rangepartitioning" not in plan.lower()


def test_normalize_text(spark):
    """normalize_text: case/punct/digit variants collapse to one canonical
    form, so exact dedup catches formatting-only near-dups (the CCNet
    preprocessing contract)."""
    from vectorchord_spark.pipeline.dedup import exact_dedup
    from vectorchord_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Hello, World!  It is 2024."),
            (2, "hello world it is 0"),
            (3, "HELLO -- world?? It is 1999!"),
            (4, "entirely different content"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text("text").alias("norm")
        ).collect()
    }
    assert got[1] == got[2] == got[3] == "hello world it is 0"
    assert got[4] == "entirely different content"
    # composition: normalized exact dedup groups the three variants
    normed = df.select("doc_id", normalize_text("text").alias("text"))
    groups = {
        (r.keeper_id, r.n_copies) for r in exact_dedup(normed, ["text"]).collect()
    }
    assert (1, 3) in groups
    # flags off = passthrough-ish behaviors
    raw = df.select(
        normalize_text(
            "text", lowercase=False, strip_punct=False, collapse_digits=False
        ).alias("n")
    ).first()
    assert raw.n == "Hello, World! It is 2024."  # only whitespace collapsed


# ---------------------------------------------------------------------------
# LSH band-bucket cap (capped_band_pairs): the 100 TB skew guard
# ---------------------------------------------------------------------------


def test_capped_minhash_planted_megabucket_linear(spark, caplog):
    """A planted near-dup clique far over the bucket cap must emit a
    LINEAR spanning star (m-1 pairs), not the quadratic clique, must log
    the over-cap warning (no silent caps), and must keep the whole clique
    one connected component."""
    import logging

    n = 1000
    rows = [(i, "the same boilerplate page content repeated verbatim") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="vectorchord_spark.pipeline.dedup"):
        pairs = dedup.minhash_lsh_pairs(df, max_bucket=64).collect()
        dedup.await_cap_telemetry()  # observe-based warning is async
    assert len(pairs) == n - 1  # star to the bucket-min, once per pair
    assert all(r.ida == 0 and r.idb > 0 for r in pairs)
    assert any(
        "over max_bucket=64" in rec.getMessage() for rec in caplog.records
    )
    comp = dedup.connected_components(
        spark.createDataFrame([(r.ida, r.idb) for r in pairs], "ida long, idb long")
    )
    assert comp.select("component").distinct().count() == 1
    assert comp.count() == n


def test_capped_minhash_identical_below_cap(docs):
    """With no bucket over the cap, capped output == uncapped output
    (the cap is pure skew protection, not a semantics change)."""
    capped = {
        (r.ida, r.idb) for r in dedup.minhash_lsh_pairs(docs, max_bucket=64).collect()
    }
    uncapped = {
        (r.ida, r.idb)
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=None).collect()
    }
    assert capped == uncapped


def test_capped_embedding_lsh_planted_megabucket(spark, caplog):
    """500 identical embeddings collide in every LSH table; the cap emits
    the star, and exact-cosine verification keeps every star edge
    (sim = 1.0), so the component survives intact."""
    import logging

    n = 500
    vec = [float(x) for x in np.linspace(0.1, 1.0, 16)]
    df = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<float>"
    )
    with caplog.at_level(logging.WARNING, logger="vectorchord_spark.pipeline.dedup"):
        got = dedup.embedding_lsh_pairs(
            df, dim=16, n_planes=4, n_tables=2, threshold=0.99, max_bucket=32
        ).collect()
        dedup.await_cap_telemetry()  # observe-based warning is async
    assert len(got) == n - 1
    assert all(r.ida == 0 and abs(r.sim - 1.0) < 1e-9 for r in got)
    assert any(
        "embedding_lsh_pairs" in rec.getMessage() for rec in caplog.records
    )


def test_capped_band_pairs_mixed_buckets(spark):
    """Buckets at or under the cap keep full-clique emission while an
    over-cap bucket in the SAME frame is starred: exact expected pair set."""
    from vectorchord_spark.pipeline.dedup import capped_band_pairs

    # bucket A: 3 members (<= cap 3) -> 3 clique pairs; bucket B: 5 members
    # (> cap) -> 4 star pairs to min id 10
    rows = [(i, 0, "a") for i in (1, 2, 3)] + [(i, 0, "b") for i in (10, 11, 12, 13, 14)]
    df = spark.createDataFrame(rows, "_id long, band int, key string")
    got = {
        (r.ida, r.idb)
        for r in capped_band_pairs(df, ["band", "key"], "_id", 3).collect()
    }
    want = {(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (10, 13), (10, 14)}
    assert got == want
    # the opt-in skew-parallel stats shape (groupBy+join-back instead of
    # the window aggregate) must be pair-for-pair identical
    got_sp = {
        (r.ida, r.idb)
        for r in capped_band_pairs(
            df, ["band", "key"], "_id", 3, skew_parallel_stats=True
        ).collect()
    }
    assert got_sp == want


def test_hamming_skew_parallel_stats_identical(spark):
    """hamming_near_pairs with skew_parallel_stats=True emits the same
    exact pair set as the default window-stats shape."""
    rng = np.random.default_rng(11)
    hashes = rng.integers(0, 1 << 16, size=50).tolist()
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "doc_id long, h long"
    )
    kw = dict(bits=16, max_hamming=3, max_bucket=4096)
    base = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(df, "doc_id", "h", **kw).collect()
    }
    sp = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(
            df, "doc_id", "h", skew_parallel_stats=True, **kw
        ).collect()
    }
    assert sp == base


def test_paragraph_neardup_pairs_capped_boilerplate(spark):
    """Boilerplate paragraphs shared by many docs (the canonical mega-
    bucket) emit linearly under the cap; pair splitting still works."""
    boiler = " ".join(f"w{i}" for i in range(8))
    rows = [(d, boiler) for d in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from vectorchord_spark.pipeline.dedup import paragraph_neardup_pairs

    got = paragraph_neardup_pairs(df, para_words=8, max_bucket=16).collect()
    assert len(got) == 199
    assert all(r.para_a == 0 and r.para_b == 0 for r in got)


def test_hamming_banding_default_is_pigeonhole_complete(spark):
    """The derived default band width must find a pair whose differences
    SPREAD across the old 8-bit chunking (which missed it): hamming-3
    pair differing in bits 2, 9, 12 — one diff in three of the four
    4-bit chunks, two 8-bit chunks both dirty."""
    a = 0b1010_0101_1100_0011
    b = a ^ ((1 << 2) | (1 << 9) | (1 << 12))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, 0)], "doc_id long, h long"
    )
    got = {
        (r.ida, r.idb, r.hamming)
        for r in dedup.hamming_near_pairs(
            df, "doc_id", "h", bits=16, max_hamming=3
        ).collect()
    }
    assert (1, 2, 3) in got
    # old default (band_bits=8, 2 chunks <= max_hamming): both chunks
    # differ, the pair is invisible to candidate generation
    old = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(
            df, "doc_id", "h", bits=16, max_hamming=3, band_bits=8
        ).collect()
    }
    assert (1, 2) not in old


def test_hamming_sorted_neighborhood_megabucket(spark, caplog):
    """Over-cap (chunk, value) buckets switch to Manku-style sorted-
    neighborhood candidates: a planted group of 300 IDENTICAL hashes
    (every bucket over a cap of 64) must stay chain-connected (sorted
    adjacency pairs all verify at hamming 0), a planted hamming-2
    neighbor of the group must be found (adjacent in remaining-bits
    order), a far hash must not pair, and the candidate count must be
    linear (~n*W per chunk), not quadratic."""
    import logging

    n = 300
    base = 0b0101_1010_0011_1100
    rows = [(i, base) for i in range(n)]
    rows.append((n, base ^ 0b11))          # hamming 2: must be found
    rows.append((n + 1, ~base & 0xFFFF))   # hamming 16: never pairs
    df = spark.createDataFrame(rows, "doc_id long, h long")
    with caplog.at_level(logging.WARNING, logger="vectorchord_spark.pipeline.dedup"):
        got = dedup.hamming_near_pairs(
            df, "doc_id", "h", bits=16, max_hamming=3,
            max_bucket=64, neighbor_window=8,
        ).collect()
        dedup.await_cap_telemetry()  # observe-based warning is async
    assert any("sorted-neighborhood" in rec.getMessage() for rec in caplog.records)
    pairs = {(r.ida, r.idb) for r in got}
    assert all(r.hamming <= 3 for r in got)
    assert not any(n + 1 in p for p in pairs)
    assert any(n in p for p in pairs)  # the hamming-2 neighbor is found
    # linear output: W=8 neighbors x 4 chunks x (n+1) rows is the ceiling,
    # far below the ~45k pairs the exact clique would emit
    assert len(pairs) < (n + 1) * 8 * 4
    # chain connectivity: the identical group must form ONE component
    comp = dedup.connected_components(
        spark.createDataFrame(list(pairs), "ida long, idb long")
    )
    roots = {
        r.component
        for r in comp.collect()
        if r.id < n or r.id == n
    }
    assert len(roots) == 1


def test_hamming_small_buckets_stay_exact(spark):
    """Below the cap the banded path is the exact all-pairs answer."""
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 1 << 16, size=60).tolist()
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "doc_id long, h long"
    )
    got = {
        (r.ida, r.idb)
        for r in dedup.hamming_near_pairs(
            df, "doc_id", "h", bits=16, max_hamming=3, max_bucket=4096
        ).collect()
    }
    want = {
        (i, j)
        for i in range(60)
        for j in range(i + 1, 60)
        if bin(hashes[i] ^ hashes[j]).count("1") <= 3
    }
    assert got == want


def test_jaccard_max_doc_freq_stop_shingle_cap(spark):
    """The stop-shingle cap (max_doc_freq) must drop ultra-common shingles
    from the inverted index: a boilerplate 3-gram shared by every doc
    stops generating candidate pairs, while a genuine near-dup pair (high
    overlap on RARE shingles) survives with its jaccard intact."""
    boiler = "copyright footer text"
    rows = [
        (i, f"unique{i}a unique{i}b unique{i}c unique{i}d " + boiler)
        for i in range(50)
    ]
    # genuine near-dups: share 9 of ~10 distinct shingles
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.jaccard_similarity_join(
        df, threshold=0.5, max_doc_freq=10
    ).collect()
    pairs = {(r.ida, r.idb) for r in capped}
    assert (100, 101) in pairs
    # boilerplate-only co-occurrence never reaches candidate generation:
    # no pair among the 50 templated docs (their only shared shingles are
    # the boilerplate ones, df=50 > 10)
    assert not any(a < 100 and b < 100 for a, b in pairs)
    # and uncapped DOES generate (then reject) them - the cap is what
    # keeps the candidate set linear
    uncapped_cand = dedup.jaccard_similarity_join(df, threshold=0.0).count()
    assert uncapped_cand > len(capped)
