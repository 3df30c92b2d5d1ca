"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container image has no media codecs, so the
actual decoders are STUBBED: each operator tries the real library
(PIL/soundfile) and otherwise falls back to a clearly-marked deterministic
fake (or raises ``NotImplementedError`` when ``strict=True``). The Spark
side — schema, batch shape, partitioning, UDF signatures — is real and
tested; swapping in a real decoder changes only the numpy body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image/jpeg, audio/wav, ...
        StructField("data", StringType()),  # placeholder; real col is binary
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def media_column(data: Column, media_type: str, meta: dict[str, str] | None = None) -> Column:
    """Wrap a binary column into the engine's typed media struct."""
    meta = meta or {}
    return F.struct(
        F.lit(media_type).alias("media_type"),
        data.alias("data"),
        F.create_map(
            *[x for kv in meta.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        ).cast(MapType(StringType(), StringType())).alias("meta"),
    )


def _fake_decode(buf: bytes, dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: derives a pseudo
    width/height and feature vector from the byte content. STUB — replace
    with PIL/torchvision in a codec-enabled environment."""
    h = hashlib.md5(buf).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    seed = int.from_bytes(h[2:10], "little", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal(dim).astype(np.float32)
    return width, height, emb


def _try_real_decode(buf: bytes):
    try:  # pragma: no cover - codec libs absent in this container
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(buf))
        return img.size
    except Exception:
        return None


def decode_image_features(
    df: DataFrame,
    binary_col: str = "data",
    dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Decode images and emit (width, height, n_bytes, embedding).

    ``strict=True`` raises ``NotImplementedError`` when no real codec is
    available instead of using the deterministic fake.
    """
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", width int, height int, n_bytes int, embedding array<float>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                real = _try_real_decode(raw)
                if real is not None:
                    w, h = real
                    _, _, emb = _fake_decode(raw, dim)
                elif strict:
                    raise NotImplementedError(
                        "no image codec available in this environment"
                    )
                else:
                    w, h, emb = _fake_decode(raw, dim)
                feats.append((w, h, len(raw), emb))
            out = pdf[other_cols].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["n_bytes"] = [f[2] for f in feats]
            out["embedding"] = [f[3] for f in feats]
            yield out

    return df.mapInPandas(decode, out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "data",
    every_n: int = 10,
    strict: bool = False,
) -> DataFrame:
    """Sample every ``every_n``-th frame of a video column → one row per
    frame (frame_no, frame binary). STUB decoder: frames are deterministic
    slices of the input bytes; the explode/fan-out plumbing is real."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", frame_no int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if strict:
                raise NotImplementedError(
                    "no video codec available in this environment"
                )
            raws = [
                bytes(b) if b is not None else b"" for b in pdf[binary_col]
            ]
            frame_nos = [
                np.arange(0, max(1, len(r) // 64), every_n, dtype=np.int64)
                for r in raws
            ]
            counts = np.fromiter(
                (len(f) for f in frame_nos), dtype=np.int64, count=len(raws)
            )
            # vectorized fan-out: repeat the passthrough columns by each
            # row's frame count instead of iterating rows
            idx = np.repeat(np.arange(len(pdf)), counts)
            out = pdf[other_cols].iloc[idx].reset_index(drop=True)
            fnos = np.concatenate(frame_nos)
            out["frame_no"] = fnos
            out["frame"] = [
                raws[i][fno * 64 : (fno + 1) * 64]
                for i, fno in zip(idx, fnos)
            ]
            yield out

    return df.mapInPandas(sample, out_schema)


def resize_image(
    df: DataFrame,
    binary_col: str = "data",
    width: int = 32,
    height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Resize images to ``width`` x ``height`` → (resized binary, out_w,
    out_h). STUB decoder: without a codec the output bytes are a
    deterministic content hash stretched to the target byte budget (3
    bytes/pixel), so downstream batching/size accounting is realistic; the
    Spark plumbing (schema, Arrow batching, passthrough columns) is real."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", resized binary, out_w int, out_h int"
    n_bytes = width * height * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if strict:
                raise NotImplementedError(
                    "no image codec available in this environment"
                )
            out = pdf[other_cols].copy()
            resized = []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                h = hashlib.md5(raw).digest()
                reps = -(-n_bytes // len(h))
                resized.append((h * reps)[:n_bytes])
            out["resized"] = resized
            out["out_w"] = np.int32(width)
            out["out_h"] = np.int32(height)
            yield out

    return df.mapInPandas(resize, out_schema)


def audio_features(
    df: DataFrame,
    binary_col: str = "data",
    sample_rate: int = 16000,
    strict: bool = False,
) -> DataFrame:
    """Audio feature extraction → (n_samples, duration_s, rms, zero_cross).
    STUB decoder: tries soundfile, else interprets the raw bytes as i16 PCM
    (deterministic, codec-free); real decode changes only the numpy body."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", n_samples bigint, duration_s double, rms double, zero_cross bigint"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - codec lib absent in this container
            import soundfile  # noqa: F401

            have_codec = True
        except Exception:
            have_codec = False
        for pdf in batches:
            if not len(pdf):
                continue
            if strict and not have_codec:
                raise NotImplementedError(
                    "no audio codec available in this environment"
                )
            out = pdf[other_cols].copy()
            ns, dur, rms, zc = [], [], [], []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                # STUB: treat bytes as little-endian i16 PCM mono
                pcm = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], "<i2")
                n = len(pcm)
                ns.append(n)
                dur.append(n / float(sample_rate))
                x = pcm.astype(np.float64) / 32768.0
                rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                zc.append(int(np.count_nonzero(np.diff(np.signbit(pcm)))) if n > 1 else 0)
            out["n_samples"] = np.asarray(ns, np.int64)
            out["duration_s"] = np.asarray(dur, np.float64)
            out["rms"] = np.asarray(rms, np.float64)
            out["zero_cross"] = np.asarray(zc, np.int64)
            yield out

    return df.mapInPandas(extract, out_schema)
