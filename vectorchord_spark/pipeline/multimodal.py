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


def _decode_png(buf: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Minimal stdlib-only PNG decoder (8-bit grey/RGB/RGBA,
    non-interlaced): parses IHDR/IDAT, zlib-inflates, un-filters scanlines.
    Makes the REAL decode branch exercisable with no codec libraries —
    PIL, when importable, still takes precedence and covers every format."""
    import struct
    import zlib

    if len(buf) < 8 or buf[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        pos = 8
        idat = b""
        w = h = ch = None
        while pos + 8 <= len(buf):
            (ln,) = struct.unpack(">I", buf[pos : pos + 4])
            typ = buf[pos + 4 : pos + 8]
            data = buf[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w, h, depth, color, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                    return None
                ch = {0: 1, 2: 3, 6: 4}[color]
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if w is None or not idat:
            return None
        raw = zlib.decompress(idat)
        stride = w * ch
        if len(raw) < h * (stride + 1):
            return None
        arr = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
            h, stride + 1
        )
        flts = arr[:, 0]
        if not flts.any():
            # Every scanline is filter 0 (None): the stream needs no
            # unfiltering, so one contiguous slice-copy replaces the
            # per-scanline loop (filter-0 is what encode_png and most
            # synthetic fixtures emit; real mixed-filter streams take the
            # loop below).
            return int(w), int(h), np.ascontiguousarray(arr[:, 1:]).reshape(
                h, w, ch
            )
        out = np.zeros((h, stride), np.uint8)
        prev = np.zeros(stride, np.uint8)
        for y in range(h):
            flt = int(flts[y])
            line = arr[y, 1:].copy()
            if flt == 1:  # Sub
                for x in range(ch, stride):
                    line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
            elif flt == 2:  # Up (uint8 addition wraps mod 256)
                line += prev
            elif flt == 3:  # Average
                for x in range(stride):
                    a = int(line[x - ch]) if x >= ch else 0
                    line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
            elif flt == 4:  # Paeth
                for x in range(stride):
                    a = int(line[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (int(line[x]) + pr) & 0xFF
            elif flt != 0:
                return None
            out[y] = line
            prev = line
        return int(w), int(h), out.reshape(h, w, ch)
    except Exception:
        return None


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit grey/RGB/RGBA, filter 0) — the fixture
    generator for the real-decode branch; stdlib only."""
    import struct
    import zlib

    pixels = np.ascontiguousarray(pixels, np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pixel_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic pooled feature from decoded pixels: luminance averaged
    over a g x g grid (g = ceil(sqrt(dim))), flattened and truncated to
    ``dim``, scaled to [0, 1]."""
    lum = pixels.astype(np.float32).mean(axis=2)
    h, w = lum.shape
    g = int(np.ceil(np.sqrt(dim)))
    ys = np.linspace(0, h, g + 1).astype(np.int64)
    xs = np.linspace(0, w, g + 1).astype(np.int64)
    out = np.zeros((g, g), np.float32)
    for i in range(g):
        for j in range(g):
            cell = lum[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = cell.mean() if cell.size else 0.0
    return (out.reshape(-1)[:dim] / 255.0).astype(np.float32)


def _try_real_decode(buf: bytes) -> "tuple[int, int, np.ndarray] | None":
    """Real image decode: PIL when importable (all formats), else the
    stdlib PNG decoder. Returns (width, height, pixels[h,w,ch]) or None."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(buf))
        # normalize to 8-bit channels: palette images would otherwise feed
        # palette INDICES to the feature pool, and 16-bit depths would
        # break the [0, 1] feature contract (the stdlib PNG path rejects
        # non-8-bit input outright)
        if img.mode not in ("L", "RGB", "RGBA"):
            img = img.convert("RGB")
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        w, h = img.size
        return w, h, arr
    except Exception:
        return _decode_png(buf)


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
                    w, h, pixels = real
                    emb = _pixel_features(pixels, dim)
                elif strict:
                    raise NotImplementedError(
                        "no codec for this image format in this environment"
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


def _split_png_stream(raw: bytes) -> "list[bytes] | None":
    """Split a concatenated-PNG image sequence — the stdlib-decodable
    analogue of MJPEG (which is concatenated JPEGs) — into per-frame PNG
    byte strings by walking each frame's chunks to its IEND. Returns None
    when the bytes are not a well-formed PNG sequence."""
    import struct

    sig = b"\x89PNG\r\n\x1a\n"
    if not raw.startswith(sig):
        return None
    frames = []
    pos, n = 0, len(raw)
    while pos < n:
        if raw[pos : pos + 8] != sig:
            return None
        start = pos
        pos += 8
        while True:
            if pos + 8 > n:
                return None
            (ln,) = struct.unpack(">I", raw[pos : pos + 4])
            typ = raw[pos + 4 : pos + 8]
            pos += 12 + ln
            if pos > n:
                return None
            if typ == b"IEND":
                break
        frames.append(raw[start:pos])
    return frames


def frame_sample(
    df: DataFrame,
    binary_col: str = "data",
    every_n: int = 10,
    strict: bool = False,
) -> DataFrame:
    """Sample every ``every_n``-th frame of a video column → one row per
    frame (frame_no, frame binary).

    REAL branch: a concatenated-PNG image sequence (the MJPEG shape with
    a stdlib-decodable codec) is split into actual frames; each emitted
    ``frame`` is a complete decodable PNG, composable with
    ``decode_image_features``/``resize_image`` downstream. Fallback for
    other byte formats (no video codec ships in this container):
    deterministic 64-byte slices — fan-out plumbing real, frames fake;
    ``strict=True`` raises instead."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", frame_no int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            raws = [
                bytes(b) if b is not None else b"" for b in pdf[binary_col]
            ]
            decoded: list["list[bytes] | None"] = []
            for r in raws:
                fr = _split_png_stream(r)
                if fr is None and strict:
                    raise NotImplementedError(
                        "bytes are not a PNG image sequence and no video "
                        "codec is available in this environment"
                    )
                decoded.append(fr)
            frame_nos = [
                np.arange(0, len(fr), every_n, dtype=np.int64)
                if fr is not None
                # STUB path: pseudo-frames are 64-byte slices
                else np.arange(0, max(1, len(r) // 64), every_n, dtype=np.int64)
                for fr, r in zip(decoded, raws)
            ]
            counts = np.fromiter(
                (len(f) for f in frame_nos), dtype=np.int64, count=len(raws)
            )
            # vectorized fan-out: repeat the passthrough columns by each
            # row's frame count instead of iterating rows
            idx = np.repeat(np.arange(len(pdf)), counts)
            out = pdf[other_cols].iloc[idx].reset_index(drop=True)
            fnos = np.concatenate(frame_nos) if len(frame_nos) else np.array([], np.int64)
            out["frame_no"] = fnos
            out["frame"] = [
                decoded[i][fno]
                if decoded[i] is not None
                else raws[i][fno * 64 : (fno + 1) * 64]
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
    out_h).

    REAL branch: any image the decode ladder can read (PIL when
    importable, else the stdlib PNG decoder) is nearest-neighbor
    resampled (pixel-center mapping) and re-encoded as PNG. Fallback for
    undecodable bytes: a deterministic content-hash buffer stretched to
    the 3-bytes/pixel budget (keeps downstream batching/size accounting
    realistic); ``strict=True`` raises instead."""
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
            out = pdf[other_cols].copy()
            resized = []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                real = _try_real_decode(raw)
                if real is not None:
                    _, _, pixels = real
                    ys = ((np.arange(height) + 0.5) * pixels.shape[0] / height).astype(
                        np.int64
                    )
                    xs = ((np.arange(width) + 0.5) * pixels.shape[1] / width).astype(
                        np.int64
                    )
                    resized.append(encode_png(pixels[ys][:, xs]))
                elif strict:
                    raise NotImplementedError(
                        "no codec for this image format in this environment"
                    )
                else:
                    h = hashlib.md5(raw).digest()
                    reps = -(-n_bytes // len(h))
                    resized.append((h * reps)[:n_bytes])
            out["resized"] = resized
            out["out_w"] = np.int32(width)
            out["out_h"] = np.int32(height)
            yield out

    return df.mapInPandas(resize, out_schema)


def _decode_wav(raw: bytes) -> "tuple[int, np.ndarray] | None":
    """Real RIFF/WAVE decode via the stdlib ``wave`` module (no external
    codec needed). Returns (sample_rate, mono i16 samples), or None when
    the bytes are not a parseable WAV (caller falls back to the stub)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(raw), "rb") as w:
            rate = w.getframerate()
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except Exception:
        return None
    if width == 2:
        pcm = np.frombuffer(frames[: len(frames) - (len(frames) % 2)], "<i2")
    elif width == 1:  # WAV 8-bit is unsigned
        pcm = ((np.frombuffer(frames, np.uint8).astype(np.int16) - 128) << 8)
    elif width == 4:
        pcm = (np.frombuffer(frames[: len(frames) - (len(frames) % 4)], "<i4") >> 16
               ).astype(np.int16)
    else:
        return None
    if n_ch > 1:
        n = (len(pcm) // n_ch) * n_ch
        pcm = pcm[:n].reshape(-1, n_ch).mean(axis=1).astype(np.int16)
    return int(rate), pcm


def audio_features(
    df: DataFrame,
    binary_col: str = "data",
    sample_rate: int = 16000,
    strict: bool = False,
) -> DataFrame:
    """Audio feature extraction → (n_samples, duration_s, rms, zero_cross).

    Decode ladder per row: (1) REAL stdlib ``wave`` decode for RIFF/WAVE
    bytes (honors the file's own sample rate and channel count); (2) the
    soundfile codec when importable; (3) deterministic stub interpreting
    raw bytes as i16 PCM mono at ``sample_rate``. ``strict=True`` raises
    instead of falling to (3)."""
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
            out = pdf[other_cols].copy()
            ns, dur, rms, zc = [], [], [], []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                wav = _decode_wav(raw)
                if wav is None and have_codec:
                    # ladder step 2: REAL codec decode via soundfile
                    try:  # pragma: no cover - codec lib absent here
                        import io

                        import soundfile

                        data, sf_rate = soundfile.read(
                            io.BytesIO(raw), dtype="int16", always_2d=True
                        )
                        wav = (
                            int(sf_rate),
                            data.mean(axis=1).astype(np.int16),
                        )
                    except Exception:
                        wav = None
                if wav is not None:
                    rate, pcm = wav
                elif strict:
                    # strict never falls to the stub — undecodable bytes
                    # are an error whether or not a codec is importable
                    raise NotImplementedError(
                        "bytes are not RIFF/WAVE and "
                        + (
                            "soundfile could not decode them"
                            if have_codec
                            else "no audio codec is available in this "
                            "environment"
                        )
                    )
                else:
                    # STUB: treat bytes as little-endian i16 PCM mono
                    rate = sample_rate
                    pcm = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], "<i2")
                n = len(pcm)
                ns.append(n)
                dur.append(n / float(rate))
                x = pcm.astype(np.float64) / 32768.0
                rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                zc.append(int(np.count_nonzero(np.diff(np.signbit(pcm)))) if n > 1 else 0)
            out["n_samples"] = np.asarray(ns, np.int64)
            out["duration_s"] = np.asarray(dur, np.float64)
            out["rms"] = np.asarray(rms, np.float64)
            out["zero_cross"] = np.asarray(zc, np.int64)
            yield out

    return df.mapInPandas(extract, out_schema)


def _ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash of decoded pixels: luminance mean-pooled to
    8×8, bit k = r·8+c set iff cell (r, c) is STRICTLY above the global
    8×8 mean; packed MSB-first (bit 0 = top-left = bit 63 of the int)."""
    lum = pixels.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    ys = np.linspace(0, h, 9).astype(np.int64)
    xs = np.linspace(0, w, 9).astype(np.int64)
    cells = np.zeros((8, 8), np.float64)
    for i in range(8):
        for j in range(8):
            c = lum[
                ys[i] : max(ys[i + 1], ys[i] + 1),
                xs[j] : max(xs[j + 1], xs[j] + 1),
            ]
            cells[i, j] = c.mean() if c.size else 0.0
    bits = (cells > cells.mean()).reshape(-1)
    out = 0
    for k in range(64):
        if bits[k]:
            out |= 1 << (63 - k)
    return out


def image_ahash(
    df: DataFrame, binary_col: str = "data", strict: bool = False
) -> DataFrame:
    """64-bit perceptual average-hash per image → ``ahash`` bigint.

    The image-dedup fingerprint: near-identical images (recompression,
    mild resizing, small edits) land within a few Hamming bits, so
    near-dup pairs come from ``pipeline.dedup.hamming_near_pairs(df,
    id, "ahash", bits=64)`` — the same pigeonhole banding as SimHash,
    never all-pairs. Decode ladder as everywhere in this module: PIL
    when importable, stdlib PNG else; undecodable bytes fall to a
    content-hash fake (``strict=True`` raises instead). Note: bigint is
    SIGNED — hashes with the top-left bit set are negative; Hamming
    arithmetic (XOR + bit_count) is unaffected."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", ahash bigint"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            hashes = []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                real = _try_real_decode(raw)
                if real is not None:
                    hashes.append(_ahash64(real[2]))
                elif strict:
                    raise NotImplementedError(
                        "no codec for this image format in this environment"
                    )
                else:
                    # STUB: content-hash fake (deterministic, format-blind)
                    h = hashlib.md5(raw).digest()
                    hashes.append(int.from_bytes(h[:8], "big", signed=False))
            out = pdf[other_cols].copy()
            # two's-complement into SIGNED int64 (Spark bigint)
            out["ahash"] = np.array(hashes, dtype=np.uint64).astype(np.int64)
            yield out

    return df.mapInPandas(compute, out_schema)


def _envelope_fp64(pcm: np.ndarray) -> int:
    """64-bit energy-envelope hash of a PCM clip: bit k (MSB-first) is
    set iff window k of 64 has mean |sample| STRICTLY above the clip's
    overall mean |sample| — invariant under pure gain changes."""
    pcm = np.abs(np.asarray(pcm, np.float64))
    n = len(pcm)
    out = 0
    if n:
        edges = np.linspace(0, n, 65).astype(np.int64)
        means = np.array(
            [
                pcm[edges[k] : max(edges[k + 1], edges[k] + 1)].mean()
                if edges[k] < n
                else 0.0
                for k in range(64)
            ]
        )
        overall = pcm.mean()
        for k in range(64):
            if means[k] > overall:
                out |= 1 << (63 - k)
    return out


def audio_fingerprint(
    df: DataFrame,
    binary_col: str = "data",
    sample_rate: int = 16000,
    strict: bool = False,
) -> DataFrame:
    """64-bit energy-envelope fingerprint per audio clip → ``afp`` bigint.

    The audio near-dup analogue of :func:`image_ahash`: the decoded PCM is
    split into 64 equal windows, bit k is set iff window k's mean |sample|
    is STRICTLY above the clip's overall mean |sample| (MSB-first, window
    0 = bit 63). Re-encoded or lightly edited copies of the same clip land
    within a few Hamming bits; pairing is
    ``pipeline.dedup.hamming_near_pairs(df, id, "afp", bits=64)``. Decode
    ladder as in :func:`audio_features` (real ``wave`` for RIFF bytes,
    soundfile when importable, i16-PCM stub else; ``strict=True`` raises
    on undecodable bytes)."""
    other_cols = [c for c in df.columns if c != binary_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in other_cols
    )
    out_schema += ", afp bigint"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - codec lib absent in this container
            import soundfile  # noqa: F401

            have_codec = True
        except Exception:
            have_codec = False
        for pdf in batches:
            if not len(pdf):
                continue
            hashes = []
            for buf in pdf[binary_col]:
                raw = bytes(buf) if buf is not None else b""
                wav = _decode_wav(raw)
                if wav is None and have_codec:
                    try:  # pragma: no cover - codec lib absent here
                        import io

                        import soundfile

                        data, sf_rate = soundfile.read(
                            io.BytesIO(raw), dtype="int16", always_2d=True
                        )
                        wav = (int(sf_rate), data.mean(axis=1).astype(np.int16))
                    except Exception:
                        wav = None
                if wav is None:
                    if strict:
                        raise NotImplementedError(
                            "bytes are not RIFF/WAVE and no audio codec is "
                            "available in this environment"
                        )
                    # STUB: i16 PCM mono
                    wav = (
                        sample_rate,
                        np.frombuffer(raw[: len(raw) - (len(raw) % 2)], "<i2"),
                    )
                hashes.append(_envelope_fp64(wav[1]))
            o = pdf[other_cols].copy()
            o["afp"] = np.array(hashes, dtype=np.uint64).astype(np.int64)
            yield o

    return df.mapInPandas(compute, out_schema)
