"""Interleaved A/B of the stdlib PNG unfilter: per-scanline loop (old)
vs the all-filter-0 vectorized fast path (r13 session 5).

Both arms run the FULL decode_image_features shape (mapInPandas,
feature pooling, fake-decode ladder) with the decoder captured BY VALUE
in the closure, so the Spark python workers execute exactly the arm's
code. Results are checksum-asserted equal every round. Usage:

    ROWS=100000 H=64 W=64 RUNS=5 python tools/profile_png_decode.py
"""

from __future__ import annotations

import os
import statistics
import struct
import sys
import time
import zlib
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

ROWS = int(os.environ.get("ROWS", "100000"))
H = int(os.environ.get("H", "64"))
W = int(os.environ.get("W", "64"))
RUNS = int(os.environ.get("RUNS", "5"))
DIM = 16


def old_decode_png(buf: bytes):
    """The pre-session decoder: per-scanline loop for every stream."""
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
        out = np.zeros((h, stride), np.uint8)
        prev = np.zeros(stride, np.uint8)
        pos2 = 0
        for y in range(h):
            flt = raw[pos2]
            line = np.frombuffer(
                raw[pos2 + 1 : pos2 + 1 + stride], np.uint8
            ).copy()
            pos2 += 1 + stride
            if flt == 1:
                for x in range(ch, stride):
                    line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
            elif flt == 2:
                line += prev
            elif flt == 3:
                for x in range(stride):
                    a = int(line[x - ch]) if x >= ch else 0
                    line[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
            elif flt == 4:
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


def main() -> None:
    from pyspark.sql import SparkSession

    from vectorchord_spark.pipeline import multimodal as MM

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .appName("profile_png_decode")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # window canary
    os.system("python tools/window_probe.py")

    rng = np.random.default_rng(42)
    # a modest pool of distinct images, tiled to ROWS (decode cost is
    # per-row either way; the pool keeps generation cheap)
    pool = [
        MM.encode_png(rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
        for _ in range(256)
    ]
    pdf = pd.DataFrame(
        {
            "id": np.arange(ROWS, dtype=np.int64),
            "data": [pool[i % len(pool)] for i in range(ROWS)],
        }
    )
    df = spark.createDataFrame(pdf).repartition(int(cpus)).persist()
    df.count()

    new_decode_png = MM._decode_png
    out_schema = "id long, width int, height int, n_bytes int, emb_sum double"

    def make_decode(decoder):
        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for p in batches:
                if not len(p):
                    continue
                rows = []
                for i, buf in zip(p["id"], p["data"]):
                    raw = bytes(buf)
                    real = decoder(raw)
                    assert real is not None
                    w, h, pixels = real
                    emb = MM._pixel_features(pixels, DIM)
                    rows.append((int(i), w, h, len(raw), float(emb.sum())))
                yield pd.DataFrame(
                    rows, columns=["id", "width", "height", "n_bytes", "emb_sum"]
                )

        return decode

    arms = {
        "old_loop": make_decode(old_decode_png),
        "new_fast": make_decode(new_decode_png),
    }

    # equality check once
    sums = {}
    for name, fn in arms.items():
        r = (
            df.mapInPandas(fn, out_schema)
            .groupBy()
            .sum("emb_sum", "width", "height")
            .collect()[0]
        )
        sums[name] = tuple(r)
    assert sums["old_loop"] == sums["new_fast"], sums
    print("equality: OK", sums["new_fast"])

    walls: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(RUNS):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"png_decode:{name}:r{r}")
            t0 = time.perf_counter()
            df.mapInPandas(fn, out_schema).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(time.perf_counter() - t0)
    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.3f}s "
            f"({', '.join(f'{w:.3f}' for w in sorted(ws))})"
        )
    os.system("python tools/window_probe.py")
    spark.stop()


if __name__ == "__main__":
    main()
