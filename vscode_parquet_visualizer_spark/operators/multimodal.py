"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side shape is real and tested — schema contract, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the actual codec work
(Pillow/librosa/ffmpeg are not in this container) is stubbed behind
``decode_fn`` injection points with a deterministic fake for tests.

Schema contract for a multimodal table:
    id: long, media: binary, media_type: string ('image'|'audio'|'video'),
    meta: struct<width:int, height:int, sample_rate:int, duration_ms:long>

Design notes for 100 TB:
- binary payloads dominate partition size → callers should set
  ``spark.sql.files.maxPartitionBytes`` low (e.g. 32 MB) for media tables
  so one task holds few payloads.
- decode/feature-extract runs in ``mapInPandas`` so each Arrow batch is
  processed without per-row Python overhead; ``batch_rows`` caps memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def deterministic_fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Stand-in for a real decoder: a deterministic byte-histogram feature.
    Replace with a real image/audio decode where codec libs exist."""
    if payload is None:
        return [0.0] * dim
    x = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.bincount(x % dim, minlength=dim)
    total = max(1, len(payload))
    return [round(float(c) / total, 6) for c in buckets]


def real_decode_stub(payload: bytes) -> Any:  # pragma: no cover - by design
    """The codec integration point for formats needing external libs
    (JPEG via Pillow, MP3/FLAC via soundfile, video via ffmpeg).
    WAV, BMP, netpbm AND PNG decode for REAL with zero dependencies —
    see operators/codecs.py (``media_features`` sniffs the format and
    uses the stdlib codecs, falling back to the byte histogram)."""
    raise NotImplementedError(
        "this format requires codec libraries (Pillow/soundfile/ffmpeg) "
        "not present in this environment; WAV/BMP/netpbm/PNG decode "
        "natively via operators.codecs"
    )


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], list[float]] = deterministic_fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` keeps each partition streaming (iterator of batches,
    bounded memory even when payloads are large); the UDF touches only
    (id, media, media_type) thanks to an explicit upstream projection, so
    Parquet column pruning skips any other columns entirely.
    """
    import pandas as pd

    from vscode_parquet_visualizer_spark.session import ship_package

    ship_package(df.sparkSession)  # workers must import this module
    projected = df.select("id", "media", "media_type")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "id": chunk["id"],
                        "media_type": chunk["media_type"],
                        "n_bytes": chunk["media"].map(
                            lambda b: 0 if b is None else len(b)
                        ),
                        "feature": chunk["media"].map(decode_fn),
                    }
                )

    return projected.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize pipeline shape: binary→binary with updated meta.
    Without a real codec, ``resize_fn`` defaults to a marked stub."""
    import pandas as pd

    if resize_fn is None:
        from vscode_parquet_visualizer_spark.operators.codecs import (
            resize_bmp,
            sniff_format,
        )

        def resize_fn(payload: bytes, w: int, h: int) -> bytes:
            # BMP/PNG resize for real (stdlib codecs); JPEG needs Pillow
            fmt = sniff_format(payload)
            if fmt == "bmp":
                return resize_bmp(payload, w, h)
            if fmt == "png":
                from vscode_parquet_visualizer_spark.operators.codecs import (
                    resize_png,
                )

                return resize_png(payload, w, h)
            raise NotImplementedError(
                "non-BMP/PNG image resize requires Pillow; inject resize_fn"
            )

    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media"] = pdf["media"].map(lambda b: resize_fn(b, width, height))
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    max_frames: int = 8,
    frame_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling pipeline shape: one binary video payload →
    N frame rows (id, frame_index, frame). ``frame_fn(payload, stride)``
    is the ffmpeg integration point; the default deterministic fake slices
    the payload so the Spark-side plumbing (explode shape, batch memory,
    row growth) is real and testable without codecs.

    Scale note: frame explosion multiplies rows but each output row is one
    frame, not the whole video — downstream feature extraction parallelizes
    per frame. Keep ``maxPartitionBytes`` low for video tables so a task
    holds few payloads pre-explosion."""
    import pandas as pd

    from vscode_parquet_visualizer_spark.session import ship_package

    ship_package(df.sparkSession)
    if frame_fn is None:
        def frame_fn(payload: bytes, stride: int) -> list[bytes]:
            if payload is None:
                return []
            # fake: fixed-size chunks standing in for decoded frames
            chunk = max(1, len(payload) // max(1, max_frames))
            frames = [
                payload[i : i + chunk] for i in range(0, len(payload), chunk)
            ]
            return frames[::stride][:max_frames] if stride > 1 else frames[:max_frames]

    projected = df.filter(F.col("media_type") == "video").select("id", "media")

    def run(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                for i, fr in enumerate(frame_fn(row["media"], every_nth)):
                    ids.append(row["id"])
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"id": ids, "frame_index": idxs, "frame": frames})

    return projected.mapInPandas(run, schema=FRAME_SCHEMA)


TYPED_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("aspect", T.DoubleType(), True),
        T.StructField("dur_s", T.DoubleType(), True),
    ]
)


def typed_media_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL-codec feature extraction into typed columns: BMP/netpbm
    payloads decode to (width, height, per-channel means, aspect), WAV to
    (duration); unknown formats yield NULL features (n_bytes only). The
    per-channel mean is exact-integer-sum / npix / 255 — engine-portable
    arithmetic, which is what lets the q44 gate value-compare decoded
    output against a closed-form oracle. Same mapInPandas shape as
    ``extract_features`` (streaming Arrow batches, explicit projection)."""
    import pandas as pd

    from vscode_parquet_visualizer_spark.operators import codecs
    from vscode_parquet_visualizer_spark.session import ship_package

    ship_package(df.sparkSession)
    projected = df.select("id", "media")

    def one(payload) -> dict:
        out = {
            "fmt": None, "n_bytes": None, "width": None, "height": None,
            "mean_r": None, "mean_g": None, "mean_b": None,
            "aspect": None, "dur_s": None,
        }
        if payload is None:
            return out
        out["n_bytes"] = len(payload)
        fmt = codecs.sniff_format(payload)
        out["fmt"] = fmt
        if fmt in ("bmp", "pnm", "png"):
            img = {
                "bmp": codecs.decode_bmp,
                "pnm": codecs.decode_pnm,
                "png": codecs.decode_png,
            }[fmt](payload).astype(np.float64)
            h, w, _ = img.shape
            out["width"], out["height"] = w, h
            out["mean_r"] = round(float(img[:, :, 0].mean()) / 255.0, 6)
            out["mean_g"] = round(float(img[:, :, 1].mean()) / 255.0, 6)
            out["mean_b"] = round(float(img[:, :, 2].mean()) / 255.0, 6)
            out["aspect"] = round(float(w) / h, 6) if h else None
        elif fmt == "wav":
            samples, rate = codecs.decode_wav(payload)
            out["dur_s"] = round(len(samples) / rate, 6) if rate else None
        return out

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [one(b) for b in chunk["media"]]
                res = pd.DataFrame(feats)
                res.insert(0, "id", chunk["id"].values)
                yield res

    return projected.mapInPandas(run, schema=TYPED_FEATURE_SCHEMA)


def oracle_media_table(spark, n: int = 60) -> DataFrame:
    """Deterministic REAL-media table (actual BMP / P6-PPM / WAV bytes)
    whose decoded content has a closed form: image pixel (r, c, k) of id
    i is ``(i*31 + r*7 + c*3 + k*11) % 256``, WAV id i holds
    ``800 + 40*i`` silent 16-bit mono samples at 16 kHz. An engine that
    really decodes the payloads can therefore be value-checked against
    pure SQL arithmetic (the q44 oracle). Driver-built: n is tiny; the
    DECODE side stays distributed."""
    from vscode_parquet_visualizer_spark.operators import codecs

    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 3
        kind = i % 4
        if kind == 2:
            nsamp = 800 + 40 * i
            payload = codecs.encode_wav(np.zeros(nsamp), sample_rate=16000)
            mtype = "audio"
            meta = (None, None, 16000, int(nsamp * 1000 / 16000))
        else:
            rr = np.arange(h)[:, None, None]
            cc = np.arange(w)[None, :, None]
            kk = np.arange(3)[None, None, :]
            img = ((i * 31 + rr * 7 + cc * 3 + kk * 11) % 256).astype(np.uint8)
            payload = {
                0: codecs.encode_bmp,
                1: codecs.encode_ppm,
                3: codecs.encode_png,
            }[kind](img)
            mtype = "image"
            meta = (w, h, None, None)
        rows.append((i, payload, mtype, meta))
    # ~64 blobs per slice, sliced AT THE SOURCE: createDataFrame alone
    # makes defaultParallelism (32) Python-backed slices, and a later
    # coalesce(1) evaluates all 32 SERIALLY in one task — one ~130 ms
    # Python round trip each (measured 4.4 s for 60 rows). parallelize
    # with the target slice count keeps every action at `parts` tasks.
    parts = max(1, min(8, n // 64))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), MEDIA_SCHEMA
    )


def synthetic_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived
    from the row id — no randomness, no codec)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 131 + j * 17) % 251) for j in range((i % 7 + 1) * 32))
        mtype = ["image", "audio", "video"][i % 3]
        meta = (
            (64, 48, None, None)
            if mtype == "image"
            else (None, None, 16000, 1500) if mtype == "audio" else (320, 240, None, 4000)
        )
        rows.append((i, payload, mtype, meta))
    # a local 64-row collection otherwise parallelizes to defaultParallelism
    # slices — 32 near-empty tasks per action; cap at ~8 rows/partition
    # ~64 blobs per slice, sliced AT THE SOURCE: createDataFrame alone
    # makes defaultParallelism (32) Python-backed slices, and a later
    # coalesce(1) evaluates all 32 SERIALLY in one task — one ~130 ms
    # Python round trip each (measured 4.4 s for 60 rows). parallelize
    # with the target slice count keeps every action at `parts` tasks.
    parts = max(1, min(8, n // 64))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), MEDIA_SCHEMA
    )
