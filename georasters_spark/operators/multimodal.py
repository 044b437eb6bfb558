"""Multimodal column operators: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched UDF pipelines.

The container has no image/audio codecs (no PIL/ffmpeg), so the decode
step for REAL formats raises NotImplementedError by design; the Spark
plumbing — schemas, batch shapes, partitioning, deterministic fake
decode used to exercise the pipeline — is real and tested. Swapping in
a real codec is a one-function change inside the same mapInPandas.

fmt dispatch:
  'raw16'/'rawf32'/'png'/'q8' — real codecs (sources/codec.py)
  'fake'                       — deterministic pseudo-image from the
                                 byte hash (pipeline testing)
  'jpeg'/'webp'/'mp3'/'mp4'... — NotImplementedError (stub boundary)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources import codec

REAL_FMTS = {"raw16", "rawf32", "png", "q8"}


def decode_any(buf: bytes, fmt: str, w: int, h: int, ndv: float = -9999.0) -> np.ndarray:
    if fmt in REAL_FMTS:
        return np.asarray(codec.decode_tile(buf, fmt, w, h, ndv), dtype=np.float64)
    if fmt == "fake":
        # deterministic pseudo-image: SHA-256 counter-mode expansion
        need = w * h
        out = np.empty(need, dtype=np.uint8)
        pos = 0
        ctr = 0
        while pos < need:
            d = hashlib.sha256(buf + ctr.to_bytes(4, "little")).digest()
            take = min(32, need - pos)
            out[pos : pos + take] = np.frombuffer(d[:take], dtype=np.uint8)
            pos += take
            ctr += 1
        return out.reshape(h, w).astype(np.float64)
    raise NotImplementedError(
        f"codec for fmt={fmt!r} not available in this environment; "
        "plug a real decoder into decode_any()"
    )


def image_features(images: DataFrame) -> DataFrame:
    """Per-image features: mean/std/min/max + 16-bin histogram entropy —
    one Arrow batch per partition, numpy per tile."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                a = decode_any(bytes(t.bytes), t.fmt, int(t.w), int(t.h),
                               float(getattr(t, "ndv", -9999.0)))
                valid = a[a != float(getattr(t, "ndv", -9999.0))]
                if valid.size == 0:
                    valid = np.zeros(1)
                hist, _ = np.histogram(valid, bins=16)
                p = hist / hist.sum()
                p = p[p > 0]
                rows.append(
                    {
                        "image_id": t.image_id,
                        "f_mean": round(float(valid.mean()), 6),
                        "f_std": round(float(valid.std()), 6),
                        "f_min": float(valid.min()),
                        "f_max": float(valid.max()),
                        "f_entropy": round(float(-(p * np.log2(p)).sum()), 6),
                    }
                )
            yield pd.DataFrame(rows)

    cols = [c for c in ("image_id", "bytes", "fmt", "w", "h", "ndv") if c in images.columns]
    return images.select(*cols).mapInPandas(
        kernel,
        schema="image_id string, f_mean double, f_std double, f_min double, "
        "f_max double, f_entropy double",
    )


def image_resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Block-mean resize (integer-factor) of decoded tiles; returns
    rawf32 thumbnails — the thumbnail/feature-extract pipeline shape."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                a = decode_any(bytes(t.bytes), t.fmt, int(t.w), int(t.h),
                               float(getattr(t, "ndv", -9999.0)))
                fy, fx = a.shape[0] // out_h, a.shape[1] // out_w
                small = a[: fy * out_h, : fx * out_w].reshape(out_h, fy, out_w, fx).mean(axis=(1, 3))
                rows.append(
                    {
                        "image_id": t.image_id,
                        "bytes": small.astype("<f4").tobytes(),
                        "w": out_w,
                        "h": out_h,
                        "fmt": "rawf32",
                    }
                )
            yield pd.DataFrame(rows)

    cols = [c for c in ("image_id", "bytes", "fmt", "w", "h", "ndv") if c in images.columns]
    return images.select(*cols).mapInPandas(
        kernel, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def encode_multiband(arrs) -> bytes:
    """Concatenate band planes (each little-endian int16 row-major) —
    the multi-band analog of fmt='raw16' (band-sequential layout)."""
    return b"".join(np.ascontiguousarray(a, dtype="<i2").tobytes() for a in arrs)


def band_select(images: DataFrame, band: int) -> DataFrame:
    """Select one band from band-sequential multi-band tiles as a pure
    JVM substring on the binary column — no Python, no decode. The
    reference's band parameter (get_geo_info/create_geotiff band=1,
    georasters.py:86-98, :179-205) re-expressed for the tile table.
    Output rows are ordinary fmt='raw16' single-band tiles."""
    from pyspark.sql import functions as F

    plane = F.col("w") * F.col("h") * F.lit(2)  # int16 bytes per band
    return images.withColumn(
        "bytes", F.expr(f"substring(bytes, CAST(w * h * 2 * {band - 1} + 1 AS INT), CAST(w * h * 2 AS INT))")
    ).withColumn("fmt", F.lit("raw16")).withColumn("band", F.lit(band)).drop("n_bands")


def audio_windows(audio: DataFrame, window_ms: int = 1000, hop_ms: int = 500) -> DataFrame:
    """Audio column plumbing: overlapping analysis windows per clip from
    (duration_ms, window/hop) — the STFT/feature-extraction batch shape.
    Pure Column math (sequence + transform); the PCM decode itself is
    the declared stub boundary (decode_any raises for 'mp3'/'wav' — no
    audio codec in-sandbox), exactly like frame_sample for video."""
    from pyspark.sql import functions as F

    n = (F.greatest(F.col("duration_ms") - window_ms, F.lit(0)) / hop_ms).cast("int") + 1
    offs = F.transform(F.sequence(F.lit(0), n - 1), lambda i: (i * hop_ms).cast("long"))
    return audio.select(
        "audio_id", "duration_ms",
        F.posexplode(offs).alias("window_idx", "start_ms"),
    ).select(
        "audio_id", "window_idx", "start_ms",
        F.least(F.col("start_ms") + window_ms, F.col("duration_ms"))
        .cast("long").alias("end_ms"),
    )


def frame_sample(videos: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: deterministic frame offsets per video from
    (duration, n_frames); the real frame *extraction* is the stub
    boundary — the plan (explode offsets → per-frame rows keyed for a
    downstream decode join) is the production shape."""
    from pyspark.sql import functions as F

    offs = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i * F.col("duration_ms") / n_frames).cast("long"),
    )
    return videos.select(
        "video_id",
        F.posexplode(offs).alias("frame_idx", "offset_ms"),
    )
