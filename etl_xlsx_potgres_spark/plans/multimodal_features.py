"""Multimodal FEATURE EXTRACTION — the stage after decode in the
driver-mandated multimodal pack (decode / feature-extract / resize /
frame-sample): real signal features from real WAV payloads and a real
nearest-neighbor image resize over real BMP payloads, both
Arrow-batched ``mapInPandas`` (the only sane shape for per-asset
Python DSP) and both with fully ANALYTIC oracles — the payloads are
synthesized in-query from key columns, so every output feature is a
closed-form function of ``doc_id`` that DuckDB recomputes without
ever seeing a byte of the container.

Synthesis uses ``unhex`` (not ``encode(...,'UTF-8')``) so sample
bytes above 0x7F stay single bytes — the UTF-8 pitfall that silently
doubles high bytes is exactly what the alternating-sign waveform
exercises (the existing ``mm_decode_audio_real`` stays below 0x80 by
construction; this query does not).

Reference lifecycle note: the reference has no binary surface
(``etl_process.py:1-235``); this completes the decode->features
multimodal path next to ``plans/multimodal.py`` (decode stages) and
``operators/multimodal.py`` (stdlib parsers, cited there).

Scale: synthesis and extraction are both map-only (zero shuffles);
per-batch memory is one Arrow batch of payloads. At 100 TB the same
plan applies with payloads read from ``binaryFile``/parquet binary
columns instead of synthesized.
"""

from __future__ import annotations

import base64
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.multimodal import wav_header
from ..registry import register
from ..sources import load_table

N_FRAMES = 4  # +v,-v,+v,-v
IMG_W, IMG_H = 8, 4


# --------------------------------------------------------------- audio
_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("n_zero_cross", T.IntegerType()),
    ]
)


def _audio_features(batches: Iterator) -> Iterator:
    import io
    import wave

    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                n = w.getnframes()
                raw = w.readframes(n)
            samples = struct.unpack(f"<{n}h", raw)
            sq = sum(s * s for s in samples)
            zc = sum(
                1
                for a, b in zip(samples, samples[1:])
                if (a >= 0) != (b >= 0)
            )
            rows.append(
                (
                    int(doc_id),
                    n,
                    max(abs(s) for s in samples),
                    (sq / n) ** 0.5,
                    sum(samples) / n,
                    zc,
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_SCHEMA])


@register(
    "mm_audio_features",
    oracle=f"""
    SELECT doc_id,
           CAST({N_FRAMES} AS BIGINT) AS n_frames,
           CAST(1 + doc_id % 127 AS INT) AS peak,
           CAST(1 + doc_id % 127 AS DOUBLE) AS rms,
           0.0 AS mean_sample,
           {N_FRAMES - 1} AS n_zero_cross
    FROM documents
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternating-sign 16-bit PCM (+v,-v,...; v = 1 + doc_id % 127):
    peak = v, rms = v exactly (sqrt of a perfect square), mean = 0,
    and one zero crossing per adjacent pair."""
    header_b64 = base64.b64encode(wav_header(n_frames=N_FRAMES)).decode()
    # little-endian int16: +v -> hex(v) '00'; -v -> hex(256-v) 'FF'
    pos = "lpad(hex(1 + doc_id % 127), 2, '0') || '00'"
    neg = "lpad(hex(255 - doc_id % 127), 2, '0') || 'FF'"
    frames_hex = " || ".join([pos, neg] * (N_FRAMES // 2))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.unbase64(F.lit(header_b64)), F.unhex(F.expr(frames_hex))
        ).alias("payload"),
    )
    return d.mapInPandas(_audio_features, schema=_AUDIO_SCHEMA)


# --------------------------------------------------------------- image
_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_mean", T.DoubleType()),
        T.StructField("p00", T.IntegerType()),
        T.StructField("p_last", T.IntegerType()),
    ]
)


def _bmp_header(width: int, height: int) -> bytes:
    stride = ((width * 3 + 3) // 4) * 4
    data = stride * height
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + data, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data, 2835, 2835,
            0, 0,
        )
    )


def _resize_features(batches: Iterator) -> Iterator:
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            off = struct.unpack_from("<I", buf, 10)[0]
            w, h = struct.unpack_from("<ii", buf, 18)
            stride = ((w * 3 + 3) // 4) * 4
            # bottom-up rows -> top-down pixel matrix (blue channel;
            # synthesis writes equal BGR)
            img = [
                [
                    buf[off + (h - 1 - y) * stride + x * 3]
                    for x in range(w)
                ]
                for y in range(h)
            ]
            # nearest-neighbor 2x downsample: keep even rows/cols
            resized = [row[0::2] for row in img[0::2]]
            flat = [p for row in resized for p in row]
            rows.append(
                (
                    int(doc_id),
                    len(resized[0]),
                    len(resized),
                    sum(flat) / len(flat),
                    resized[0][0],
                    resized[-1][-1],
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA])


@register(
    "mm_image_resize",
    oracle=f"""
    SELECT d.doc_id,
           {IMG_W // 2} AS out_width,
           {IMG_H // 2} AS out_height,
           (SELECT SUM((xs.x + ys.y + d.doc_id) % 251)
            FROM (SELECT unnest(generate_series(0, {IMG_W - 2}, 2)) AS x) xs,
                 (SELECT unnest(generate_series(0, {IMG_H - 2}, 2)) AS y) ys
           ) / {(IMG_W // 2) * (IMG_H // 2)}.0 AS resized_mean,
           CAST(d.doc_id % 251 AS INT) AS p00,
           CAST(({IMG_W - 2} + {IMG_H - 2} + d.doc_id) % 251 AS INT)
             AS p_last
    FROM documents d
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient BMP (pixel(x,y) = (x + y + doc_id) % 251, top-down
    coords, equal BGR) -> real parse -> nearest-neighbor 2x
    downsample. Every output is closed-form in doc_id."""
    header_b64 = base64.b64encode(_bmp_header(IMG_W, IMG_H)).decode()
    # bottom-up row order, 3 equal bytes per pixel; stride 24 needs no
    # padding (divisible by 4)
    parts = []
    for y in reversed(range(IMG_H)):  # bottom-up storage
        for x in range(IMG_W):
            px = f"lpad(hex(({x} + {y} + doc_id) % 251), 2, '0')"
            parts.append(f"repeat({px}, 3)")
    pixels_hex = " || ".join(parts)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.unbase64(F.lit(header_b64)), F.unhex(F.expr(pixels_hex))
        ).alias("payload"),
    )
    return d.mapInPandas(_resize_features, schema=_RESIZE_SCHEMA)
