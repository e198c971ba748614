"""Raw-file multimodal ingestion via Spark's native ``binaryFile``
data source — the missing first mile of the multimodal story: the
other ``mm_*`` queries decode payloads already sitting in a parquet
binary column; this one ingests actual image FILES from a directory
the way a 100 TB crawl drop arrives (``binaryFile`` splits work
per-file across executors, carries (path, length, content), and
supports pathGlobFilter/recursiveFileLookup for landing-dir layouts).

Attestation follows the ``streaming_landing_ingest`` precedent: the
query self-provisions a deterministic file drop (48 uncompressed
24-bit BMPs whose geometry and constant pixel value are pure
functions of the file index), ingests them through the real
``binaryFile`` reader, decodes them with the real stdlib BMP parser
(Arrow-batched ``mapInPandas``), and the DuckDB oracle re-derives
every output column analytically from ``generate_series`` — so file
IO, source metadata (length), and the decode all get differential
coverage.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

N_FILES = 48
_DEMO_DIR = "/tmp/spark_graft_binaryfile_demo"


def _bmp_bytes(width: int, height: int, value: int) -> bytes:
    """Uncompressed 24-bit bottom-up BMP, every BGR byte = value."""
    stride = ((width * 3 + 3) // 4) * 4
    data = bytes([value]) * (stride * height)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    )
    return header + data


def provision_demo_dir(path: str = _DEMO_DIR, n: int = N_FILES) -> str:
    """Idempotently (re)write the deterministic BMP drop. Fixed path
    so repeated runs overwrite instead of leaking tmp dirs."""
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        w, h, v = 4 + i % 3, 2 + i % 2, i % 251
        with open(os.path.join(path, f"img_{i:03d}.bmp"), "wb") as f:
            f.write(_bmp_bytes(w, h, v))
    return path


@register(
    "mm_binaryfile_ingest",
    oracle=f"""
    SELECT i AS img_id,
           CAST(54 + (2 + i % 2) * (((4 + i % 3) * 3 + 3) // 4) * 4
                AS BIGINT) AS file_bytes,
           CAST(4 + i % 3 AS INT) AS width,
           CAST(2 + i % 2 AS INT) AS height,
           3 AS channels,
           CAST(i % 251 AS DOUBLE) AS pixel_mean
    FROM generate_series(0, {N_FILES - 1}) t(i)
    """,
)
def mm_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the demo drop with ``binaryFile`` and decode for real;
    every column is re-derived analytically by the oracle. ``length``
    comes from the SOURCE's file metadata (not the payload), so a
    truncated read would fail the hash."""
    from ..operators.multimodal import decode_image_real

    path = provision_demo_dir()
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(path)
    )
    keyed = raw.select(
        F.regexp_extract("path", r"img_(\d+)\.bmp", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("file_bytes"),
        F.col("content").alias("payload"),
    )
    decoded = decode_image_real(keyed.select("doc_id", "payload"))
    return (
        keyed.select("doc_id", "file_bytes")
        .join(decoded, "doc_id")
        .select(
            F.col("doc_id").alias("img_id"),
            "file_bytes",
            "width",
            "height",
            "channels",
            "pixel_mean",
        )
    )
