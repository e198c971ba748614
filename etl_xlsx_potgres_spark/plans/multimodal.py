"""Multimodal queries: binary-column stats (oracle-checked) and the
mapInPandas decode pipeline (rows-only: the pseudo-decode runs in
Python, outside SQL's reach — its determinism is pinned by unit tests
instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, decode_image_meta
from ..registry import register
from ..sources import load_table


@register(
    "mm_binary_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        "mime",
    )


@register("mm_decode_image_meta", oracle=None)
def mm_decode_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_image_meta(d)
