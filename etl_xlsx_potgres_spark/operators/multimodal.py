"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/transformed through Arrow-batched ``mapInPandas``.

Design (the part that matters at 100 TB):
- media lives in a ``binary`` column next to typed metadata columns —
  one row per asset, partitioned by whatever the pipeline shards on;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow batches in, Arrow batches out, no
  per-row serde, no driver involvement, composable with any
  DataFrame op before/after;
- the actual codec calls are STUBBED here (this environment has no
  image/audio libraries): ``decode_image_meta`` derives a
  deterministic fake (md5-based) so the Spark-side plumbing — schema,
  batching, partition behavior — is real and testable, and
  ``decode_image_real`` raises ``NotImplementedError`` until a codec
  (PIL/ffmpeg) is importable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, "
    "width int, height int, channels int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in asset payload: the UTF-8 bytes of a text column as an
    opaque ``binary`` column plus a mime tag. In a real pipeline this
    column arrives from the source (parquet/lance binary column or
    object-store pointers resolved by a fetch stage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "mime", F.lit("application/octet-stream")
    )


def _fake_meta(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic pseudo-decode: md5-derived dimensions. Stands in
    for a real codec so tests exercise batch shape and schema."""
    digest = hashlib.md5(payload).hexdigest()
    width = 16 * (1 + int(digest[0:2], 16) % 64)
    height = 16 * (1 + int(digest[2:4], 16) % 64)
    channels = 1 + int(digest[4], 16) % 4
    return digest, width, height, channels


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas`` keeps whole Arrow batches in flight; the Python
    work is a tight per-batch loop, not per-row spark serde. The plan
    stays fully distributed — no collect, no shuffle added.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_md5": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "channels": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(extract, IMAGE_META_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode — requires an image codec library.

    STUB: the runtime image has no PIL/opencv/ffmpeg; the Spark-side
    contract (binary in, typed meta + pixel tensor out via
    ``mapInPandas``) is exactly ``decode_image_meta``'s. Wire the
    codec into its batch loop when available.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use decode_image_meta for the plumbing path"
        ) from exc
    raise NotImplementedError("codec available but decode not implemented yet")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic ~1/n frame/asset sampling: keep an asset iff its
    content-md5 prefix clears a hex threshold — a pure Catalyst
    expression, no UDF, so the predicate pushes into the scan stage.
    md5-prefix thresholding (not engine ``hash()``) keeps the sample
    identical across engines, runs, and cluster sizes — the same
    portability rule as the split/sampling operators in
    plans/training_data.py."""
    threshold = f"{(16**4) // every_n:04x}"
    return df.filter(F.substring("content_md5", 1, 4) < F.lit(threshold))
