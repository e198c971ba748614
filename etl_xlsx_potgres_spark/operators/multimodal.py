"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/transformed through Arrow-batched ``mapInPandas``.

Design (the part that matters at 100 TB):
- media lives in a ``binary`` column next to typed metadata columns —
  one row per asset, partitioned by whatever the pipeline shards on;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow batches in, Arrow batches out, no
  per-row serde, no driver involvement, composable with any
  DataFrame op before/after;
- ``decode_image_meta`` derives a deterministic fake (md5-based) so
  the Spark-side plumbing — schema, batching, partition behavior — is
  testable independent of any codec; ``decode_image_real`` actually
  parses payloads: PIL when importable (full format coverage), else
  pure-stdlib decoders for the uncompressed containers (binary
  PNM, BMP) — so the real path runs even in codec-less environments.
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


IMAGE_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, "
    "width int, height int, channels int, pixel_mean double, codec string"
)


def _decode_pnm(payload: bytes) -> tuple[int, int, int, float, str]:
    """Pure-stdlib decode of binary PNM (P6 RGB / P5 gray) — header is
    ASCII tokens (magic, width, height, maxval) with #-comments, then a
    raw sample plane."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i:i + 1]
        if c == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    pixels = payload[i + 1: i + 1 + width * height * channels]
    if len(pixels) != width * height * channels:
        raise ValueError("truncated PNM pixel plane")
    return width, height, channels, sum(pixels) / len(pixels), "pnm"


def _decode_bmp(payload: bytes) -> tuple[int, int, int, float, str]:
    """Pure-stdlib decode of uncompressed 8/24/32-bit BMP (BITMAPINFO
    header): rows are bottom-up and padded to 4-byte strides. 8-bit
    pixels are palette indices — when a color table is present it is
    resolved (mean over the entries' R/G/B luminance) so ``pixel_mean``
    is over pixel values, never raw indices; a palette-less 8-bit BMP
    is treated as identity-grayscale."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bitcount = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bitcount not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bits={bitcount} comp={compression})")
    channels = bitcount // 8
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"zero-area BMP ({width}x{height})")
    # 8-bit: map each index through the color table's mean luminance
    # ((R+G+B)/3 per BGRA entry, between the info header and the pixel
    # plane); absent table -> identity (index == gray value).
    lut: list[float] | None = None
    if bitcount == 8:
        pal_start, pal_bytes = 14 + hdr_size, data_off - (14 + hdr_size)
        if pal_bytes >= 4:
            lut = [
                (payload[o] + payload[o + 1] + payload[o + 2]) / 3.0
                for o in range(pal_start, pal_start + (pal_bytes // 4) * 4, 4)
            ]
    stride = ((width * channels + 3) // 4) * 4
    total, count = 0.0, 0
    for row in range(height):
        start = data_off + row * stride
        line = payload[start: start + width * channels]
        if len(line) != width * channels:
            raise ValueError("truncated BMP pixel data")
        if lut is not None:
            try:
                total += sum(lut[b] for b in line)
            except IndexError:
                raise ValueError("BMP palette index out of range") from None
        else:
            total += sum(line)
        count += len(line)
    return width, height, channels, total / count, "bmp"


def decode_image_payload(payload: bytes) -> tuple[int, int, int, float, str]:
    """Decode one image payload to (width, height, channels,
    pixel_mean, codec). Uses PIL when importable (full format
    coverage); otherwise falls back to pure-stdlib parsers for the
    uncompressed container formats (PNM, BMP) so the real-decode path
    stays exercisable in codec-less environments."""
    try:
        import io

        import PIL.Image

        with PIL.Image.open(io.BytesIO(payload)) as im:
            im.load()
            bands = len(im.getbands())
            acc = 0
            for band in im.split():
                acc += sum(band.getdata())
            mean = acc / (im.width * im.height * bands)
            return im.width, im.height, bands, mean, "pil"
    except ImportError:
        pass
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unsupported image format without a codec library "
        "(pure-stdlib path handles PNM/BMP)"
    )


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode over the binary column — same Arrow-batched
    ``mapInPandas`` contract as ``decode_image_meta``, but the
    dimensions/means come from actually parsing the payload
    (PIL if present, else the stdlib PNM/BMP parsers). Undecodable
    payloads surface as an error per-row contract violation rather
    than poisoning the batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, c, mean, codec = decode_image_payload(payload)
                rows.append(
                    (
                        doc_id,
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                        w, h, c, mean, codec,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "content_md5",
                    "width", "height", "channels", "pixel_mean", "codec",
                ],
            )

    return df.mapInPandas(extract, IMAGE_DECODE_SCHEMA)


AUDIO_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate int, channels int, "
    "sample_width int, n_frames long, duration_sec double, rms double"
)


def wav_header(n_frames: int, rate: int = 8000, channels: int = 1,
               sampwidth: int = 2) -> bytes:
    """Canonical 44-byte RIFF/WAVE header for a raw PCM payload —
    used by tests and by plans that synthesize audio payloads."""
    import struct

    data_len = n_frames * channels * sampwidth
    return (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate,
            rate * channels * sampwidth, channels * sampwidth, sampwidth * 8,
        )
        + b"data" + struct.pack("<I", data_len)
    )


def decode_audio_payload(payload: bytes) -> tuple[int, int, int, int, float, float]:
    """Decode one WAV payload to (sample_rate, channels, sample_width,
    n_frames, duration_sec, rms) — pure stdlib (`wave`), PCM 8/16-bit."""
    import array
    import io
    import math
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if sampwidth == 2:
        samples = array.array("h")
        samples.frombytes(frames)
    elif sampwidth == 1:
        # 8-bit WAV is unsigned, centered at 128
        samples = array.array("i", (b - 128 for b in frames))
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    rms = (
        math.sqrt(sum(s * s for s in samples) / len(samples)) if samples else 0.0
    )
    return rate, channels, sampwidth, n_frames, n_frames / rate, rms


def decode_audio_real(df: DataFrame) -> DataFrame:
    """Real audio decode over the binary column — Arrow-batched
    ``mapInPandas``, same contract as ``decode_image_real``. WAV/PCM
    needs no codec library; compressed containers (mp3/ogg/flac) would
    slot into the same batch loop behind an import gate."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                rate, ch, sw, nf, dur, rms = decode_audio_payload(payload)
                rows.append((doc_id, len(payload), rate, ch, sw, nf, dur, rms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "channels",
                    "sample_width", "n_frames", "duration_sec", "rms",
                ],
            )

    return df.mapInPandas(extract, AUDIO_DECODE_SCHEMA)


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
