"""decode_image_real: the pure-stdlib container parsers (binary PNM,
uncompressed BMP) and the Arrow-batched mapInPandas stage over them.
PIL coverage is import-gated — absent in this container, the stdlib
path is the one under test (and the one the oracle-checked
mm_decode_image_real query exercises)."""

from __future__ import annotations

import importlib.util
import struct
import sys

import pytest

sys.path.insert(0, "/root/repo")

from etl_xlsx_potgres_spark.operators.multimodal import (  # noqa: E402
    _decode_bmp,
    _decode_pnm,
    decode_image_payload,
    decode_image_real,
)


def make_ppm(width, height, pixel_bytes, comment=False):
    mid = "# c\n" if comment else ""
    header = f"P6\n{mid}{width} {height}\n255\n"
    return header.encode() + bytes(pixel_bytes)


def make_bmp(width, height, channels, pixel_rows):
    """Minimal uncompressed BMP: 14-byte file header + 40-byte info
    header + bottom-up padded rows."""
    stride = ((width * channels + 3) // 4) * 4
    data = b"".join(
        bytes(row) + b"\x00" * (stride - width * channels) for row in pixel_rows
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, channels * 8, 0,
        len(data), 2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def test_pnm_p6_dimensions_and_mean():
    w, h, c, mean, codec = _decode_pnm(make_ppm(2, 2, range(12)))
    assert (w, h, c) == (2, 2, 3)
    assert mean == sum(range(12)) / 12
    assert codec == "pnm"


def test_pnm_header_comment_and_p5():
    payload = b"P5\n# comment line\n3 1\n255\n" + bytes([10, 20, 30])
    w, h, c, mean, codec = _decode_pnm(payload)
    assert (w, h, c, mean) == (3, 1, 1, 20.0)


def test_pnm_truncated_raises():
    with pytest.raises(ValueError, match="truncated"):
        _decode_pnm(make_ppm(4, 4, range(10)))  # needs 48 bytes


def test_bmp_24bit_bottom_up_padding():
    # 3x2 24-bit: stride pads 9-byte rows to 12; padding bytes must not
    # leak into the mean
    rows = [[1] * 9, [3] * 9]
    w, h, c, mean, codec = _decode_bmp(make_bmp(3, 2, 3, rows))
    assert (w, h, c) == (3, 2, 3)
    assert mean == 2.0
    assert codec == "bmp"


def test_bmp_8bit_paletteless_identity():
    w, h, c, mean, _ = _decode_bmp(make_bmp(4, 1, 1, [[0, 10, 20, 30]]))
    assert (w, h, c, mean) == (4, 1, 1, 15.0)


def make_bmp_paletted(width, height, pixel_rows, palette):
    """8-bit BMP with a color table: indices resolve through BGRA
    palette entries, not raw index values."""
    stride = ((width + 3) // 4) * 4
    data = b"".join(
        bytes(row) + b"\x00" * (stride - width) for row in pixel_rows
    )
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    data_off = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0,
        len(data), 2835, 2835, len(palette), 0,
    )
    header = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    return header + info + pal + data


def test_bmp_8bit_palette_resolved():
    # indices 0,1 -> entries (30,30,30) and (90,90,90): mean over
    # resolved luminance (60.0), not over the raw indices (0.5)
    payload = make_bmp_paletted(2, 1, [[0, 1]], [(30, 30, 30), (90, 90, 90)])
    w, h, c, mean, _ = _decode_bmp(payload)
    assert (w, h, c, mean) == (2, 1, 1, 60.0)


def test_bmp_8bit_palette_index_out_of_range():
    payload = make_bmp_paletted(2, 1, [[0, 5]], [(10, 10, 10)])
    with pytest.raises(ValueError, match="palette index"):
        _decode_bmp(payload)


def test_bmp_zero_area_raises():
    with pytest.raises(ValueError, match="zero-area"):
        _decode_bmp(make_bmp(0, 0, 3, []))


def test_unsupported_format_raises():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image_payload(b"\x89PNG\r\n\x1a\n garbage")


def test_decode_image_real_mapinpandas(spark):
    df = spark.createDataFrame(
        [(1, make_ppm(2, 2, [8] * 12)), (2, make_bmp(2, 2, 3, [[4] * 6] * 2))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_image_real(df).collect()}
    assert out[1]["width"] == 2 and out[1]["pixel_mean"] == 8.0
    assert out[1]["codec"] in ("pnm", "pil")
    assert out[2]["channels"] == 3 and out[2]["pixel_mean"] == 4.0


def test_wav_decode_roundtrip():
    import math

    from etl_xlsx_potgres_spark.operators.multimodal import (
        decode_audio_payload,
        wav_header,
    )

    samples = [100, -100, 50, -50]
    payload = wav_header(n_frames=4) + b"".join(
        s.to_bytes(2, "little", signed=True) for s in samples
    )
    rate, ch, sw, nf, dur, rms = decode_audio_payload(payload)
    assert (rate, ch, sw, nf) == (8000, 1, 2, 4)
    assert dur == 4 / 8000
    assert rms == math.sqrt(sum(s * s for s in samples) / 4)


def test_wav_decode_rejects_unsupported_width():
    from etl_xlsx_potgres_spark.operators.multimodal import (
        decode_audio_payload,
        wav_header,
    )

    payload = wav_header(n_frames=1, sampwidth=4) + b"\x00" * 4
    with pytest.raises(ValueError, match="sample width"):
        decode_audio_payload(payload)


def test_decode_audio_real_mapinpandas(spark):
    from etl_xlsx_potgres_spark.operators.multimodal import (
        decode_audio_real,
        wav_header,
    )

    payload = wav_header(n_frames=2) + (7).to_bytes(2, "little") * 2
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    row = decode_audio_real(df).collect()[0]
    assert row["sample_rate"] == 8000 and row["n_frames"] == 2
    assert row["rms"] == 7.0


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None, reason="PIL not installed"
)
def test_pil_path_matches_stdlib():
    payload = make_ppm(2, 2, range(12))
    w, h, c, mean, codec = decode_image_payload(payload)
    assert (w, h, c, mean) == (2, 2, 3, sum(range(12)) / 12)
    assert codec == "pil"


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    data=st.data(),
)
def test_pnm_roundtrip_property(w, h, data):
    pix = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
    )
    dec_w, dec_h, c, mean, _ = _decode_pnm(make_ppm(w, h, pix))
    assert (dec_w, dec_h, c) == (w, h, 3)
    assert mean == sum(pix) / len(pix)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, channels, data):
    rows = [
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * channels,
                max_size=w * channels,
            )
        )
        for _ in range(h)
    ]
    dec_w, dec_h, c, mean, _ = _decode_bmp(make_bmp(w, h, channels, rows))
    flat = [b for r in rows for b in r]
    assert (dec_w, dec_h, c) == (w, h, channels)
    assert mean == sum(flat) / len(flat)


@settings(max_examples=60, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_wav_roundtrip_property(rate, data):
    from etl_xlsx_potgres_spark.operators.multimodal import (
        decode_audio_payload,
        wav_header,
    )

    samples = data.draw(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=64)
    )
    payload = wav_header(len(samples), rate=rate) + b"".join(
        s.to_bytes(2, "little", signed=True) for s in samples
    )
    r, ch, sw, nf, dur, rms = decode_audio_payload(payload)
    assert (r, ch, sw, nf) == (rate, 1, 2, len(samples))
    import math

    assert rms == math.sqrt(sum(s * s for s in samples) / len(samples))
