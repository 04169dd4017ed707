"""Real-codec path of decode_media: stdlib PNG/JPEG/WAV probing with the
deterministic stub as fallback (and PIL as an optional extra). Constructed
payloads are genuine format bytes — the decode is real, not pattern-matched
test fixtures."""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import pytest

from couch_to_mongo_spark.functions.multimodal import (
    _HAS_PIL,
    _decode_real,
    _decode_stub,
    decode_media,
)


def make_png(w: int, h: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 + zeros
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(ms: int, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"\x00\x00" * (rate * ms // 1000))
    return buf.getvalue()


def test_stdlib_decoders_return_true_metadata():
    png = make_png(320, 200)
    m = _decode_real(png, "image")
    assert (m["width"], m["height"]) == (320, 200)
    assert m["duration_ms"] is None and m["n_bytes"] == len(png)
    assert m["content_digest"] == hashlib.md5(png).hexdigest()

    jpg = make_jpeg(640, 480)
    m = _decode_real(jpg, "image")
    assert (m["width"], m["height"]) == (640, 480)

    wav = make_wav(1500)
    m = _decode_real(wav, "audio")
    assert m["duration_ms"] == 1500
    assert m["width"] is None and m["height"] is None


def test_unrecognized_payload_falls_back_to_stub():
    junk = b"payload-12345"
    assert _decode_real(junk, "image") is None
    stub = _decode_stub(junk, "image")
    assert stub["content_digest"] == hashlib.md5(junk).hexdigest()
    assert stub["width"] is not None  # deterministic fake dims


def test_decode_media_mixes_real_and_stub_paths(spark):
    rows = [
        (1, "image", bytearray(make_png(33, 44)), "image/png"),
        (2, "image", bytearray(make_jpeg(100, 50)), "image/jpeg"),
        (3, "audio", bytearray(make_wav(2000)), "audio/wav"),
        (4, "video", bytearray(b"payload-4"), "application/x-fake-video"),
    ]
    df = spark.createDataFrame(
        rows, "media_id LONG, kind STRING, payload BINARY, mime STRING"
    )
    out = {r["media_id"]: r.asDict() for r in decode_media(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (33, 44)
    assert (out[2]["width"], out[2]["height"]) == (100, 50)
    assert out[3]["duration_ms"] == 2000
    # fake payload -> stub path, digest still real
    assert out[4]["content_digest"] == hashlib.md5(b"payload-4").hexdigest()
    assert out[4]["duration_ms"] is not None


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this image")
def test_pil_path_decodes_other_formats():
    import PIL.Image as Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="BMP")
    m = _decode_real(buf.getvalue(), "image")
    assert (m["width"], m["height"]) == (12, 7)
