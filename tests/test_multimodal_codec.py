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


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (dHash -> banded hamming pairs -> groups)
# ---------------------------------------------------------------------------


def test_dhash_perceptual_locality():
    """A small pixel perturbation must flip only the bits whose adjacent
    comparisons it touches (<= 2 per changed cell), while an unrelated
    matrix diverges broadly — the property that makes dHash *perceptual*
    rather than cryptographic."""
    from couch_to_mongo_spark.functions.multimodal import _dhash_bits

    base = [[(i * 13 + j * 29) % 251 for j in range(8)] for i in range(8)]
    h0 = _dhash_bits(base)

    near = [row[:] for row in base]
    near[3][4] = (near[3][4] + 1) % 251  # touches comparisons (3,3) and (3,4)
    h1 = _dhash_bits(near)
    assert bin(h0 ^ h1).count("1") <= 2

    other = [[(i * 57 + j * 5 + 11) % 233 for j in range(8)] for i in range(8)]
    h2 = _dhash_bits(other)
    assert bin(h0 ^ h2).count("1") > 3


def test_digest_gray_deterministic_and_bit_exact():
    """The stub pixel source is a pure md5 chain (what the DuckDB oracle
    replays); spot-check one byte against hashlib directly."""
    from couch_to_mongo_spark.functions.multimodal import _digest_gray

    d = hashlib.md5(b"img-0").hexdigest()
    g1, g2 = _digest_gray(d), _digest_gray(d)
    assert g1 == g2
    row0 = hashlib.md5(f"{d}:0".encode()).hexdigest()
    assert g1[0][3] == int(row0[6:8], 16)


def test_hamming_pairs_complete_and_bounded(spark):
    """Pigeonhole banding on a precomputed hash column: every pair within
    max_hamming is found (planted 1/2/3-bit flips), nothing beyond it
    (planted 4-bit flip spread across 4 bands) — completeness, not
    best-effort recall."""
    from couch_to_mongo_spark.functions.text import hamming_pairs

    base = 0x0123456789ABCD  # 56-bit
    rows = [
        (0, base),
        (1, base ^ (1 << 3)),                                  # hamming 1
        (2, base ^ (1 << 15) ^ (1 << 40)),                     # hamming 2
        (3, base ^ (1 << 1) ^ (1 << 20) ^ (1 << 50)),          # hamming 3
        # 4 flips in 4 DIFFERENT 14-bit bands: no shared band, must be absent
        (4, base ^ (1 << 2) ^ (1 << 16) ^ (1 << 30) ^ (1 << 44)),
        (5, 0x7FAAAAAAAAAAAA),                                 # far away
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            df, "dhash", id_col="media_id", max_hamming=3, bands=4, n_bits=56
        ).collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
    assert (0, 4) not in got  # beyond max_hamming
    assert all(a != 5 and b != 5 for a, b in got)


def test_image_dedup_groups_planted_duplicates(spark):
    """Planted recall: 30 images in 10 exact-duplicate triplets (plus 6
    unique singletons) must group exactly by triplet with the min id as
    group id — recall 1.0, zero false merges."""
    from couch_to_mongo_spark.functions.multimodal import image_dedup_groups

    rows = [(i, bytearray(f"img-{i // 3}".encode())) for i in range(30)]
    rows += [(100 + i, bytearray(f"solo-{i}".encode())) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["group_id"] for r in image_dedup_groups(df).collect()
    }
    assert len(got) == 36
    for i in range(30):
        assert got[i] == (i // 3) * 3
    for i in range(6):
        assert got[100 + i] == 100 + i


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this image")
def test_dhash_pil_path_near_dup_images():
    """Real-pixel path: a gradient image and a slightly brightness-shifted
    copy must land within hamming 3 (gradient signs survive uniform
    shifts); an inverted gradient must not."""
    import PIL.Image as Image

    from couch_to_mongo_spark.functions.multimodal import _dhash_bits, _pil_gray

    def img_bytes(fn):
        im = Image.new("L", (64, 64))
        im.putdata([fn(x, y) for y in range(64) for x in range(64)])
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return buf.getvalue()

    a = _dhash_bits(_pil_gray(img_bytes(lambda x, y: min(255, 2 * x + y))))
    b = _dhash_bits(_pil_gray(img_bytes(lambda x, y: min(255, 2 * x + y + 4))))
    c = _dhash_bits(_pil_gray(img_bytes(lambda x, y: max(0, 255 - 2 * x - y))))
    assert bin(a ^ b).count("1") <= 3
    assert bin(a ^ c).count("1") > 3


# ---------------------------------------------------------------------------
# audio fingerprint dedup (energy-sign fingerprint -> banded pairs -> groups)
# ---------------------------------------------------------------------------


def tone_wav(envelope, rate: int = 8000, width: int = 2) -> bytes:
    """16-bit mono WAV whose per-window energy follows `envelope(i)` over
    57 windows — a real varying signal for the REAL fingerprint path."""
    import math

    from couch_to_mongo_spark.functions.multimodal import AFP_WINDOWS

    win = 64
    samples = []
    for i in range(AFP_WINDOWS):
        amp = envelope(i)
        for j in range(win):
            samples.append(int(amp * math.sin(2 * math.pi * j / 16)))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(width)
        f.setframerate(rate)
        f.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_afp_real_wav_gain_invariant():
    """The REAL decode path: a uniformly gain-scaled copy fingerprints
    identically (energy-difference signs are gain-invariant — the
    property that makes it perceptual); an unrelated envelope diverges."""
    from couch_to_mongo_spark.functions.multimodal import (
        _sign_bits,
        _wav_energies,
    )

    env = lambda i: 500 + 400 * ((i * 37) % 19)
    a = _sign_bits(_wav_energies(tone_wav(env)))
    b = _sign_bits(_wav_energies(tone_wav(lambda i: env(i) * 1.5)))
    c = _sign_bits(_wav_energies(tone_wav(lambda i: 500 + 400 * ((i * 11) % 23))))
    assert a == b
    assert bin(a ^ c).count("1") > 3
    # silence/unvarying signal is legal input (all-equal energies -> 0 hash)
    assert _sign_bits(_wav_energies(make_wav(600))) == 0


def test_afp_stub_bit_exact_md5_chain():
    from couch_to_mongo_spark.functions.multimodal import _digest_energies

    d = hashlib.md5(b"aud-1").hexdigest()
    e = _digest_energies(d)
    assert len(e) == 57
    assert e[5] == int(hashlib.md5(f"{d}:5".encode()).hexdigest()[:8], 16)
    assert _digest_energies(d) == e


def test_audio_dedup_groups_planted(spark):
    """Planted recall over a MIX of real WAV clips and stub payloads:
    duplicate triplets (identical bytes) group with min id; a gain-scaled
    real clip joins its original's group via the REAL decode path."""
    from couch_to_mongo_spark.functions.multimodal import audio_dedup_groups

    env = lambda i: 500 + 400 * ((i * 37) % 19)
    wav_a = tone_wav(env)
    wav_b = tone_wav(lambda i: env(i) * 1.25)  # same signs, hamming 0
    rows = [(0, bytearray(wav_a)), (1, bytearray(wav_b))]
    rows += [(10 + i, bytearray(f"aud-{10 + i - (i % 3)}".encode())) for i in range(9)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["group_id"] for r in audio_dedup_groups(df).collect()
    }
    assert got[0] == 0 and got[1] == 0  # real path: gain-scaled copy grouped
    for i in range(9):
        assert got[10 + i] == 10 + i - (i % 3)  # stub path: exact triplets
