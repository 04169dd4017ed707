"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata
struct, decoded per Arrow batch via ``mapInPandas``. The codec resolves
per payload by magic-byte sniffing:

1. REAL stdlib decoders — PNG (IHDR), JPEG (SOF marker walk), WAV (RIFF
   via the ``wave`` module) — no external libraries needed;
2. PIL, if importable in the environment (feature-detected once per
   worker), for any other image format;
3. otherwise a clearly-marked deterministic stub (digest-derived fake
   metadata), so unrecognized payloads — and the synthetic contract
   fixture — decode reproducibly instead of failing.

The poison-isolation wrapper (operators/poison.py) composes unchanged: a
genuinely corrupt payload can be quarantined per-row instead of failing
the batch.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # feature detection: PIL is optional, never required
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("content_digest", T.StringType(), True),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media table from any id-bearing df: payload = utf-8 bytes of a
    deterministic string (stands in for real image bytes)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.col(id_col)), "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB codec: deterministic pseudo-metadata from the payload digest —
    the fallback for payloads no real decoder recognizes. Deterministic so
    plumbing tests (and the synthetic contract fixture) can assert exact
    values."""
    digest = hashlib.md5(payload).hexdigest()
    h = int(digest[:8], 16)
    return {
        "n_bytes": len(payload),
        "width": 64 + h % 1024 if kind == "image" else None,
        "height": 64 + (h >> 10) % 1024 if kind == "image" else None,
        "duration_ms": 1000 + h % 600000 if kind in ("audio", "video") else None,
        "content_digest": digest,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG markers to the first SOFn frame header for dimensions."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return int(w), int(h)
        i += 2 + seg_len
    return None


def _wav_duration_ms(b: bytes) -> int | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            rate = w.getframerate()
            if not rate:
                return None
            return int(round(w.getnframes() * 1000.0 / rate))
    except (wave.Error, EOFError):
        return None


def _decode_real(payload: bytes, kind: str) -> dict | None:
    """Real codec path: stdlib PNG/JPEG/WAV probing, then PIL if the
    environment has it. Returns None when nothing recognizes the payload
    (caller falls back to the deterministic stub)."""
    dims = _png_dims(payload) or _jpeg_dims(payload)
    duration = None if dims else _wav_duration_ms(payload)
    if dims is None and duration is None and _HAS_PIL:
        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                dims = (int(im.width), int(im.height))
        except Exception:
            return None
    if dims is None and duration is None:
        return None
    return {
        "n_bytes": len(payload),
        "width": dims[0] if dims else None,
        "height": dims[1] if dims else None,
        "duration_ms": duration,
        "content_digest": hashlib.md5(payload).hexdigest(),
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/probe each media payload via mapInPandas (Arrow batches).

    Arrow moves the binary column in zero-copy batches; each batch is
    decoded vectorized-per-batch in one Python call — the correct shape for
    a real codec too (batch the I/O, not per-row UDF calls)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_real(p, k) or _decode_stub(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            for c in ("width", "height", "duration_ms"):
                out[c] = out[c].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)
