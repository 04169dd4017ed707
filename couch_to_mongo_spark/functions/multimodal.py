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


DHASH_GRID = 8  # 8x8 gray grid -> 7 adjacent comparisons x 8 rows
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)  # 56: fits a positive BIGINT


def _digest_gray(digest: str) -> list[list[int]]:
    """Deterministic 8x8 gray matrix from a payload's md5 digest: row i is
    the first 8 bytes of ``md5(digest + ':' + i)``. The STUB pixel source
    for payloads no image decoder recognizes (and for PIL-less
    environments): identical bytes hash identically — the operator then
    behaves as exact content dedup — and the md5 chain is exactly
    replayable in DuckDB, which is what the contract oracle does."""
    rows = []
    for i in range(DHASH_GRID):
        h = hashlib.md5(f"{digest}:{i}".encode()).hexdigest()
        rows.append(
            [int(h[2 * j : 2 * j + 2], 16) for j in range(DHASH_GRID)]
        )
    return rows


def _dhash_bits(gray: list[list[int]]) -> int:
    """Difference hash over a gray grid: bit ``i*(G-1)+j`` set iff
    ``gray[i][j] < gray[i][j+1]`` — the adjacent-pixel gradient sign,
    which survives uniform brightness/contrast shifts (the property that
    makes dHash perceptual). 56 bits on the 8x8 grid, so the value stays
    a positive signed 64-bit integer in every engine."""
    h = 0
    for i in range(DHASH_GRID):
        row = gray[i]
        for j in range(DHASH_GRID - 1):
            if row[j] < row[j + 1]:
                h |= 1 << (i * (DHASH_GRID - 1) + j)
    return h


def _pil_gray(payload: bytes) -> list[list[int]] | None:
    """Real pixel path: PIL grayscale + resize to the dHash grid.
    Feature-detected once per worker; None (-> digest stub) when PIL is
    absent or the payload isn't a decodable image."""
    if not _HAS_PIL:
        return None
    try:
        with _PILImage.open(io.BytesIO(payload)) as im:
            px = list(im.convert("L").resize((DHASH_GRID, DHASH_GRID)).getdata())
        return [
            px[i * DHASH_GRID : (i + 1) * DHASH_GRID] for i in range(DHASH_GRID)
        ]
    except Exception:
        return None


def image_dhash(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual hash per image payload — ONE ``mapInPandas`` Arrow pass
    (binary batches move zero-copy; per-row work is an 8x8 resize+compare,
    the correct batched-codec shape), no shuffle. Output: (id, dhash).

    The reference replicates media-less JSON docs (Mongo.java:189); image
    columns and their dedup are beyond-reference, per the training-data
    mandate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf[payload_col]:
                b = bytes(p)
                gray = _pil_gray(b) or _digest_gray(hashlib.md5(b).hexdigest())
                hashes.append(_dhash_bits(gray))
            yield pd.DataFrame({id_col: pdf[id_col].values, "dhash": hashes})

    # id dtype derived from the input (ADVICE r6: a hardcoded long fails
    # Arrow conversion for string media ids, though id_col is a parameter)
    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        gen, f"{id_col} {id_t}, dhash long"
    )


def image_dedup_groups(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Content-level image near-dup groups — the multimodal analogue of
    the text/embedding dedup family: dHash (one Arrow scan) -> COMPLETE
    Hamming-<=k candidate pairs by pigeonhole banding (one shuffle on
    (band, value), never all-pairs — text.hamming_pairs) -> large-star/
    small-star connected components -> per-image group id (component
    minimum, so keeper election is ``media_id == group_id``).

    Scale shape: identical to simhash dedup — band selectivity is
    2^(56/bands) so 14-bit bands stay collision-bound on 10^9-image
    corpora; the fixpoint is the same relational components kernel the
    text family already runs. Output: (id, dhash, group_id)."""
    from couch_to_mongo_spark.functions.text import hamming_pairs
    from couch_to_mongo_spark.operators.components import connected_components

    # two consumers (band join + final attach) would each re-run the
    # Arrow hashing pass over every payload — materialize the tiny
    # (id, hash) projection once instead (the exchange-reuse rule:
    # restructure, don't re-derive)
    hashes = image_dhash(df, id_col=id_col, payload_col=payload_col)
    hashes = hashes.localCheckpoint(eager=False)
    pairs = hamming_pairs(
        hashes, "dhash", id_col=id_col,
        max_hamming=max_hamming, bands=bands, n_bits=DHASH_BITS,
    )
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias(id_col), F.col("component").alias("group_id")
    )
    # attach_components' singleton rule, keeping the hash column (no
    # forced broadcast: AQE upgrades when the mapping is actually small)
    return hashes.join(comp, id_col, "left").select(
        F.col(id_col),
        F.col("dhash"),
        F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"),
    )


#: audio fingerprint: 57 energy windows -> 56 adjacent-sign bits (the
#: same positive-BIGINT budget as the image dHash, so the two share the
#: banded hamming back end)
AFP_WINDOWS = DHASH_BITS + 1


def _sign_bits(vals: list[int]) -> int:
    """Adjacent-difference sign bits: bit j set iff vals[j] < vals[j+1].
    The scalar kernel under both perceptual hashes — gradient signs
    survive uniform gain/brightness shifts."""
    h = 0
    for j in range(len(vals) - 1):
        if vals[j] < vals[j + 1]:
            h |= 1 << j
    return h


def _digest_energies(digest: str, n: int = AFP_WINDOWS) -> list[int]:
    """Deterministic pseudo-energies from a payload digest (md5 chain,
    exactly replayable in DuckDB) — the stub for payloads no audio
    decoder recognizes; identical bytes fingerprint identically, so the
    operator degrades to exact content dedup, never silently drops."""
    return [
        int(hashlib.md5(f"{digest}:{i}".encode()).hexdigest()[:8], 16)
        for i in range(n)
    ]


def _wav_energies(b: bytes, n: int = AFP_WINDOWS) -> list[int] | None:
    """REAL fingerprint path: per-window summed |amplitude| over the WAV
    sample stream (stdlib ``wave`` + numpy; 16-bit and 8-bit PCM). None
    for non-WAV / too-short / exotic widths (caller falls back to the
    digest stub)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            raw = w.readframes(w.getnframes())
            width = w.getsampwidth()
    except (wave.Error, EOFError):
        return None
    import numpy as np

    if width == 2:
        s = np.abs(
            np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.int64)
        )
    elif width == 1:
        s = np.abs(np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128)
    else:
        return None
    if s.size < n:
        return None
    win = s.size // n
    return s[: win * n].reshape(n, win).sum(axis=1).tolist()


def audio_fingerprint(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual audio fingerprint per payload — ONE mapInPandas Arrow
    pass, no shuffle: 57 energy windows over the decoded sample stream,
    56 adjacent-sign bits (robust to uniform gain; the chromaprint-style
    energy-difference construction). Real for WAV payloads (stdlib
    decode), digest-stub otherwise. Output: (id, afp)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for p in pdf[payload_col]:
                b = bytes(p)
                e = _wav_energies(b) or _digest_energies(
                    hashlib.md5(b).hexdigest()
                )
                fps.append(_sign_bits(e))
            yield pd.DataFrame({id_col: pdf[id_col].values, "afp": fps})

    id_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, payload_col).mapInPandas(
        gen, f"{id_col} {id_t}, afp long"
    )


def audio_dedup_groups(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Content-level audio near-dup groups — completes the multimodal
    dedup family (text / embeddings / image / audio all share the same
    scale spine): fingerprint (one Arrow scan) -> complete Hamming<=k
    pairs by pigeonhole bands (text.hamming_pairs) -> connected
    components -> per-clip group id (component minimum). Output:
    (id, afp, group_id)."""
    from couch_to_mongo_spark.functions.text import hamming_pairs
    from couch_to_mongo_spark.operators.components import connected_components

    fps = audio_fingerprint(df, id_col=id_col, payload_col=payload_col)
    fps = fps.localCheckpoint(eager=False)  # two consumers, one Arrow pass
    pairs = hamming_pairs(
        fps, "afp", id_col=id_col,
        max_hamming=max_hamming, bands=bands, n_bits=DHASH_BITS,
    )
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias(id_col), F.col("component").alias("group_id")
    )
    return fps.join(comp, id_col, "left").select(
        F.col(id_col),
        F.col("afp"),
        F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"),
    )


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
