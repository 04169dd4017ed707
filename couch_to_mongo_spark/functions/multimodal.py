"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly batch
iteration, Arrow batch shapes — is real and tested; the actual codec step
is a clearly-marked deterministic STUB because no image/audio libraries
ship in this container (swap ``_decode_stub`` for PIL/ffmpeg on a real
cluster; the ``mapInPandas`` contract is unchanged).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """STUB codec: deterministic pseudo-metadata from the payload digest.

    On a real cluster this is PIL.Image.open / soundfile / pyav frame
    probing. NotImplementedError intentionally NOT raised: the fake is
    deterministic so plumbing tests can assert exact values.
    """
    digest = hashlib.md5(payload).hexdigest()
    h = int(digest[:8], 16)
    return {
        "n_bytes": len(payload),
        "width": 64 + h % 1024 if kind == "image" else None,
        "height": 64 + (h >> 10) % 1024 if kind == "image" else None,
        "duration_ms": 1000 + h % 600000 if kind in ("audio", "video") else None,
        "content_digest": digest,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/probe each media payload via mapInPandas (Arrow batches).

    Arrow moves the binary column in zero-copy batches; each batch is
    decoded vectorized-per-batch in one Python call — the correct shape for
    a real codec too (batch the I/O, not per-row UDF calls)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            for c in ("width", "height", "duration_ms"):
                out[c] = out[c].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)
