"""Streaming deduplication of an at-least-once change feed.

A redelivered change event (same ``seq``) is harmless to the MERGE path —
LWW folding is idempotent — but it still costs a shuffle row and a state
probe per duplicate. This operator drops redeliveries *inside* the stream
with bounded state: ``dropDuplicatesWithinWatermark`` keeps each key only
until the watermark passes its event time, so state is O(events within
the watermark horizon), not O(all events ever seen).

The reference deduplicates with an unbounded in-memory id set
(Couch.java ``idProcessed`` — its documented scaling bug, grows with the
source). The watermark bound is the Spark-native fix: the same guarantee
within the lateness horizon, constant memory beyond it.

Scale: state is hash-partitioned on the dedup key across executors; each
micro-batch shuffles only its own rows. Duplicates arriving later than
the watermark delay are passed through (and then absorbed by the
idempotent MERGE) — the documented trade of bounded state for a
best-effort in-stream filter backed by an exact downstream fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered events by key with watermark-bounded state.

    ``keys`` defaults to ``["seq"]`` — the feed's unique change sequence.
    The watermark must cover the source's maximum redelivery lag.
    """
    keys = keys or ["seq"]
    out = stream.withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark(keys)
