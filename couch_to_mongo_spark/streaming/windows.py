"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference has no event-time semantics at all — its poll loop is
processing-time only (ChangeFeedClient.java:61-71). A training-data feed
needs event-time rollups with bounded state: tumbling windows + a
watermark that lets Spark drop window state once no earlier data can
arrive. One operator, two modes:

- streaming: ``readStream -> withWatermark -> groupBy(window(ts)) -> agg``
  with append output (a window emits once, when the watermark passes it);
- batch: identical expression tree minus the watermark — this is the
  oracle-checkable twin (`windowed_counts` driver-contract query).

State at scale: the shuffle is on (window, keys); state store size is
O(open windows x keys), bounded by the watermark delay — late rows beyond
it are dropped, the documented trade of completeness for bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (+ sum of value_col if present). Pass
    ``watermark`` on a streaming df to bound state; omit for the batch
    twin. Output: window_start/window_end epoch seconds + keys + aggs —
    epoch ints so the DuckDB oracle compares exactly."""
    keys = keys or []
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col and value_col in df.columns:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    out = df.groupBy(F.window(F.col(ts_col), window).alias("w"), *keys).agg(*aggs)
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        F.unix_timestamp(F.col("w.end")).alias("window_end"),
        *keys,
        *[c for c in ("n_events", "sum_value") if c in out.columns],
    )


def session_window_stats(
    df: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): a session extends
    while events keep arriving within ``gap`` of the previous one — the
    event-time generalization of the batch ``sessionize`` query (which
    uses a lag/cumsum window over the same gap rule).

    Streaming: pass ``watermark``; a session emits once the watermark
    passes its close (append mode), and its state is dropped — state is
    O(open sessions), not O(history). Batch: omit ``watermark``; the same
    expression tree runs as a normal aggregation.

    Scale: the shuffle is on ``keys``; within a key, Spark merges
    overlapping session fragments at the state store. Skewed keys (one
    user with millions of events) are the risk — mitigated upstream by
    the feed's per-conversation keying.
    """
    keys = keys or ["conv_id"]
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        F.unix_timestamp(F.col("w.end")).alias("session_end"),
        *keys,
        "n_events",
        "first_seq",
        "last_seq",
    )
