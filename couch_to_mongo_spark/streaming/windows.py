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
