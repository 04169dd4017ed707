"""As-of join: enrich each event with the most recent state at-or-before it.

Spark has no native ASOF JOIN; the scalable composition is union + one
window pass (the pattern range-join libraries reduce to when the right
side is "latest value wins"):

    1. stack left (probe) and right (state) rows on the shared key with a
       side tag — ONE shuffle, on the key;
    2. within each key, sort by (ts, side) and carry the last non-null
       right payload forward (``last(..., ignorenulls=True)`` over an
       unbounded-preceding window);
    3. keep the probe rows.

Cost: one shuffle + one in-partition sort — same asymptotics as the
groupBy it replaces, no per-left-row range scan, no broadcast requirement
on either side (both may be 100 TB). Hot keys behave like any windowed
key: bound them upstream or pre-aggregate the right side to its per-ts
winner (which :func:`asof_join` does when ``dedup_right=True``).

Tie rule: a state row AT the probe's timestamp is visible to it (<=
semantics, matching DuckDB's ASOF JOIN used as the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    dedup_right: bool = True,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` sharing the ``by`` key (null if none).

    right_cols: right payload columns to carry (default: everything except
    by/ts). dedup_right: collapse right rows sharing (by, ts) to one
    deterministic winner first (max by ``order_tiebreak``)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {ts_col}]
    if dedup_right:
        order = [ts_col] + ([order_tiebreak] if order_tiebreak else right_cols[:1])
        w = Window.partitionBy(*by, ts_col).orderBy(*[F.col(c).desc() for c in order])
        right = (
            right.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    left_payload = [c for c in left.columns if c not in set(by) | {ts_col}]
    l = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_payload]).alias("_lp"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols])).schema[0].dataType
        ).alias("_rp"),
    )
    r = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_payload])).schema[0].dataType
        ).alias("_lp"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rp"),
    )
    stacked = l.unionByName(r)
    # side 0 (state) sorts before side 1 (probe) at equal ts => <= visibility
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = stacked.withColumn("_state", F.last("_rp", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        *by,
        F.col(ts_col),
        *[F.col(f"_lp.{c}").alias(c) for c in left_payload],
        *[F.col(f"_state.{c}").alias(c) for c in right_cols],
    )
    return out
