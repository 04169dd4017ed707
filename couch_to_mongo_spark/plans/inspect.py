"""Physical-plan inspection helpers (SURVEY.md §4).

The reference hand-schedules its physical plan (thread pool + manual range
partitions); here Catalyst owns it, and these helpers are how we *assert*
that the optimizer actually delivered: filters pushed to the parquet scan,
columns pruned, small dims broadcast, aggregations map-side partial,
top-k as TakeOrderedAndProject. Used by tests/test_plans.py so plan
regressions fail CI, not just slow down the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning evidence)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count — every Exchange is a full network/disk round.

    Counts detail-section node headers `(N) Exchange` only (the formatted
    plan prints each node twice: tree + detail)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_top_k(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def count_partial_final_aggs(df: DataFrame) -> int:
    """Aggregate node count (detail headers). 2+ = map-side partial combine
    ran before the shuffle — the built-in hot-key defense. max_by over a
    struct buffer plans as SortAggregate (structs aren't hash-buffer
    mutable); the partial/final split is what matters for skew."""
    return len(
        re.findall(
            r"\(\d+\) (?:HashAggregate|ObjectHashAggregate|SortAggregate)\b",
            formatted_plan(df),
        )
    )
