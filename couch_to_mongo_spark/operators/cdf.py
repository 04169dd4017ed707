"""Change data feed (CDF): row-level semantic changes emitted per MERGE.

``read_appended`` exposes the *physical* changelog (raw multi-version delta
rows); downstream consumers usually want the *semantic* one — which keys
were inserted, updated (with before/after images), or deleted by each
batch. This is Delta Lake's Change Data Feed shape: one row per change,
same columns as the table, plus

- ``_change_type``: insert | update_preimage | update_postimage | delete
- ``_batch_id`` / ``_run_id``: the micro-batch that produced the change
- ``_commit_snapshot``: snapshot id the change became visible in (-1 until
  the commit lands — see idempotence note)

Scale shape: the feed is O(changed rows) per batch — computed from the
classification join the stats path already runs (one extra projection, no
new shuffle) and appended as parquet. A 10^10-event replay emits 10^10
feed rows total, written incrementally; consumers tail it like any
append-only table.

Idempotence contract: each batch writes to a DETERMINISTIC directory
``<root>/run=<run_id>/batch=<batch_id>`` with overwrite semantics, BEFORE
the snapshot commit. A crash-replay of the batch rewrites byte-identical
content (the merge is deterministic given the batch); a batch whose commit
never landed leaves orphan CDF rows, so exact consumers anti-join
``_run_id/_batch_id`` against the table's fences (``committed_only=True``
on :meth:`ChangeFeedLog.read` does this). This mirrors Delta writing CDF
files inside the same commit — here the fence map is the commit record.

Reference parity: couch-to-mongo exposes no change output at all (its sink
is the final Mongo collection); CDF is part of the lakehouse surface above
it (SURVEY.md §2.1 S7 metadata sink is the batch-level cousin).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

CHANGE_TYPE_COL = "_change_type"
CDF_META_COLS = (CHANGE_TYPE_COL, "_run_id", "_batch_id", "_commit_snapshot")

__all__ = ["ChangeFeedLog", "CHANGE_TYPE_COL", "CDF_META_COLS"]


class ChangeFeedLog:
    """Append-only parquet change feed, one directory per (run, batch)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _dir(self, run_id: str, batch_id: int) -> str:
        return os.path.join(self.root, f"run={run_id}", f"batch={batch_id:08d}")

    def append(self, changes: DataFrame, run_id: str, batch_id: int) -> None:
        """Overwrite-write this batch's changes (idempotent under replay)."""
        changes.write.mode("overwrite").parquet(self._dir(run_id, batch_id))

    def read(
        self,
        table=None,
        committed_only: bool = True,
    ) -> DataFrame:
        """The whole feed; with ``committed_only`` (needs ``table``), rows of
        batches at-or-below each run's fenced high-water mark only — orphan
        rows from a crashed, never-committed batch are excluded."""
        df = self.spark.read.option("basePath", self.root).parquet(
            os.path.join(self.root, "run=*", "batch=*")
        )
        if not committed_only:
            return df
        if table is None:
            raise ValueError("committed_only read requires the table (fence map)")
        fences = table.snapshot().fences  # {run_id: [max_batch, snapshot_id]}
        if not fences:
            return df.limit(0)
        cond = None
        for run, (hi, _sid) in fences.items():
            c = (F.col("_run_id") == F.lit(run)) & (F.col("_batch_id") <= F.lit(hi))
            cond = c if cond is None else (cond | c)
        return df.where(cond)


def classify_changes(
    batch: DataFrame,
    existing_winners: DataFrame,
    key_cols: list[str],
    deleted_col: str,
    payload_cols: list[str],
    run_id: str,
    batch_id: int,
) -> DataFrame:
    """Build the CDF rows for one merged batch.

    ``batch``: LWW-deduped batch rows (one per key, tombstones included).
    ``existing_winners``: LWW-resolved LIVE pre-state of the touched
    buckets (non-deleted winners, full payload) — the same frame the merge
    stats join derives, so this adds a projection, not a scan.

    Emits (Delta CDF semantics):
      - insert            -> after image   (batch row, key not live before)
      - update_preimage   -> before image  (existing row, key re-upserted)
      - update_postimage  -> after image   (batch row)
      - delete            -> before image  (existing row, batch tombstones it)
    A tombstone for a key that was not live is a no-op and emits nothing
    (same rule as the n_deletes stat)."""
    cols = [c for c in payload_cols if c != deleted_col]
    is_del = F.coalesce(F.col(deleted_col), F.lit(False))

    ex = existing_winners.select(
        *key_cols, *[F.col(c).alias(f"_pre_{c}") for c in cols if c not in key_cols]
    ).withColumn("_m", F.lit(1))
    j = batch.join(ex, key_cols, "left")
    matched = F.col("_m").isNotNull()

    def image(df, change_type, pre: bool):
        sel = list(key_cols) + [
            (F.col(f"_pre_{c}") if pre else F.col(c)).alias(c)
            for c in cols
            if c not in key_cols
        ]
        return df.select(*sel).withColumn(CHANGE_TYPE_COL, F.lit(change_type))

    inserts = image(j.where(~is_del & ~matched), "insert", pre=False)
    upd_post = image(j.where(~is_del & matched), "update_postimage", pre=False)
    upd_pre = image(j.where(~is_del & matched), "update_preimage", pre=True)
    deletes = image(j.where(is_del & matched), "delete", pre=True)

    out = inserts.unionByName(upd_pre).unionByName(upd_post).unionByName(deletes)
    return (
        out.withColumn("_run_id", F.lit(run_id))
        .withColumn("_batch_id", F.lit(batch_id))
        .withColumn("_commit_snapshot", F.lit(-1))
    )
