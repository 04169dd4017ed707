"""Phase-1 bulk snapshot copy (SURVEY.md §3.1).

The reference's bulk phase partitions the sorted _id space into
couch_batch_size ranges and fans range-scans out to a thread pool, bulk-
inserting with an exists-in-sink skip (reference: Couch.java:106-189,
230-318; Mongo.java:189-267). In Spark the whole phase is one declarative
job — scan → normalize → dedup-by-key → bucketed write → single snapshot
commit — with partitioning owned by the shuffle on ``bucket(conv_id)``
instead of a hand-built TreeMap of key ranges. Session lifecycle
("start"/"end" metadata ops, Mongo.java:311-321) maps to the lineage rows
plus the atomic snapshot commit itself: a killed bootstrap leaves version 0
untouched (no partial state), so resume == rerun.

Bootstrap rows are stamped ``_seq = seq_floor`` (default -1) and
``_rev = '0-bootstrap'`` so every real CDC event (seq >= 0, rev_gen >= 1)
wins LWW against the bootstrap copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couch_to_mongo_spark.functions.normalize import normalize_text
from couch_to_mongo_spark.operators.dedup import lww_dedup
from couch_to_mongo_spark.operators.merge import (
    DELETED_COL,
    REV_COL,
    SEQ_COL,
    MergeResult,
    with_engine_schema,
)
from couch_to_mongo_spark.operators.schema_evolution import align_to_schema
from couch_to_mongo_spark.streaming.lineage import LineageLog
from couch_to_mongo_spark.tableformat import BUCKET_COL, LakeTable, bucket_expr

import os


def bulk_bootstrap(
    spark: SparkSession,
    table_path: str,
    source_df: DataFrame,
    key_cols: list[str] | None = None,
    n_buckets: int = 16,
    run_id: str = "bootstrap",
    order_cols: list[str] | None = None,
    normalize: bool = True,
    seq_floor: int = -1,
    files_per_bucket: int = 1,
) -> tuple[LakeTable, MergeResult]:
    """Copy a full source snapshot into a fresh table (one commit)."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    payload_schema = source_df.schema
    table = LakeTable.create(
        spark, table_path, with_engine_schema(payload_schema), n_buckets=n_buckets
    )
    if table.is_batch_committed(run_id, 0):
        return table, MergeResult(skipped=True)

    df = source_df
    if normalize and "text" in df.columns:
        df = df.withColumn("text", normalize_text(F.col("text")))
    # defensive dedup: source snapshots can overlap at range boundaries
    # (the reference's boundary-overlap dedup, Couch.java:320-341 / P4)
    if order_cols is None:
        order_cols = [c for c in ("ts",) if c in df.columns] or key_cols[:1]
    df = lww_dedup(df, key_cols, order_cols)
    df = (
        df.withColumn(SEQ_COL, F.lit(seq_floor).cast("long"))
        .withColumn(REV_COL, F.lit("0-bootstrap"))
        .withColumn(DELETED_COL, F.lit(False))
    )
    df = align_to_schema(df, table.snapshot().schema)
    df = df.withColumn(BUCKET_COL, bucket_expr(key_cols[0], n_buckets))
    n_parts = n_buckets * max(files_per_bucket, 1)
    if files_per_bucket > 1:
        # Salt hash seeded independently of the bucket hash (extra literal
        # arg): pmod(h, n_buckets) and pmod(h, files_per_bucket) of the SAME
        # h are congruent whenever files_per_bucket divides n_buckets, which
        # leaves hot buckets unsplit (matches dedup.py bucket_partitioned_lww).
        df = df.repartition(
            n_parts,
            F.col(BUCKET_COL),
            F.pmod(F.xxhash64(F.col(key_cols[0]), F.lit(1)), F.lit(files_per_bucket)),
        )
    else:
        df = df.repartition(n_parts, F.col(BUCKET_COL))

    new_files = table.write_bucketed(df, snapshot_hint="s00000001", n_buckets=n_buckets)
    from couch_to_mongo_spark.operators.merge import _footer_seq_stats

    n_rows, _, _, per_file = _footer_seq_stats(table, new_files)
    n_rows = int(n_rows)
    result = MergeResult(
        skipped=False,
        n_inserts=n_rows,
        rows_applied=n_rows,
        seq_min=seq_floor,
        seq_max=seq_floor,
        touched_buckets=len(new_files),
    )
    snap = table.commit(
        new_files,
        list(new_files.keys()),
        result.to_lineage(),
        run_id=run_id,
        batch_id=0,
        new_file_stats=per_file,
    )
    result.snapshot_id = snap.snapshot_id
    LineageLog(os.path.join(table_path, "_lineage")).append(
        run_id,
        0,
        seq_min=seq_floor,
        seq_max=seq_floor,
        rows_applied=n_rows,
        n_inserts=n_rows,
        snapshot_id=snap.snapshot_id,
        partition_stats={"touched_buckets": len(new_files)},
    )
    return table, result

