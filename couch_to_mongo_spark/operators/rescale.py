"""Bucket rescaling: re-key the table from N to M hash buckets.

The operational answer to 100x growth: a table bucketed for 1 TB
(n_buckets=16) that grows to 100 TB ends up with multi-TB buckets — merge
tasks, compaction units, and scan parallelism are all bucket-granular, so
the bucket count must be able to evolve without table downtime or a manual
copy job. Iceberg models this as partition-spec evolution; here the bucket
function is `pmod(xxhash64(key), n_buckets)`, which is not
divisibility-stable, so rescale is a single full rewrite published as one
atomic strict-replace commit:

- readers before the commit see the old layout, readers after see the new
  one — never a mix (snapshot isolation from the version pointer);
- exactly-once fences carry over, so a streaming run resumes across the
  rescale without replaying applied batches;
- any concurrent merge that lands between our snapshot read and commit
  raises CommitConflict (its rows would otherwise be lost in the re-key),
  and the caller re-runs — same safety rule as COW strict replace.

The rewrite itself folds multi-version MOR deltas with the same LWW kernel
compaction uses (tombstones kept — out-of-order replays must still lose to
them), so the rescaled table starts compact. Cost is one table-sized
shuffle — O(data), amortized over the months the new layout serves; at
100 TB you run it as a dedicated job, not inside the ingest loop.

Reference parity note: couch-to-mongo fixes its parallelism at config time
(num_threads, CouchToMongo.java:40-61) and cannot re-shard a finished
migration; rescale is part of the lakehouse operational surface above it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from couch_to_mongo_spark.operators.dedup import lww_dedup, with_rev_gen
from couch_to_mongo_spark.operators.merge import REV_COL, SEQ_COL, _footer_seq_stats
from couch_to_mongo_spark.tableformat import BUCKET_COL, LakeTable, bucket_expr

__all__ = ["rescale_buckets"]


def rescale_buckets(
    table: LakeTable,
    new_n_buckets: int,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    sort_within_bucket: bool = True,
) -> dict:
    """Rewrite the whole table into ``new_n_buckets`` hash buckets in one
    atomic strict-replace commit. Returns {"old_n_buckets", "new_n_buckets",
    "rows"}. Raises CommitConflict if anything commits concurrently."""
    snap = table.snapshot()
    old_n = snap.n_buckets
    df = table.read(version=snap.version)
    keys = [c for c in key_cols if c in df.columns]
    df = with_rev_gen(df, rev_col=REV_COL)
    df = lww_dedup(df, keys, [SEQ_COL, "rev_gen", REV_COL]).drop("rev_gen")
    df = df.withColumn(BUCKET_COL, bucket_expr(keys[0], new_n_buckets))
    df = df.repartition(new_n_buckets, F.col(BUCKET_COL))
    if sort_within_bucket:
        # _bucket leads: satisfies the partitioned writer's required
        # ordering so no (spill-unstable) extra SortExec is inserted —
        # see operators/compact.py
        df = df.sortWithinPartitions(BUCKET_COL, *keys)

    new_files = table.write_bucketed(
        df, snapshot_hint=f"r{snap.version + 1:08d}", n_buckets=new_n_buckets
    )
    rows, _, _, per_file = _footer_seq_stats(table, new_files)
    lineage = {
        "op": "rescale",
        "old_n_buckets": old_n,
        "new_n_buckets": new_n_buckets,
        "rows": rows,
    }
    # touched = every bucket id in EITHER numbering: old ids not in new_files
    # get emptied out, new ids get their fresh single file; the strict-replace
    # per-bucket conflict check then covers the entire table
    touched = sorted(set(range(old_n)) | set(range(new_n_buckets)))
    table.commit(
        new_files,
        touched,
        lineage,
        base_version=snap.version,
        new_file_stats=per_file,
        new_n_buckets=new_n_buckets,
    )
    return lineage
