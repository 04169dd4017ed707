"""Last-writer-wins dedup — the engine's correctness kernel (SURVEY.md §2.5 A4).

The reference coalesces many changes to one doc within a poll into one id
(Set) and re-fetches the winning revision — last-writer-wins per key per
batch (reference: ChangeFeedClient.java:136-150, 104-113). Our rendering:
one row per ``(conv_id, turn_idx)`` ordered by ``(seq, rev generation,
rev hash)`` descending.

Three implementations, all deterministic and equivalent:

- :func:`lww_dedup` — ``max_by(struct(payload), struct(order))`` hash
  aggregation. **The default.** Spark's hash aggregate does map-side
  partial aggregation, so a hot conversation (millions of updates to one
  key) is combined per input partition *before* the shuffle — skew is
  defused for free, O(distinct keys) shuffle volume.
- :func:`salted_lww` — explicit two-phase salted aggregation (north_rule's
  "salted-hash repartition on conv_id"): phase 1 reduces per
  ``(key, salt)``, phase 2 per key. Same result; the explicit form for
  when partial aggregation is disabled or the reducer isn't algebraic.
- :func:`lww_dedup_window` — ``row_number() over (partition by key order
  by ...desc) = 1``. Readable, but shuffles every duplicate row to one
  partition per key — kept for small-data parity tests and as the oracle
  shape (DuckDB window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rev_gen(df: DataFrame, rev_col: str = "_rev", out_col: str = "rev_gen") -> DataFrame:
    """Parse CouchDB-style ``N-hash`` revision into its integer generation.

    Reference delegates conflict resolution to CouchDB and reads the winner
    (SURVEY.md §2.9 C4); we make the ordering explicit: generation then hash.
    """
    return df.withColumn(
        out_col,
        F.coalesce(F.split(F.col(rev_col), "-").getItem(0).cast("long"), F.lit(0)),
    )


def _order_struct(order_cols: list[str]):
    return F.struct(*[F.col(c) for c in order_cols])


def lww_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """One row per key: the row with the max ``order_cols`` tuple.

    ``max_by(struct(<all cols>), struct(<order cols>))`` — structs compare
    lexicographically field-by-field, so the ordering is total as long as
    ``order_cols`` ends in a tiebreaker (we use seq, rev_gen, _rev; seq is
    globally unique so ties cannot occur in practice).
    """
    payload = [c for c in df.columns]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload).alias("_p"), _order_struct(order_cols)).alias("_w")
    )
    return agg.select(*[F.col(f"_w.{c}").alias(c) for c in payload])


def salted_lww(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    n_salts: int = 32,
    salt_col: str = "seq",
) -> DataFrame:
    """Explicit two-phase salted LWW reduction.

    Phase 1: repartition on ``(key, salt)`` with ``salt = pmod(xxhash64(
    salt_col), n_salts)`` and reduce; phase 2: reduce the ≤n_salts
    survivors per key. Bounds any single reducer's input at
    ``rows(key)/n_salts`` — the explicit skew defense the north_rule names.
    """
    payload = [c for c in df.columns]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    phase1 = (
        salted.repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
        .groupBy(*key_cols, "_salt")
        .agg(F.max_by(F.struct(*payload), _order_struct(order_cols)).alias("_w"))
        .select(*key_cols, "_w")
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        F.max_by(F.col("_w"), F.struct(*[F.col(f"_w.{c}") for c in order_cols])).alias("_w")
    )
    return phase2.select(*[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_dedup_join(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Throughput LWW kernel: hash-agg the winning order tuple per key
    (small rows: keys + order only), then join back to fetch payloads.

    ~4x faster than :func:`lww_dedup` on wide rows: ``max_by``'s aggregation
    buffer carries the whole payload struct, forcing a SortAggregate that
    per-partition-sorts and shuffles full rows; here the aggregate touches
    only (keys, order) and the payload moves through exactly one join
    shuffle, hash-joinable under AQE.

    Caveat: rows whose order tuple ties the per-key max ALL survive — ties
    require byte-identical duplicate events (seq is globally unique), which
    the MOR read path collapses anyway. Use :func:`lww_dedup` where exact
    one-row-per-key output matters pre-write.
    """
    ostruct = _order_struct(order_cols)
    wins = df.groupBy(*key_cols).agg(F.max(ostruct).alias("__w"))
    return (
        df.join(wins, key_cols)
        .where(ostruct == F.col("__w"))
        .drop("__w")
    )


def lww_dedup_window(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Window-based LWW: row_number()==1 per key under descending order."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

def bucket_partitioned_lww(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    n_buckets: int,
    files_per_bucket: int = 1,
    bucket_key: str | None = None,
) -> DataFrame:
    """Single-shuffle LWW for the MOR fast path: repartition by
    ``(bucket[, salt])`` FIRST, then dedup with a window whose partitionBy
    is a superset of the partition keys — Catalyst plans the window with
    NO further exchange (Sort + WindowGroupLimit prune losers in place),
    and a bucket-partitioned write downstream streams straight out of the
    same partitions. Exactly one full-payload shuffle end to end
    (plan-asserted: tests/test_plans.py::test_fast_merge_single_shuffle).

    ``files_per_bucket > 1`` adds a key-derived salt column to the
    partitioning (a real column, not a literal — literals break Catalyst's
    partitioning-subset detection) so hot buckets split across writers
    while each key's rows stay co-located. The salt hash is seeded
    independently of the bucket hash (extra literal column in xxhash64):
    ``pmod(h, n_buckets)`` and ``pmod(h, files_per_bucket)`` of the SAME h
    are congruent whenever files_per_bucket divides n_buckets, which would
    make the salt constant within a bucket and leave hot buckets unsplit.

    Returns the deduped frame WITH the transient ``_bucket`` (and
    ``_salt``) columns still attached.
    """
    from couch_to_mongo_spark.tableformat import BUCKET_COL, bucket_expr

    bucket_key = bucket_key or key_cols[0]
    n_parts = n_buckets * max(files_per_bucket, 1)
    b = df.withColumn(BUCKET_COL, bucket_expr(bucket_key, n_buckets))
    part_cols = [BUCKET_COL]
    if files_per_bucket > 1:
        b = b.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.col(bucket_key), F.lit(1)), F.lit(files_per_bucket)
            ).cast("int"),
        )
        part_cols.append("_salt")
    b = b.repartition(n_parts, *[F.col(c) for c in part_cols])
    w = Window.partitionBy(*part_cols, *key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
