"""Distributed change-feed generator (Spark-side twin of gen.py).

For bench-scale feeds (10^7+ events) the pandas generator is the
bottleneck, so this builds the same feed shape with ``spark.range`` +
column expressions — fully parallel, deterministic (every value a pure
function of (seed, seq)), no wall clock (SURVEY.md §2.1 S9).

Shape parity with gen.make_changes_df: hot conversation holding
~hot_frac of events, per-key rev chains ``N-<md5>``, ~delete_frac deletes,
messy multi-hundred-char transcript text for the normalizer. Values are
not byte-identical to gen.py (different RNG), which is fine: parity tests
use gen.py; this feeds benchmarks and large-scale smoke runs.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _rng(col, salt: str, seed: int):
    """Deterministic uniform [0,1) from a column + salt."""
    return (
        F.pmod(F.xxhash64(F.concat(F.lit(f"{seed}:{salt}:"), col.cast("string"))), F.lit(1_000_000))
        / 1_000_000.0
    )


def spark_changes_df(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 10_000,
    seed: int = 42,
    hot_frac: float = 0.2,
    delete_frac: float = 0.02,
    max_turns: int = 40,
    text_len: int = 240,
) -> DataFrame:
    df = spark.range(n_events).withColumnRenamed("id", "seq")
    s = F.col("seq")
    hot = _rng(s, "hot", seed) < hot_frac
    conv_num = F.when(hot, F.lit(0)).otherwise(
        (F.pmod(F.xxhash64(F.concat(F.lit(f"{seed}:conv:"), s.cast("string"))), F.lit(max(n_convs - 1, 1))) + 1)
    )
    df = df.withColumn(
        "conv_id", F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 6, "0"))
    ).withColumn(
        "turn_idx",
        F.pmod(F.xxhash64(F.concat(F.lit(f"{seed}:turn:"), s.cast("string"))), F.lit(max_turns)).cast("int"),
    )

    # pseudo rev generation (hash-derived, shuffle-free): LWW ordering is
    # dominated by the globally-unique seq, so chain positions need not be
    # exact here — gen.py (pandas) keeps true chains for parity tests
    df = df.withColumn(
        "rev_gen",
        (F.pmod(F.xxhash64(F.concat(F.lit(f"{seed}:gen:"), s.cast("string"))), F.lit(5)) + 1).cast("int"),
    )

    is_del = (F.col("rev_gen") > 1) & (_rng(s, "op", seed) < delete_frac)
    df = df.withColumn(
        "op", F.when(F.col("rev_gen") == 1, F.lit("i")).when(is_del, F.lit("d")).otherwise(F.lit("u"))
    )
    df = df.withColumn(
        "_rev",
        F.concat(
            F.col("rev_gen").cast("string"),
            F.lit("-"),
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), "conv_id", "turn_idx", "rev_gen")), 1, 8
            ),
        ),
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")),
        (F.col("turn_idx") % 4 + 1).cast("int"),
    )
    # messy text, repeated to ~text_len chars, with tabs/double spaces for
    # the normalizer to chew on
    frag = F.concat(
        F.lit("turn  text\twith  mess "),
        F.col("conv_id"),
        F.lit(" t"),
        F.col("turn_idx").cast("string"),
        F.lit(" r"),
        F.col("rev_gen").cast("string"),
        F.lit(" s"),
        F.pmod(s, F.lit(997)).cast("string"),
        F.lit("  "),
    )
    reps = max(math.ceil(text_len / 48), 1)
    text = F.substring(F.repeat(frag, reps), 1, text_len)
    deleted = F.col("op") == "d"
    df = (
        df.withColumn("role", F.when(deleted, F.lit(None)).otherwise(role))
        .withColumn("text", F.when(deleted, F.lit(None)).otherwise(text))
        .withColumn(
            "tool",
            F.when(deleted | (role != "tool"), F.lit(None)).otherwise(F.lit("search")),
        )
        .withColumn(
            "ts",
            F.when(deleted, F.lit(None).cast("timestamp")).otherwise(
                F.timestamp_seconds(F.lit(1704067200) + s)
            ),
        )
    )
    return df.select(
        "seq", "op", "conv_id", "turn_idx", "_rev", "role", "text", "tool", "ts"
    )


def write_spark_changes(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_files: int = 16,
    **kw,
) -> None:
    """Write the feed as seq-range files (mtime-ordered for the stream)."""
    df = spark_changes_df(spark, n_events, **kw)
    (
        df.repartitionByRange(n_files, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    # monotone mtimes by min-seq order so file-source pickup ~ seq order
    import pyarrow.parquet as pq

    files = [
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    ]
    def min_seq(p):
        md = pq.read_metadata(p)
        st = md.row_group(0).column(0).statistics
        return st.min if st is not None else 0

    for i, p in enumerate(sorted(files, key=min_seq)):
        t = 1700000000 + i
        os.utime(p, (t, t))
