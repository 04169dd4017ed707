"""Change-feed source: seq-ordered change-log files (SURVEY.md §2.1 S4).

The reference tails CouchDB's ``_changes`` HTTP feed with a 5 s poll loop
(reference: ChangeFeedClient.java:61-71, 129-155). Our CDC source is a
directory of seq-ordered parquet files — the lake-native rendering of a
binlog/WAL — consumed either:

- batch: one ``spark.read`` with union-by-name schema merge (replay), or
- stream: ``spark.readStream`` file source + ``maxFilesPerTrigger``
  (the reference's poll-interval/backpressure knob, SURVEY.md §2.2 P3).

Schema inference reads parquet *footers only* via pyarrow — metadata I/O,
no data scan — so drift detection stays cheap even with 10^5 files.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark.sql.pandas.types import from_arrow_type


def _spark_type(arrow_type) -> T.DataType:
    dt = from_arrow_type(arrow_type)
    # normalize: engine uses session-TZ timestamps everywhere
    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType()
    return dt


def infer_feed_schema(changes_dir: str, sample_limit: int | None = None) -> T.StructType:
    """Union schema across all change files (footer metadata only).

    New columns appended in file order — the evolved schema lists columns
    in the order they first appeared in the feed.
    """
    files = sorted(glob.glob(os.path.join(changes_dir, "*.parquet")))
    if sample_limit:
        # footers are cheap, but allow bounding for gigantic feeds: first +
        # last K files see every evolution boundary in an append-only feed
        k = sample_limit // 2
        files = files[:k] + files[-k:] if len(files) > sample_limit else files
    fields: dict[str, T.StructField] = {}
    order: list[str] = []
    for f in files:
        sch = pq.read_schema(f)
        for name, atype in zip(sch.names, sch.types):
            if name not in fields:
                fields[name] = T.StructField(name, _spark_type(atype), True)
                order.append(name)
    if not fields:
        raise FileNotFoundError(f"no change files in {changes_dir}")
    return T.StructType([fields[n] for n in order])


def file_schema_extra_columns(path: str, known: T.StructType) -> list[str]:
    """Columns present in a change file but missing from `known` — the
    schema-drift detector used inside foreachBatch."""
    names = set(pq.read_schema(path).names)
    return sorted(names - {f.name for f in known.fields})


def read_changes_batch(
    spark: SparkSession, changes_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    if schema is None:
        schema = infer_feed_schema(changes_dir)
    return spark.read.schema(schema).parquet(os.path.join(changes_dir, "*.parquet"))


def read_changes_stream(
    spark: SparkSession,
    changes_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    # file mtime order == seq order by generator contract; latestFirst off
    return reader.load(changes_dir)
