"""Time travel + snapshot expiry (tableformat maintenance)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from couch_to_mongo_spark.functions.normalize import normalize_text
from couch_to_mongo_spark.gen import make_changes_df
from couch_to_mongo_spark.operators.merge import merge_batch, read_state, with_engine_schema
from couch_to_mongo_spark.oracle import assert_state_parity, expected_state
from couch_to_mongo_spark.schemas import TRANSCRIPT_SCHEMA
from couch_to_mongo_spark.tableformat import LakeTable


@pytest.fixture()
def table_with_history(spark, tmp_path):
    pdf = make_changes_df(n_events=1200, n_convs=15, seed=61, delete_frac=0.05)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), with_engine_schema(TRANSCRIPT_SCHEMA), n_buckets=4
    )
    thirds = [pdf[pdf.seq < 400], pdf[(pdf.seq >= 400) & (pdf.seq < 800)], pdf[pdf.seq >= 800]]
    for i, part in enumerate(thirds):
        b = spark.createDataFrame(part).withColumn("text", normalize_text(F.col("text")))
        merge_batch(table, b, run_id="r", batch_id=i)
    return table, pdf, thirds


def test_time_travel_reads_each_version(spark, table_with_history):
    table, pdf, thirds = table_with_history
    assert table.latest_version() == 3
    # version 1 = state after batch 0 only
    v1 = read_state(table, version=1).toPandas()
    assert_state_parity(
        v1.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        expected_state(thirds[0]),
    )
    # latest = full fold
    assert_state_parity(read_state(table).toPandas(), expected_state(pdf))


def test_expire_snapshots_bounds_history(spark, table_with_history):
    from couch_to_mongo_spark.operators.compact import compact

    table, pdf, _ = table_with_history
    # compaction rewrites buckets -> the MOR delta files become referenced
    # only by pre-compaction snapshots
    compact(table, max_files_per_bucket=0, buckets=[int(b) for b in table.snapshot().files])
    old_delta_files = [
        os.path.join(table.path, f) for f in table.snapshot(3).all_files()
    ]
    stats = table.expire_snapshots(keep_last=1)
    assert stats["snapshots_expired"] == 4  # v0..v3 expired, v4 (compacted) kept
    assert stats["files_deleted"] > 0
    assert any(not os.path.exists(f) for f in old_delta_files)
    # latest state unaffected
    assert_state_parity(read_state(table).toPandas(), expected_state(pdf))
    latest_files = {os.path.join(table.path, f) for f in table.snapshot().all_files()}
    for f in latest_files:
        assert os.path.exists(f)


def test_expire_noop_when_single_snapshot(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), with_engine_schema(TRANSCRIPT_SCHEMA), n_buckets=2
    )
    assert table.expire_snapshots(keep_last=5)["files_deleted"] == 0


def test_timestamp_time_travel(spark, tmp_path):
    """as_of (epoch seconds) resolves to the latest commit at-or-before the
    timestamp — Iceberg's FOR SYSTEM_TIME AS OF."""
    import time

    pdf = make_changes_df(n_events=800, n_convs=10, seed=62, delete_frac=0.0)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), with_engine_schema(TRANSCRIPT_SCHEMA), n_buckets=4
    )
    halves = [pdf[pdf.seq < 400], pdf[pdf.seq >= 400]]
    merge_batch(table, spark.createDataFrame(halves[0]), run_id="r", batch_id=0,
                collect_stats=False)
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    merge_batch(table, spark.createDataFrame(halves[1]), run_id="r", batch_id=1,
                collect_stats=False)

    assert table.version_as_of(t_mid) == 1
    assert table.version_as_of(time.time()) == table.latest_version()
    mid_rows = read_state(table, version=table.version_as_of(t_mid)).count()
    v1_rows = read_state(table, version=1).count()
    assert mid_rows == v1_rows
    # direct read(as_of=...) sees only the first batch's raw rows
    assert table.read(as_of=t_mid).count() == table.read(version=1).count()
    with pytest.raises(ValueError):
        table.read(version=1, as_of=t_mid)
    # a timestamp before the table existed has no snapshot... except the
    # create() snapshot, which is treated as arbitrarily old only when
    # undated; a dated create commit raises for ts before it
    with pytest.raises(ValueError):
        table.version_as_of(0.0)
