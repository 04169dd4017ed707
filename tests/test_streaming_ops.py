"""Streaming operators beyond the CDC core: stateful progress
(applyInPandasWithState) and event-time windowed aggregation with
watermark. Streaming semantics — verified against batch ground truth
(the SQL-oracle twin covers the batch expression tree separately)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from couch_to_mongo_spark.gen import generate_changes
from couch_to_mongo_spark.sources.changes import infer_feed_schema, read_changes_stream
from couch_to_mongo_spark.streaming.stateful import conversation_progress_stream
from couch_to_mongo_spark.streaming.windows import windowed_event_stats


def test_stateful_conversation_progress(spark, tmp_path):
    changes = str(tmp_path / "changes")
    pdf = generate_changes(changes, n_events=2000, n_convs=25, seed=91, n_files=4)

    stream = read_changes_stream(
        spark, changes, infer_feed_schema(changes), max_files_per_trigger=1
    )
    q = (
        conversation_progress_stream(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one refreshed row per touched conversation per
    # micro-batch; the LAST emission per conversation is the final state
    out = spark.sql(
        "SELECT conv_id, max(n_events) n_events, max(max_seq) max_seq FROM conv_progress GROUP BY conv_id"
    ).toPandas()
    truth = (
        pdf.groupby("conv_id")
        .agg(n_events=("seq", "size"), max_seq=("seq", "max"))
        .reset_index()
    )
    m = out.sort_values("conv_id").reset_index(drop=True)
    t = truth.sort_values("conv_id").reset_index(drop=True)
    assert len(m) == len(t)
    assert (m["n_events"].values == t["n_events"].values).all()
    assert (m["max_seq"].values == t["max_seq"].values).all()


def test_stateful_exact_distinct_turns_across_batches(spark, tmp_path):
    """n_turns is the EXACT cross-batch distinct count: 8 turns arriving
    one per micro-batch (turn-disjoint split) must report n_turns=8. The
    turn-id set lives in the operator state; a running max of per-batch
    distincts would report 1 here."""
    import numpy as np

    changes = str(tmp_path / "changes")
    n = 8
    pdf = pd.DataFrame(
        {
            "seq": np.arange(n, dtype=np.int64),
            "op": ["i"] * n,
            "conv_id": ["conv-000000"] * n,
            "turn_idx": np.arange(n, dtype=np.int32),
            "_rev": [f"1-{i:08x}" for i in range(n)],
            "role": ["user"] * n,
            "text": [f"turn {i}" for i in range(n)],
            "tool": pd.array([None] * n, dtype="string"),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(range(n), unit="s"),
        }
    )
    from couch_to_mongo_spark.gen import write_change_files

    write_change_files(changes, pdf, n_files=n)
    stream = read_changes_stream(
        spark, changes, infer_feed_schema(changes), max_files_per_trigger=1
    )
    q = (
        conversation_progress_stream(stream)
        .writeStream.format("memory")
        .queryName("conv_turns_disjoint")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT max(n_turns) n_turns, count(*) n_emissions FROM conv_turns_disjoint"
    ).collect()[0]
    assert out["n_emissions"] >= 2  # the split really was multi-batch
    assert out["n_turns"] == n


def test_stateful_state_survives_restart(spark, tmp_path):
    """State lives in the checkpoint: a second run over NEW files continues
    the counts instead of restarting from zero."""
    changes = str(tmp_path / "changes")
    pdf1 = generate_changes(changes, n_events=600, n_convs=10, seed=93, n_files=2)
    out_dir = str(tmp_path / "out")

    def run(run_tag):
        # memory sink can't recover from a checkpoint; foreachBatch can —
        # the state store resumes, emissions land in per-run parquet dirs
        stream = read_changes_stream(
            spark, changes, infer_feed_schema(changes), max_files_per_trigger=1
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(f"{out_dir}/{run_tag}")

        q = (
            conversation_progress_stream(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("a")
    from couch_to_mongo_spark.gen import make_changes_df, write_change_files

    pdf2 = make_changes_df(n_events=400, n_convs=10, seed=94, seq_start=600)
    write_change_files(changes, pdf2, n_files=1, start_index=10)
    run("b")

    out = (
        spark.read.parquet(f"{out_dir}/b")
        .groupBy("conv_id")
        .agg(F.max("n_events").alias("n_events"))
        .toPandas()
    )
    both = pd.concat([pdf1, pdf2], ignore_index=True)
    truth = both.groupby("conv_id").size()
    # progress_b only re-emits conversations touched by the new files, but
    # their counts must INCLUDE the first run's events (state resumed)
    for _, r in out.iterrows():
        assert r["n_events"] == truth[r["conv_id"]]


def test_windowed_agg_stream_matches_batch_up_to_watermark(spark, tmp_path):
    changes = str(tmp_path / "changes")
    generate_changes(changes, n_events=3000, n_convs=20, seed=95, n_files=3)
    schema = infer_feed_schema(changes)

    batch_df = spark.read.schema(schema).parquet(changes + "/*.parquet")
    # the generated feed spans ~50 minutes of event time (1s per seq), so
    # 5-minute windows + a 2-minute watermark give ~10 windows, most closed
    batch = windowed_event_stats(
        batch_df.where(F.col("ts").isNotNull()), window="5 minutes", keys=[]
    ).toPandas()

    stream = read_changes_stream(spark, changes, schema, max_files_per_trigger=1)
    q = (
        windowed_event_stats(
            stream.where(F.col("ts").isNotNull()),
            window="5 minutes",
            keys=[],
            watermark="2 minutes",
        )
        .writeStream.format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts").toPandas()

    # append mode emits a window once the watermark passes it: the stream's
    # output is a PREFIX of the batch result (trailing windows still open
    # at end-of-stream are withheld) and every emitted window matches
    assert 0 < len(got) <= len(batch)
    merged = got.merge(batch, on="window_start", suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    # and it withheld only the tail: emitted windows are the earliest ones
    assert set(got["window_start"]) == set(
        batch.sort_values("window_start")["window_start"].iloc[: len(got)]
    )


def test_stream_dedup_drops_redelivered_events(spark, tmp_path):
    """At-least-once feed: the same file delivered twice (different paths)
    must yield each seq once within the watermark horizon."""
    from couch_to_mongo_spark.gen import make_changes_df, write_change_files
    from couch_to_mongo_spark.streaming.dedup_stream import dedup_stream

    changes = str(tmp_path / "changes")
    pdf = make_changes_df(n_events=500, n_convs=8, seed=97)
    write_change_files(changes, pdf, n_files=1, start_index=0)
    # redelivery: identical rows, new file -> the file source re-reads them
    write_change_files(changes, pdf, n_files=1, start_index=1)

    stream = read_changes_stream(
        spark, changes, infer_feed_schema(changes), max_files_per_trigger=1
    )
    q = (
        dedup_stream(stream, keys=["seq"], watermark="1 hour")
        .select("seq", "conv_id")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT seq, count(*) c FROM dedup_out GROUP BY seq").toPandas()
    assert len(out) == 500
    assert (out["c"] == 1).all()


def test_ivf_candidates_contain_planted_source(spark):
    """IVF ANN: a query that IS an existing vector must surface that vector
    in its candidate list once enough lists are probed."""
    import numpy as np
    from couch_to_mongo_spark.functions import vectors as V

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    qs = spark.createDataFrame(
        [(-r[0] - 1, r[1]) for r in rows[:10]], "qid: long, qv: array<double>"
    )
    cand = V.ivf_candidates(df, qs, n_centroids=8, nprobe=1)
    hits = cand.where(F.col("vec_id") == -F.col("qid") - 1).count()
    # the planted source is in the SAME list as the query (identical vector
    # -> identical assignment), so nprobe=1 already recovers all of them
    assert hits == 10


def test_session_window_stream_matches_batch(spark, tmp_path):
    """session_window: streaming emissions (closed sessions) must agree with
    the batch run of the same expression tree."""
    from couch_to_mongo_spark.streaming.windows import session_window_stats

    changes = str(tmp_path / "changes")
    generate_changes(changes, n_events=2000, n_convs=6, seed=99, n_files=3)
    schema = infer_feed_schema(changes)

    batch_df = spark.read.schema(schema).parquet(changes + "/*.parquet")
    batch = session_window_stats(
        batch_df.where(F.col("ts").isNotNull()), gap="30 seconds"
    ).toPandas()

    stream = read_changes_stream(spark, changes, schema, max_files_per_trigger=1)
    q = (
        session_window_stats(
            stream.where(F.col("ts").isNotNull()),
            gap="30 seconds",
            watermark="1 minute",
        )
        .writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_out").toPandas()

    assert 0 < len(got) <= len(batch)
    merged = got.merge(
        batch, on=["conv_id", "session_start"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["session_end_s"] == merged["session_end_b"]).all()
