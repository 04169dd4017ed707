"""JSON change source + quarantine (C2/E3/F3) and progress/run summaries (A1/A2)."""

from __future__ import annotations

import json
import os

import pandas as pd

from couch_to_mongo_spark.gen import make_changes_df
from couch_to_mongo_spark.sources.json_changes import (
    DeadLetterLog,
    read_json_changes_batch,
)


def write_jsonl_feed(tmp_path, pdf: pd.DataFrame, poison: int = 5):
    lines = []
    for _, r in pdf.iterrows():
        d = {k: (None if pd.isna(v) else v) for k, v in r.items()}
        if d.get("ts") is not None:
            d["ts"] = str(d["ts"])
        lines.append(json.dumps(d))
    # inject poison: malformed json + seq-less entries
    for i in range(poison):
        lines.insert(i * 7, '{"seq": broken json %d' % i)
        lines.insert(i * 11, json.dumps({"op": "u", "conv_id": "x", "turn_idx": 1}))
    p = tmp_path / "changes-00000.jsonl"
    p.write_text("\n".join(lines))
    return str(tmp_path)


def test_json_parse_and_quarantine(spark, tmp_path):
    pdf = make_changes_df(n_events=500, n_convs=10, seed=51)
    feed = write_jsonl_feed(tmp_path, pdf, poison=4)
    good, dead = read_json_changes_batch(spark, feed)
    assert good.count() == 500
    bad = dead.toPandas()
    assert len(bad) == 8
    assert set(bad["reason"]) == {"malformed_json", "missing_seq"}
    # good rows parse to the right types
    row = good.orderBy("seq").first()
    assert row.seq == 0 and isinstance(row.turn_idx, int)

    dl = DeadLetterLog(os.path.join(str(tmp_path), "dead"))
    assert dl.append(dead, run_id="r", batch_id=0) == 8
    assert dl.read(spark).count() == 8


def test_progress_listener_and_run_summaries(spark, tmp_path):
    from couch_to_mongo_spark.gen import generate_changes
    from couch_to_mongo_spark.streaming.cdc import CdcPipeline
    from couch_to_mongo_spark.streaming.progress import (
        attach_progress_recorder,
        run_summaries,
    )

    generate_changes(str(tmp_path / "changes"), n_events=1500, n_convs=20, seed=53, n_files=3)
    prog_path = str(tmp_path / "progress.jsonl")
    rec = attach_progress_recorder(spark, prog_path)
    try:
        pipe = CdcPipeline(
            spark,
            table_path=str(tmp_path / "tbl"),
            changes_dir=str(tmp_path / "changes"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            n_buckets=4,
            max_files_per_trigger=1,
        ).run_available()
    finally:
        spark.streams.removeListener(rec)

    # listener delivery is async: the final progress event can land after
    # awaitTermination returns — poll until all batches are reported
    import time

    events = []
    for _ in range(40):
        events = [json.loads(l) for l in open(prog_path)]
        n_prog = len({e["batchId"] for e in events if e["event"] == "progress"})
        if n_prog >= pipe.batches_applied:
            break
        time.sleep(0.5)
    kinds = {e["event"] for e in events}
    assert {"started", "progress"} <= kinds
    # numInputRows counts every source scan inside the batch (the apply
    # pipeline legitimately reads the micro-batch more than once when
    # collecting stats), so per batch it's a multiple of the file's 500
    by_batch = {}
    for e in events:
        if e["event"] == "progress":
            by_batch[e["batchId"]] = max(by_batch.get(e["batchId"], 0), e["numInputRows"])
    # batch grouping varies with file-listing timing; anchor to the
    # pipeline's own batch count instead of a fixed number
    assert len(by_batch) == pipe.batches_applied
    assert all(v >= 500 and v % 500 == 0 for v in by_batch.values()), by_batch

    summ = run_summaries(pipe.lineage.read_pandas())
    assert len(summ) == 1
    s = summ[0]
    assert s["n_batches"] == pipe.batches_applied
    assert s["seq_min"] == 0 and s["seq_max"] == 1499
