"""Progress / counters (SURVEY.md §2.5 A2) and session introspection (A1).

The reference logs fetched-vs-in-sink counts every 5 s from AtomicLong
counters (reference: Couch.java:42-45, 200-218) and detects an unfinished
session by aggregating its metadata collection for runs whose ops lack
"end" (Mongo.java:422-466). Spark-side: a StreamingQueryListener captures
per-batch progress (rows/sec, durations) without touching the data path,
and run summaries derive from the lineage log + snapshot fence map.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event."""

    def __init__(self, out_path: str):
        self.out_path = os.path.abspath(out_path)
        os.makedirs(os.path.dirname(self.out_path), exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self._write({"event": "started", "id": str(event.id), "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._write(
            {
                "event": "progress",
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def _write(self, rec: dict[str, Any]) -> None:
        with open(self.out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


def attach_progress_recorder(spark: SparkSession, out_path: str) -> ProgressRecorder:
    rec = ProgressRecorder(out_path)
    spark.streams.addListener(rec)
    return rec


def run_summaries(lineage_pdf) -> list[dict[str, Any]]:
    """Per-run summary from the lineage log: batch span, seq span, rows.

    The analogue of the reference's session pipeline
    ($match -> $group by session -> push(ops) -> first/last time,
    Mongo.java:431-450): a run with no terminal marker is simply one whose
    checkpoint can still accept batches — with fencing, "unfinished" is
    informational, not a recovery protocol.
    """
    out = []
    if lineage_pdf.empty:
        return out
    for run_id, g in lineage_pdf.groupby("run_id"):
        out.append(
            {
                "run_id": run_id,
                "n_batches": int(len(g)),
                "batch_min": int(g["batch_id"].min()),
                "batch_max": int(g["batch_id"].max()),
                "seq_min": None if g["seq_min"].isna().all() else int(g["seq_min"].min()),
                "seq_max": None if g["seq_max"].isna().all() else int(g["seq_max"].max()),
                "rows_applied": int(g["rows_applied"].sum()),
                "first_commit": str(g["committed_at"].min()),
                "last_commit": str(g["committed_at"].max()),
            }
        )
    return sorted(out, key=lambda r: r["last_commit"], reverse=True)
