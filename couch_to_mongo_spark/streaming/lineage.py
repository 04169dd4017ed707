"""Per-batch lineage / metrics log (SURVEY.md §2.1 S7, FIXTURES.md §4).

Reference analogue: the `migration.metadata` collection — per-batch audit
docs with time, threadId, inserted/upserted ids and per-doc sequence
numbers (reference: Mongo.java:524-593), written fire-and-forget
(WriteConcern 0, Mongo.java:314). Our rendering: an append-only parquet
directory next to the table; one tiny file per micro-batch, written by the
driver after the snapshot commit (audit only — correctness lives in the
snapshot log, so a lost lineage row can't corrupt state, matching the
reference's WC-0 semantics).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LINEAGE_COLUMNS = [
    "run_id",
    "batch_id",
    "seq_min",
    "seq_max",
    "rows_applied",
    "n_inserts",
    "n_updates",
    "n_deletes",
    "snapshot_id",
    "partition_stats",
    "committed_at",
]


class LineageLog:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def append(
        self,
        run_id: str,
        batch_id: int,
        *,
        seq_min: int | None,
        seq_max: int | None,
        rows_applied: int,
        n_inserts: int = 0,
        n_updates: int = 0,
        n_deletes: int = 0,
        snapshot_id: int | None = None,
        partition_stats: dict[str, Any] | None = None,
    ) -> str:
        row = {
            "run_id": run_id,
            "batch_id": int(batch_id),
            "seq_min": seq_min,
            "seq_max": seq_max,
            "rows_applied": int(rows_applied),
            "n_inserts": int(n_inserts),
            "n_updates": int(n_updates),
            "n_deletes": int(n_deletes),
            "snapshot_id": snapshot_id,
            "partition_stats": json.dumps(partition_stats or {}),
            # audit timestamp — NOT in the data path (determinism lives there)
            "committed_at": pd.Timestamp.utcnow().tz_localize(None),
        }
        pdf = pd.DataFrame([row])[LINEAGE_COLUMNS]
        name = f"lineage-{run_id}-{batch_id:08d}-{uuid.uuid4().hex[:6]}.parquet"
        p = os.path.join(self.path, name)
        pdf.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        return p

    def has(self, run_id: str, batch_id: int) -> bool:
        """Fast existence probe by filename (no data read)."""
        import glob

        return bool(
            glob.glob(os.path.join(self.path, f"lineage-{run_id}-{batch_id:08d}-*.parquet"))
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "*.parquet"))

    def read_pandas(self) -> pd.DataFrame:
        import glob

        files = sorted(glob.glob(os.path.join(self.path, "*.parquet")))
        if not files:
            return pd.DataFrame(columns=LINEAGE_COLUMNS)
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def last_seq(self) -> int | None:
        """Latest applied source seq — the reference's getLastSequenceNumber
        checkpoint lookup (Mongo.java:358-374), as max over lineage."""
        pdf = self.read_pandas()
        if pdf.empty or pdf["seq_max"].isna().all():
            return None
        return int(pdf["seq_max"].max())
