#!/usr/bin/env python
"""Commit-metadata scaling evidence: 10,000 append commits, no Spark.

Measures what one micro-batch commit costs in METADATA bytes/time as the
table's live-file count grows — the cost that made the round-2 monolithic
snapshot format a scale-killer (O(live files) re-serialized per commit;
at 10^6 commits that's an O(B^2) cumulative driver+IO bill). With
per-bucket manifests the snapshot JSON must stay flat and per-commit
manifest bytes must track only the touched bucket.

Pure driver-side metadata ops (commit never touches data files), so the
10^4-commit replay runs in seconds and is immune to this sandbox's Spark
interference pathologies. Prints one JSON line; numbers land in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402  (types only, no JVM)

from couch_to_mongo_spark.tableformat import LakeTable  # noqa: E402

N_COMMITS = 10_000
N_BUCKETS = 64
COMPACT_EVERY = 2_000  # fold each bucket's deltas periodically, like prod


def main() -> None:
    schema = T.StructType([T.StructField("x", T.LongType())])
    base = tempfile.mkdtemp(prefix="c2m_metabench_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        table = LakeTable.create(None, os.path.join(base, "t"), schema, n_buckets=N_BUCKETS)
        snap_bytes = {}
        manifest_bytes_per_commit = []
        t0 = time.time()
        for i in range(N_COMMITS):
            b = i % N_BUCKETS
            if i > 0 and i % COMPACT_EVERY == 0:
                # rewrite-files compaction of every bucket (1 file each)
                prev = table.snapshot()
                newf = {int(k): [f"data/c{i:06d}/b{k}.parquet"] for k in prev.files}
                table.commit(
                    newf, [int(k) for k in prev.files], {"op": "compact"},
                    replaced_files=set(prev.all_files()),
                )
            rel = f"data/s{i:06d}/f.parquet"
            before = _dir_bytes(table.manifest_dir)
            snap = table.commit(
                {b: [rel]}, [b], {"op": "append", "i": i},
                run_id="bench", batch_id=i, append=True,
                new_file_stats={rel: [1000, i, i]},
            )
            manifest_bytes_per_commit.append(_dir_bytes(table.manifest_dir) - before)
            if i in (64, 1000, 5000, 9999) or i == N_COMMITS - 1:
                snap_bytes[i] = os.path.getsize(table._snap_path(snap.version))
            if i % 2500 == 0:
                table.expire_snapshots(keep_last=100, manifest_grace_seconds=0.0)
        wall = time.time() - t0
        table.expire_snapshots(keep_last=100, manifest_grace_seconds=0.0)
        n_versions_on_disk = len(table._existing_versions())
        live_files = len(table.snapshot().all_files())
        out = {
            "n_commits": N_COMMITS,
            "n_buckets": N_BUCKETS,
            "wall_sec": round(wall, 2),
            "commits_per_sec": round(N_COMMITS / wall, 1),
            "snapshot_json_bytes": snap_bytes,
            "snapshot_flat_ratio_last_vs_64": round(
                snap_bytes[N_COMMITS - 1] / snap_bytes[64], 3
            ),
            "manifest_bytes_per_commit_p50": sorted(manifest_bytes_per_commit)[
                len(manifest_bytes_per_commit) // 2
            ],
            "manifest_bytes_per_commit_max": max(manifest_bytes_per_commit),
            "live_files_at_end": live_files,
            "versions_on_disk_after_retention": n_versions_on_disk,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _dir_bytes(d: str) -> int:
    if not os.path.isdir(d):
        return 0
    return sum(e.stat().st_size for e in os.scandir(d))


if __name__ == "__main__":
    main()
