"""submit_main operational subcommands added with the round-3 surface:
rescale (atomic bucket re-key) and changes (fence-aware CDF read)."""

from __future__ import annotations

import json

import submit_main
from couch_to_mongo_spark.gen import generate_changes
from couch_to_mongo_spark.streaming.cdc import CdcPipeline


def test_rescale_and_changes_cli(spark, tmp_path, capsys):
    generate_changes(
        str(tmp_path / "changes"), n_events=800, n_convs=10, seed=71, n_files=2
    )
    pipe = CdcPipeline(
        spark,
        table_path=str(tmp_path / "table"),
        changes_dir=str(tmp_path / "changes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        max_files_per_trigger=1,
        emit_cdf=True,
    ).run_available()

    submit_main.main(["changes", "--table", pipe.table_path, "--limit", "5"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert all("_change_type" in l for l in lines)

    submit_main.main(["rescale", "--table", pipe.table_path, "--n-buckets", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_n_buckets"] == 8 and out["op"] == "rescale"

    submit_main.main(["state", "--table", pipe.table_path])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["live_rows"] > 0

    submit_main.main(["state", "--table", pipe.table_path, "--buckets"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    b = st["buckets"]
    assert sum(b["files_per_bucket"].values()) == st["n_files"]
    assert b["max_files_in_bucket"] >= 1
    assert b["manifest_bytes"] > 0 and b["n_manifests"] >= 1
