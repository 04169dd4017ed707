"""Conversation-assembly and turn-boilerplate operators
(functions/transcripts.py): ordering, role tagging, the C4 distinct-conv
rule, and partitioning independence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from couch_to_mongo_spark.functions.transcripts import (
    render_conversations,
    turn_boilerplate,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_render_orders_by_turn_idx_regardless_of_input_order(spark):
    df = _turns(
        spark,
        [
            ("c1", 2, "user", "third"),
            ("c1", 0, "user", "first"),
            ("c1", 1, "assistant", "second"),
            ("c2", 0, "user", "solo"),
        ],
    )
    out = {
        r["conv_id"]: r
        for r in render_conversations(df).collect()
    }
    assert out["c1"]["doc"] == "first\nsecond\nthird"
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["n_chars"] == len("first\nsecond\nthird")
    assert out["c2"]["doc"] == "solo"
    assert out["c2"]["n_turns"] == 1


def test_render_role_tags_and_custom_sep(spark):
    df = _turns(
        spark,
        [("c1", 0, "user", "hi"), ("c1", 1, "assistant", "hello")],
    )
    out = render_conversations(df, role_col="role", sep=" | ").collect()[0]
    assert out["doc"] == "user: hi | assistant: hello"


def test_render_partitioning_independent(spark):
    rows = [
        (f"c{i % 7}", i // 7, "user", f"t{i}") for i in range(200)
    ]
    df = _turns(spark, rows)
    a = sorted(
        (r["conv_id"], r["doc"]) for r in render_conversations(df).collect()
    )
    b = sorted(
        (r["conv_id"], r["doc"])
        for r in render_conversations(df.repartition(13)).collect()
    )
    assert a == b


def test_boilerplate_counts_distinct_convs_not_occurrences(spark):
    df = _turns(
        spark,
        [
            # "hello" in 3 distinct convs (c1 twice — counts once)
            ("c1", 0, "user", "hello"),
            ("c1", 5, "user", "hello"),
            ("c2", 0, "user", "hello"),
            ("c3", 0, "user", "hello"),
            # "unique" in 1 conv
            ("c1", 1, "user", "unique"),
            # "pair" in exactly 2 convs — below the threshold
            ("c2", 1, "user", "pair"),
            ("c3", 1, "user", "pair"),
        ],
    )
    out = turn_boilerplate(df, min_convs=3).collect()
    assert len(out) == 7  # one verdict row per input turn
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    assert by_key[("c1", 0)]["n_convs"] == 3
    assert by_key[("c1", 0)]["keep"] is False  # at threshold -> boilerplate
    assert by_key[("c1", 5)]["keep"] is False
    assert by_key[("c1", 1)]["n_convs"] == 1
    assert by_key[("c1", 1)]["keep"] is True
    assert by_key[("c2", 1)]["n_convs"] == 2
    assert by_key[("c2", 1)]["keep"] is True


def test_boilerplate_threshold_edge(spark):
    df = _turns(
        spark,
        [("c1", 0, "user", "x"), ("c2", 0, "user", "x")],
    )
    # min_convs=2: n_convs == 2 is NOT < 2 -> dropped
    out = turn_boilerplate(df, min_convs=2).collect()
    assert all(r["keep"] is False for r in out)
    # min_convs=3: 2 < 3 -> kept
    out = turn_boilerplate(df, min_convs=3).collect()
    assert all(r["keep"] is True for r in out)
