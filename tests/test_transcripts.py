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


def test_render_max_turns_truncation(spark):
    rows = [("c1", i, "user", f"t{i}") for i in range(10)] + [
        ("c2", 0, "user", "short")
    ]
    df = _turns(spark, rows)
    last = {
        r["conv_id"]: r
        for r in render_conversations(df, max_turns=3, keep="last").collect()
    }
    assert last["c1"]["doc"] == "t7\nt8\nt9"
    assert last["c1"]["n_turns"] == 3  # rendered count, not raw
    assert last["c2"]["doc"] == "short"  # shorter than the window: intact
    first = {
        r["conv_id"]: r
        for r in render_conversations(df, max_turns=3, keep="first").collect()
    }
    assert first["c1"]["doc"] == "t0\nt1\nt2"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        render_conversations(df, max_turns=3, keep="middle")


def test_conversation_pack_contract_invariants(spark):
    """The composed fold->render->pack entry: every sequence except each
    shard's last is exactly seq_len tokens, offsets tile gaplessly."""
    import __spark_entry__ as E

    out = E.q_conversation_pack(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    g = out.groupby(["shard", "seq_id"])["n_toks"].sum().reset_index()
    for shard, grp in g.groupby("shard"):
        grp = grp.sort_values("seq_id")
        assert (grp["n_toks"].iloc[:-1] == E.CONV_PACK_SEQ_LEN).all()
        assert grp["n_toks"].iloc[-1] <= E.CONV_PACK_SEQ_LEN


def test_render_null_role_and_text_keep_the_turn(spark):
    """array_join drops null elements — a null role or text must degrade
    to the non-null parts, never silently lose the turn."""
    df = spark.createDataFrame(
        [("c1", 0, None, "hi"), ("c1", 1, "assistant", None), ("c1", 2, "user", "bye")],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = render_conversations(df, role_col="role").collect()[0]
    assert out["n_turns"] == 3
    assert out["doc"] == "hi\nassistant: \nuser: bye"


def test_boilerplate_null_text_not_dropped(spark):
    """A null-text turn must still get a verdict (null == empty for the
    rule); a NULL md5 join key would silently drop it."""
    df = spark.createDataFrame(
        [("c1", 0, "user", None), ("c2", 0, "user", ""), ("c3", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = turn_boilerplate(df, min_convs=3).collect()
    assert len(out) == 3
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # null and empty text share a bucket: 2 distinct convs
    assert by_key[("c1", 0)]["n_convs"] == 2
    assert by_key[("c2", 0)]["n_convs"] == 2
    assert by_key[("c3", 0)]["n_convs"] == 1


def test_render_tool_tags(spark):
    """tool_col marks tool-call turns 'role [tool]: text'; null tool is a
    plain turn; null role still keeps the tool tag."""
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", None, "run it"),
            ("c1", 1, "assistant", "bash", "ls -la"),
            ("c1", 2, None, "bash", "output"),
        ],
        "conv_id string, turn_idx int, role string, tool string, text string",
    )
    out = render_conversations(df, role_col="role", tool_col="tool").collect()[0]
    assert out["doc"] == "user: run it\nassistant [bash]: ls -la\n[bash]: output"
    # tool-only tagging
    out2 = render_conversations(df, tool_col="tool").collect()[0]
    assert out2["doc"] == "run it\n[bash]: ls -la\n[bash]: output"


def test_conversation_dedup_groups_planted(spark):
    """Conversation-granularity dedup: two conversations with identical
    rendered content (different ids) group together with the min id as
    keeper; a distinct conversation stays its own group."""
    from couch_to_mongo_spark.functions.text import lsh_dedup_groups
    from couch_to_mongo_spark.functions.transcripts import render_conversations
    from pyspark.sql import functions as F

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "pack my box with five dozen liquor jugs before the long winter night",
        "how vexingly quick daft zebras jump over the fence in the bright morning",
    ]
    rows = []
    for conv in ("conv-a", "conv-b"):  # identical content, different ids
        rows += [(conv, t, base[t]) for t in range(3)]
    zalt = [
        "completely unrelated discussion about database snapshot retention policies",
        "merge semantics and fencing guarantee exactly once application of batches",
        "columnar storage formats keep statistics per file for scan pruning purposes",
    ]
    rows += [("conv-z", t, zalt[t]) for t in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    rendered = render_conversations(df)
    groups = lsh_dedup_groups(
        rendered, text_col="doc", id_col="conv_id",
        k=8, bands=4, n=3, threshold=0.5, max_bucket_size=50,
    )
    got = {r["conv_id"]: r["group_id"] for r in groups.collect()}
    assert got["conv-a"] == "conv-a" and got["conv-b"] == "conv-a"
    assert got["conv-z"] == "conv-z"
