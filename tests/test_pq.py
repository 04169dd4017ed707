"""Product quantization (functions/vectors.py pq_*): plan shape,
determinism, and recall on the clustered fixture. The entry-contract suite
additionally hash-checks pq_train+pq_encode against the DuckDB Lloyd-chain
oracle (pq_train_encode)."""

from __future__ import annotations

import pytest

from couch_to_mongo_spark.functions import vectors as V
from couch_to_mongo_spark.gen import make_clustered_embeddings


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        make_clustered_embeddings(n=400, dim=64, n_clusters=8, seed=5)
    ).persist()


def test_pq_encode_is_zero_shuffle(spark, emb):
    books = V.pq_train(emb, m=4, ksub=8, n_iters=1)
    plan = (
        V.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_pq_train_is_deterministic(spark, emb):
    b1 = V.pq_train(emb, m=4, ksub=8, n_iters=2)
    b2 = V.pq_train(emb, m=4, ksub=8, n_iters=2)
    assert b1 == b2


def test_pq_refined_recall_beats_raw_and_clears_floor(spark, emb):
    """Raw ADC cannot rank inside a tight cluster (mates share codes — the
    quantization limit, honestly low on this fixture); the ADC-shortlist +
    exact-re-rank configuration must clear 0.8 recall@10."""
    raw = V.pq_recall_at_k(emb, k=10, n_queries=8)
    refined = V.pq_recall_at_k(emb, k=10, n_queries=8, refine=True)
    assert refined >= 0.8, (raw, refined)
    assert refined > raw


def test_pq_codes_are_m_small_ints(spark, emb):
    books = V.pq_train(emb, m=4, ksub=8, n_iters=1)
    codes = V.pq_encode(emb, books)
    assert [f.name for f in codes.schema.fields] == ["vec_id", "c0", "c1", "c2", "c3"]
    row = codes.orderBy("vec_id").limit(50).collect()
    assert all(0 <= r[f"c{j}"] < 8 for r in row for j in range(4))


def test_ivf_pq_topk_routes_and_refines(spark, emb):
    """Composed IVF x PQ x refine: top-k from the probed lists only, exact
    re-rank — must recover most of the exact top-k (the query's cluster is
    within the probed lists on the clustered fixture)."""
    from couch_to_mongo_spark.functions.vectors import (
        _l2sq,
        ivf_pq_topk,
        kmeans_train,
        pq_train,
    )
    from pyspark.sql import functions as F

    cents = kmeans_train(emb, k=8, n_iters=2)
    books = pq_train(emb, m=4, ksub=8)
    qrows = emb.orderBy("vec_id").limit(5).collect()
    hits = 0
    for qrow in qrows:
        qid, qv = qrow["vec_id"], [float(x) for x in qrow["embedding"]]
        exact = (
            emb.where(F.col("vec_id") != qid)
            .select(
                "vec_id",
                F.sqrt(_l2sq(F.col("embedding").cast("array<double>"), qv)).alias("d"),
            )
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        )
        truth = {r["vec_id"] for r in exact}
        got = ivf_pq_topk(
            emb.where(F.col("vec_id") != qid), qv, k=10, nprobe=2,
            centroids=cents, codebooks=books,
        ).collect()
        assert len(got) == 10
        hits += len(truth & {r["vec_id"] for r in got})
    assert hits / 50 >= 0.8, hits / 50


def test_ivf_pq_topk_gemm_route_parity(spark, emb):
    """Above the BLAS crossover the composed path must route assignment
    through the ivf_assign_blas GEMM kernel (MapInPandas in the plan) and
    return EXACTLY the default route's rows — same winner by the locked
    three-way assignment parity, so the composed output cannot differ."""
    from couch_to_mongo_spark.functions.vectors import (
        ivf_pq_topk,
        kmeans_train,
        pq_train,
    )

    cents = kmeans_train(emb, k=8, n_iters=2)
    books = pq_train(emb, m=4, ksub=8)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    base = ivf_pq_topk(emb, qv, k=10, nprobe=2, centroids=cents, codebooks=books)
    gemm = ivf_pq_topk(
        emb, qv, k=10, nprobe=2, centroids=cents, codebooks=books,
        blas_threshold=4,  # force the >threshold route at k=8
    )
    plan = gemm._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert [tuple(r) for r in base.collect()] == [tuple(r) for r in gemm.collect()]
