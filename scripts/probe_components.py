#!/usr/bin/env python
"""r7 probe: isolate the connected-components fixpoint cost on the driver
sf1.0 embedding pair graph (150k edges at threshold 0.3). Prints per-phase
walls and the round count."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from couch_to_mongo_spark.functions import vectors as V
from couch_to_mongo_spark.operators import components as C
from couch_to_mongo_spark.session import get_spark


def main():
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/c2m-probe", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/c2m-probe"
    spark = get_spark("probe-components", extra_conf=extra)
    emb = spark.read.parquet("/root/testdata/sf1.0/embeddings.parquet")

    t0 = time.time()
    pairs = V.neardup_pairs_by_label_blas(emb, threshold=0.3)
    edges = C._canon(pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")))
    edges = edges.localCheckpoint(eager=True)
    n = edges.count()
    print(f"pairs+canon+checkpoint: {time.time()-t0:.2f}s  edges={n}", flush=True)

    # instrumented fixpoint (mirror of connected_components)
    sig = C._signature(edges)
    t_all = time.time()
    for rnd in range(25):
        t1 = time.time()
        stepped = C._canon(C._small_star(C._large_star(edges)))
        stepped = stepped.localCheckpoint(eager=True)
        t2 = time.time()
        new_sig = C._signature(stepped)
        t3 = time.time()
        converged = False
        if new_sig == sig:
            converged = stepped.exceptAll(edges).isEmpty()
        t4 = time.time()
        print(
            f"round {rnd}: step+ckpt={t2-t1:.2f}s sig={t3-t2:.2f}s "
            f"conv={t4-t3:.2f}s edges={new_sig[0]}", flush=True,
        )
        edges.unpersist()
        edges = stepped
        if converged:
            break
        sig = new_sig
    print(f"fixpoint total: {time.time()-t_all:.2f}s rounds={rnd+1}", flush=True)

    t5 = time.time()
    members = edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    roots = edges.select(F.col("a").alias("a"), F.col("a").alias("b")).distinct()
    comp = (
        members.union(roots).distinct()
        .select(F.col("a").alias("id"), F.col("b").alias("component"))
    )
    out = C.attach_components(emb, comp, id_col="vec_id", out_col="group_id")
    out.write.format("noop").mode("overwrite").save()
    print(f"attach+noop: {time.time()-t5:.2f}s", flush=True)


if __name__ == "__main__":
    main()
