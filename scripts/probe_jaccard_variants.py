#!/usr/bin/env python
"""r7 measurement probe: where do ngram_jaccard_pairs' 175 s go at the
driver's sf1.0, and which exact-preserving plan shape is fastest?

Variants (all EXACT — same pairs, same jaccard):
  stage_index   — build + explode + hash the shingle index only (noop)
  stage_join    — index self-join only, count(1) global agg (no pair agg)
  current       — the shipped plan (join -> groupBy(id_a,id_b) -> size joins)
  jvm_first_s   — carry s=na+nb through the join; single groupBy with first(s)
  kernel        — join -> repartition(pair) -> mapInPandas numpy run-length
                  count + raw-jaccard prefilter -> JVM exact round/filter
Run exclusively. One JVM, min of --passes.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from couch_to_mongo_spark.functions import text as X
from couch_to_mongo_spark.functions.text import hash15, tokens, shingles_from_tokens
from couch_to_mongo_spark.session import get_spark


def build_sh(df, id_col="doc_id", n=3):
    d = df.select(F.col(id_col), tokens(F.col("text")).alias("_tk"))
    return d.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens(F.col("_tk"), n))).alias("sh"),
    ).select(F.col(id_col), hash15(F.col("sh")).alias("sh"))


def build_sizes(df, id_col="doc_id", n=3):
    d = df.select(F.col(id_col), tokens(F.col("text")).alias("_tk"))
    return d.select(
        F.col(id_col),
        F.array_size(F.array_distinct(shingles_from_tokens(F.col("_tk"), n)))
        .cast("long").alias("n_sh"),
    )


def v_jvm_first_s(df, threshold=0.5):
    sh = build_sh(df)
    sizes = build_sizes(df)
    pa = sh.join(F.broadcast(sizes), "doc_id")
    a = pa.select(F.col("doc_id").alias("id_a"), "sh", F.col("n_sh").alias("na"))
    b = pa.select(F.col("doc_id").alias("id_b"), "sh", F.col("n_sh").alias("nb"))
    j = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (F.col("na") + F.col("nb")).alias("s"))
    )
    g = j.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_common"), F.first("s").alias("s")
    )
    return (
        g.withColumn(
            "jaccard", F.round(F.col("n_common") / (F.col("s") - F.col("n_common")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def _pair_count_kernel(threshold):
    def kernel(batches):
        import numpy as np
        import pandas as pd

        ia_l, ib_l, s_l = [], [], []
        for bt in batches:
            ia_l.append(bt["id_a"].to_numpy(np.int64))
            ib_l.append(bt["id_b"].to_numpy(np.int64))
            s_l.append(bt["s"].to_numpy(np.int64))
        if not ia_l:
            return
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
        s = np.concatenate(s_l)
        order = np.lexsort((ib, ia))
        ia, ib, s = ia[order], ib[order], s[order]
        new = np.empty(len(ia), dtype=bool)
        new[0] = True
        new[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
        idx = np.flatnonzero(new)
        c = np.diff(np.append(idx, len(ia)))
        ga, gb, gs = ia[idx], ib[idx], s[idx]
        jr = c / (gs - c)
        m = jr >= threshold - 1e-6
        yield pd.DataFrame(
            {"id_a": ga[m], "id_b": gb[m], "n_common": c[m], "s": gs[m]}
        )

    return kernel


def v_kernel(df, threshold=0.5):
    sh = build_sh(df)
    sizes = build_sizes(df)
    pa = sh.join(F.broadcast(sizes), "doc_id")
    a = pa.select(F.col("doc_id").alias("id_a"), "sh", F.col("n_sh").alias("na"))
    b = pa.select(F.col("doc_id").alias("id_b"), "sh", F.col("n_sh").alias("nb"))
    j = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (F.col("na") + F.col("nb")).alias("s"))
    )
    g = j.repartition("id_a", "id_b").mapInPandas(
        _pair_count_kernel(threshold),
        "id_a long, id_b long, n_common long, s long",
    )
    return (
        g.withColumn(
            "jaccard", F.round(F.col("n_common") / (F.col("s") - F.col("n_common")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--variants", default="stage_index,stage_join,jvm_first_s,kernel,current")
    args = ap.parse_args()

    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/c2m-probe", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/c2m-probe"
    spark = get_spark("probe-jaccard", extra_conf=extra)
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    variants = {
        "stage_index": lambda: noop(build_sh(docs)),
        "stage_join": lambda: noop(
            build_sh(docs).alias("a").join(build_sh(docs).alias("b"), "sh")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        ),
        "jvm_first_s": lambda: noop(v_jvm_first_s(docs)),
        "kernel": lambda: noop(v_kernel(docs)),
        "current": lambda: noop(X.ngram_jaccard_pairs(docs, n=3, threshold=0.5)),
    }
    for name in args.variants.split(","):
        walls = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            variants[name]()
            walls.append(round(time.time() - t0, 2))
        print(f"RESULT {name}: min={min(walls)} walls={walls}", flush=True)

    # parity spot check at the probe SF (exact row set equality)
    cur = sorted(tuple(r) for r in X.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect())
    for nm, fn in [("jvm_first_s", v_jvm_first_s), ("kernel", v_kernel)]:
        alt = sorted(tuple(r) for r in fn(docs).collect())
        print(f"PARITY {nm}: {'OK' if alt == cur else 'MISMATCH'} ({len(alt)} vs {len(cur)})")


if __name__ == "__main__":
    main()
