#!/usr/bin/env python
"""r7 probe 2: refine the exact-jaccard kernel plan.

Variants:
  kernel      — probe-1 winner (SMJ join -> repartition(pair) -> numpy count)
  kernel_shj  — same with SHUFFLE_HASH hint on the b side
  lists       — no pair self-join at all: posting lists (collect_list) ->
                numpy pair expansion kernel -> exchange by pair -> numpy count
All exact; parity-checked against ngram_jaccard_pairs output.
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


def _count_kernel(threshold):
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
        if len(ia) and ia.min() >= 0 and ib.max() < (1 << 31):
            p = (ia << 31) | ib
            order = np.argsort(p, kind="stable")
            p = p[order]
            s = s[order]
            new = np.empty(len(p), dtype=bool)
            new[0] = True
            new[1:] = p[1:] != p[:-1]
            idx = np.flatnonzero(new)
            c = np.diff(np.append(idx, len(p)))
            gp, gs = p[idx], s[idx]
            jr = c / (gs - c)
            m = jr >= threshold - 1e-6
            yield pd.DataFrame(
                {
                    "id_a": gp[m] >> 31,
                    "id_b": gp[m] & ((1 << 31) - 1),
                    "n_common": c[m],
                    "s": gs[m],
                }
            )
            return
        order = np.lexsort((ib, ia))
        ia, ib, s = ia[order], ib[order], s[order]
        new = np.empty(len(ia), dtype=bool)
        new[0] = True
        new[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
        idx = np.flatnonzero(new)
        c = np.diff(np.append(idx, len(ia)))
        jr = c / (s[idx] - c)
        m = jr >= threshold - 1e-6
        yield pd.DataFrame(
            {"id_a": ia[idx][m], "id_b": ib[idx][m], "n_common": c[m], "s": s[idx][m]}
        )

    return kernel


def _finish(g, threshold):
    return (
        g.withColumn(
            "jaccard", F.round(F.col("n_common") / (F.col("s") - F.col("n_common")), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def v_kernel(df, threshold=0.5, shj=False):
    sh = build_sh(df)
    sizes = build_sizes(df)
    pa = sh.join(F.broadcast(sizes), "doc_id")
    a = pa.select(F.col("doc_id").alias("id_a"), "sh", F.col("n_sh").alias("na"))
    b = pa.select(F.col("doc_id").alias("id_b"), "sh", F.col("n_sh").alias("nb"))
    if shj:
        b = b.hint("SHUFFLE_HASH")
    j = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (F.col("na") + F.col("nb")).alias("s"))
    )
    g = j.repartition("id_a", "id_b").mapInPandas(
        _count_kernel(threshold), "id_a long, id_b long, n_common long, s long"
    )
    return _finish(g, threshold)


def _expand_kernel():
    def kernel(batches):
        import numpy as np
        import pandas as pd

        for bt in batches:
            out_a, out_b, out_s = [], [], []
            for lst in bt["_m"]:
                d = len(lst)
                if d < 2:
                    continue
                arr = np.asarray(
                    [(e["doc_id"], e["n_sh"]) for e in lst], dtype=np.int64
                )
                order = np.argsort(arr[:, 0], kind="stable")
                ids = arr[order, 0]
                ns = arr[order, 1]
                iu, ju = np.triu_indices(d, k=1)
                out_a.append(ids[iu])
                out_b.append(ids[ju])
                out_s.append(ns[iu] + ns[ju])
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "s": np.concatenate(out_s),
                    }
                )

    return kernel


def v_lists(df, threshold=0.5):
    sh = build_sh(df)
    sizes = build_sizes(df)
    pa = sh.join(F.broadcast(sizes), "doc_id")
    inv = pa.groupBy("sh").agg(
        F.collect_list(F.struct("doc_id", "n_sh")).alias("_m")
    ).select("_m")
    pairs = inv.mapInPandas(_expand_kernel(), "id_a long, id_b long, s long")
    g = pairs.repartition("id_a", "id_b").mapInPandas(
        _count_kernel(threshold), "id_a long, id_b long, n_common long, s long"
    )
    return _finish(g, threshold)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--variants", default="kernel,kernel_shj,lists")
    ap.add_argument("--parity", action="store_true")
    args = ap.parse_args()

    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/c2m-probe", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/c2m-probe"
    spark = get_spark("probe-jaccard2", extra_conf=extra)
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    variants = {
        "kernel": lambda: v_kernel(docs),
        "kernel_shj": lambda: v_kernel(docs, shj=True),
        "lists": lambda: v_lists(docs),
    }
    for name in args.variants.split(","):
        walls = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"probe2:{name}")
            t0 = time.time()
            variants[name]().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        print(f"RESULT {name}: min={min(walls)} walls={walls}", flush=True)

    if args.parity:
        cur = sorted(
            tuple(r)
            for r in X.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
        )
        for nm in ("kernel_shj", "lists"):
            alt = sorted(tuple(r) for r in variants[nm]().collect())
            print(
                f"PARITY {nm}: {'OK' if alt == cur else 'MISMATCH'} "
                f"({len(alt)} vs {len(cur)})"
            )


if __name__ == "__main__":
    main()
