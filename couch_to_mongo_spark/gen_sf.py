"""sf1 benchmark-tier generator: scale the driver's sf0.1 tables 10x.

The driver ships sf{0.001,0.01,0.1}; at sf0.1 most contract queries are
fixed-overhead-dominated (0.3-1 s), so round-over-round perf signal is
weak. This generator derives a deterministic sf1 tier (default
/dev/shm/c2m_sf1, tmpfs — regenerated on demand, never committed):

- relational/event tables are replicated ``factor``x with CONSISTENT key
  shifts (o_orderkey and l_orderkey shift together; o_custkey and
  c_custkey together; events get fresh event_id/user_id ranges), so every
  join fans out 10x without changing selectivities;
- small dimensions (region nation supplier part) and embeddings are
  copied as-is;
- ``documents`` is generated fresh rather than replicated: the sf0.1
  corpus draws ~54-word texts from a 31-word vocabulary, and replicating
  THAT 10x makes every 3-shingle's doc-frequency ~90 — the inverted-index
  self-join degenerates to ~10^8 candidate rows, which is a vocabulary
  artifact, not scale. The sf1 corpus uses a scale-appropriate vocabulary
  (derived word forms), plants 2% near-duplicate mutations (so the
  jaccard/minhash family has real positives) and a 1% boilerplate-prefix
  group whose shingles exceed the max_doc_freq=20 cap (so the capped
  query's hot-shingle guard does real work at sf1).

Pure duckdb + numpy — no Spark session, so generation cannot perturb a
concurrently measured benchmark JVM (this sandbox's #1 noise source).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

# bump when the generated content changes shape: a cached tier whose
# marker carries an older version is regenerated
GEN_VERSION = 2
TABLES_COPY = ["region", "nation", "supplier", "part"]
BASE_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "plan", "shuffle", "bucket", "seq",
]
LANGS = ["en", "de", "zh", "fr", "es"]
BOILERPLATE = (
    "standard header boilerplate notice applies to this document in full "
    "see terms"
).split()


def _vocab(n: int = 600) -> list[str]:
    out = list(BASE_VOCAB)
    i = 0
    while len(out) < n:
        w = BASE_VOCAB[i % len(BASE_VOCAB)]
        out.append(f"{w}{i // len(BASE_VOCAB)}")
        i += 1
    return out


def gen_documents(n_docs: int, seed: int = 42):
    import pandas as pd

    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    lens = rng.integers(10, 101, n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        if i % 100 == 7:  # 1%: boilerplate prefix -> hot shingles (df ~ n/100)
            words = np.concatenate([np.array(BOILERPLATE), words])
        if i % 50 == 23 and i > 50:  # 2%: near-dup mutation of an earlier doc
            src = texts[rng.integers(0, i)].split(" ")
            words = np.array(src)
            n_mut = max(1, len(words) // 10)
            pos = rng.choice(len(words), size=n_mut, replace=False)
            words[pos] = vocab[rng.integers(0, len(vocab), n_mut)]
        texts.append(" ".join(words))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)],
            "source": [f"src{i % 4}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(
    n_vecs: int,
    dim: int = 64,
    n_clusters: int = 10,
    dup_frac: float = 0.03,
    target_cos: float = 0.95,
    cluster_strength: float = 3.0,
    seed: int = 42,
):
    """Clustered embeddings with PLANTED near-duplicates — the vector-suite
    fixture the driver's sf tiers lack (their embeddings are pure noise:
    max cross-pair cosine ~0.51, so near-dup recall is unmeasurable and a
    10x copy adds no signal).

    Structure:
    - label = cluster id; member = cluster_strength * unit_center + N(0,1)
      noise per dim. cluster_strength=3.0 puts typical intra-cluster
      cosine at ~ s^2/(s^2+dim) ~= 0.12 — ABOVE noise (kmeans/IVF can
      learn the partition) but BELOW the 0.3 near-dup threshold, so dedup
      pairs stay O(planted), not O(cluster^2);
    - dup_frac of rows are near-dups of an earlier row (same cluster):
      rotated toward an orthogonalized random direction to land at EXACTLY
      ``target_cos`` cosine from the source — real positives for the
      neardup/LSH/group pipelines, with a knowable ground truth.

    Returns a pyarrow Table with the driver's embeddings schema
    (vec_id int64, embedding list<float32>, label int32).
    """
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n_vecs).astype(np.int32)
    vecs = cluster_strength * centers[labels] + rng.standard_normal((n_vecs, dim))
    n_dups = int(n_vecs * dup_frac)
    # dup targets: every 1/dup_frac-th row (deterministic spread), source a
    # strictly earlier non-dup row so chains don't form
    step = max(int(1 / dup_frac), 2)
    dup_rows = [i for i in range(step, n_vecs, step)][:n_dups]
    for i in dup_rows:
        j = int(rng.integers(0, step))  # early non-dup row
        v = vecs[j]
        g = rng.standard_normal(dim)
        g -= (g @ v) / (v @ v) * v
        vecs[i] = np.linalg.norm(v) * (
            target_cos * v / np.linalg.norm(v)
            + np.sqrt(1 - target_cos**2) * g / np.linalg.norm(g)
        )
        labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


def generate_sf(
    src_dir: str = "/root/testdata/sf0.1",
    dst_dir: str = "/dev/shm/c2m_sf1",
    factor: int = 10,
    seed: int = 42,
    force: bool = False,
) -> str:
    """Create the scaled tier at dst_dir (idempotent unless force)."""
    import duckdb

    marker = os.path.join(dst_dir, "_GENERATED")
    stamp = f"v={GEN_VERSION} factor={factor} seed={seed} src={src_dir}\n"
    if os.path.exists(marker) and not force:
        with open(marker) as fh:
            if fh.read() == stamp:
                return dst_dir
        # stale tier from an older generator version/params: regenerate
    if os.path.isdir(dst_dir):
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir)
    con = duckdb.connect()
    src = lambda t: os.path.join(src_dir, f"{t}.parquet")  # noqa: E731
    dst = lambda t: os.path.join(dst_dir, f"{t}.parquet")  # noqa: E731

    for t in TABLES_COPY:
        shutil.copyfile(src(t), dst(t))

    emax, umax = con.execute(
        f"SELECT max(event_id)+1, max(user_id)+1 FROM read_parquet('{src('events')}')"
    ).fetchone()
    omax, cmax = con.execute(
        f"SELECT max(o_orderkey)+1, max(o_custkey)+1 FROM read_parquet('{src('orders')}')"
    ).fetchone()
    rep = f"CROSS JOIN range(0, {factor}) _t(r)"
    con.execute(
        f"""COPY (SELECT event_id + r*{emax} AS event_id, ts,
                     user_id + r*{umax} AS user_id, event_type, value, props
              FROM read_parquet('{src('events')}') {rep}
              ORDER BY event_id)
            TO '{dst('events')}' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT o_orderkey + r*{omax} AS o_orderkey,
                     o_custkey + r*{cmax} AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
              FROM read_parquet('{src('orders')}') {rep})
            TO '{dst('orders')}' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT l_orderkey + r*{omax} AS l_orderkey, l_partkey,
                     l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                     l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
              FROM read_parquet('{src('lineitem')}') {rep})
            TO '{dst('lineitem')}' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT c_custkey + r*{cmax} AS c_custkey, c_name,
                     c_nationkey, c_acctbal, c_mktsegment
              FROM read_parquet('{src('customer')}') {rep})
            TO '{dst('customer')}' (FORMAT PARQUET)"""
    )

    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{src('documents')}')"
    ).fetchone()[0]
    pdf = gen_documents(n_docs * factor, seed=seed)
    pdf.to_parquet(dst("documents"), index=False)

    import pyarrow.parquet as pq

    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{src('embeddings')}')"
    ).fetchone()[0]
    pq.write_table(gen_embeddings(n_vecs * factor, seed=seed), dst("embeddings"))

    with open(marker, "w") as fh:
        fh.write(stamp)
    return dst_dir


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/dev/shm/c2m_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    print(generate_sf(args.src, args.dst, args.factor, force=args.force))
