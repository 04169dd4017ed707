"""Text-analysis operators for training-data pipelines.

All JVM-side Column expressions (whole-stage codegen; no Python in the hot
path). Cross-engine determinism contract: the numeric hash is
``int(md5_hex[:15], 16)`` — identical in Spark (``conv(substr(md5,1,15),
16,10)``) and DuckDB (``cast('0x'||substr(md5,1,15) as bigint)``) — so
every operator here has an exact DuckDB oracle in ``__spark_entry__``.

Operators (beyond the reference, per the training-data mandate):
- exact dedup (hash-groupBy), n-gram shingles, MinHash signatures +
  LSH band buckets, SimHash, n-gram Jaccard candidate pairs
- language-ID heuristic, quality scoring, token counting, fingerprinting
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
NORM_STRIP_RE = r"[^a-z0-9 ]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def hash15(col: Column) -> Column:
    """Deterministic 60-bit integer hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def norm_text(col: Column) -> Column:
    """lower + strip non-alnum + collapse/trim whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), NORM_STRIP_RE, ""), TOKEN_SPLIT_RE, " "
        )
    )


def tokens(col: Column) -> Column:
    return F.split(norm_text(col), " ")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the normalized token stream —
    whitespace/punctuation/case-insensitive content identity."""
    return F.md5(norm_text(col))


def shingles(col: Column, n: int = 3) -> Column:
    """n-token shingles as strings (space-joined windows)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def minhash_signature(col: Column, k: int = 8) -> list[Column]:
    """k MinHash values: min over shingles of hash15(perm_id || shingle)."""
    sh = shingles(col)
    return [
        F.array_min(
            F.transform(sh, lambda s: hash15(F.concat(F.lit(f"p{i}:"), s)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]


def simhash16(col: Column) -> Column:
    """16-bit SimHash over tokens: per bit, majority vote of token-hash bits.

    Bit loop unrolled in Python (shift amounts must be literals); the 16
    per-bit votes are independent `aggregate` expressions over the same
    token array — all inside one codegen'd projection.
    """
    toks = tokens(col)

    def vote(b: int) -> Column:
        return F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda a, t: a
            + F.when(
                F.shiftright(hash15(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    total = F.lit(0).cast("long")
    for b in range(16):
        total = total + F.when(vote(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total


def simhash16_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", out_col: str = "simhash"
) -> DataFrame:
    """SimHash, relational shape: explode tokens → one conditional-sum per
    bit in a single hash aggregation (primitive buffers, codegen'd) —
    the scale path; :func:`simhash16` (scalar expression) evaluates the
    16 per-bit array-aggregates interpretively."""
    ex = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    ex = ex.select(F.col(id_col), hash15(F.col("_t")).alias("_h"))
    votes = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(16)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(16):
        sim = sim + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), sim.alias(out_col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content fingerprint: keeper = min id.
    Hash-groupBy — one shuffle on the 128-bit fingerprint, skew-free."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def minhash_signature_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """MinHash signatures, relational shape: explode shingles → k hash
    columns → hash-aggregate mins per doc.

    Preferred over :func:`minhash_signature` beyond toy inputs: nested
    higher-order-function expressions (k × transform over shingles, each
    rebuilding the shingle array) fall out of whole-stage codegen and
    evaluate interpretively (~200ms/row); the explode shape computes
    shingles once, keeps every hash in codegen, and aggregates with
    primitive-buffer min() — linear and shuffle-light (k longs per doc).
    """
    ex = df.select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("_sh"))
    hashed = ex.select(
        F.col(id_col),
        *[
            hash15(F.concat(F.lit(f"p{i}:"), F.col("_sh"))).alias(f"_h{i}")
            for i in range(k)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"mh{i}") for i in range(k)]
    )


def lsh_band_buckets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, bands: int = 4
) -> DataFrame:
    """MinHash-LSH: signature split into bands; bucket id = hash of band.
    Docs sharing any band bucket are near-dup candidates (bucket-join scale
    path: candidates ∝ collisions, never all-pairs)."""
    rows_per_band = k // bands
    sig = minhash_signature_df(df, text_col, id_col, k)
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    sig = sig.select(F.col(id_col), *band_cols)
    stacked = sig.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("bucket"),
    )
    return stacked


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard >= threshold.

    Inverted-index plan: explode distinct shingles -> self-join on shingle
    (co-occurrence counts |A∩B|) -> join per-doc sizes -> Jaccard. Shuffle
    is on shingle (fine-grained; hot shingles are the skew risk — bounded
    because shingles are near-unique at n>=3)."""
    sh = (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / digit features + composite score."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_digit / n_chars, 6).alias("digit_ratio"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(
            F.least(n_tok / F.lit(100.0), F.lit(1.0)) * (1 - n_punct / n_chars),
            6,
        ).alias("quality_score"),
    )


LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic; deterministic tie-break by fixed
    language order (en > de > fr > es > unknown)."""
    toks = tokens(F.col(text_col))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    pred = F.lit("unknown")
    # build reversed so earlier langs win ties via > (strict) chain
    best = F.lit(-1)
    for lang in ["es", "fr", "de", "en"]:
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(scores[lang], best)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
    )
    # recompute pred via CASE on the materialized scores (keeps the SQL
    # oracle expression identical): en wins ties, then de, fr, es
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    pred = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return out.withColumn("lang_pred", pred)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (alnum runs + punct marks)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), TOKEN_SPLIT_RE))
    bpe = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0))
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(bpe / ws, 6).alias("subword_ratio"),
    )
