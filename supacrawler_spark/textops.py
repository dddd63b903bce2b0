"""Training-data pipeline text operators over the documents table.

Each operator is a pure DataFrame builder (spark, sf_dir) -> DataFrame,
designed to stay JVM-side (built-in functions, whole-stage codegen —
no Python in the hot path) and to have an exact DuckDB oracle twin in
__spark_entry__.oracle_sql().

Hash-function portability: cross-engine-checkable operators use md5
(identical hex in Spark and DuckDB) rather than murmur3/xxhash64
(engine-specific). At 100 TB you would swap md5 for xxhash64 — the
plans are hash-agnostic.

Scale notes per operator are in the docstrings; the common themes:
- shingling explodes ~n_tokens rows/doc: partial aggregation
  (map-side combine) keeps the shuffle at one row per (doc, distinct
  shingle);
- LSH band join is an equi-join on band value — co-hash-partitioned,
  no broadcast of anything document-sized;
- candidate verification only touches pairs sharing a band, never the
  n^2 cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "for")
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "von", "zu", "ein"),
    "fr": ("le", "et", "de", "la", "un"),
}
MINHASH_PERMS = 8
LSH_BANDS = 4  # 2 rows per band


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(docs):
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def token_count(spark, sf_dir) -> DataFrame:
    """Whitespace token counting. Narrow map-only plan: no shuffle,
    split+size stay in codegen."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("len_chars"),
    )


# BPE-ish pre-tokenizer pattern (the GPT-2 pre-tokenizer shape,
# lookahead-free so Java regex (Spark codegen) and RE2 (DuckDB twin)
# agree exactly): optional leading space + letter run | digit run |
# punctuation run, else whitespace run.
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count(spark, sf_dir) -> DataFrame:
    """Token counting, BPE-ish variant: counts pre-tokenizer pieces
    via a native regexp_count — JVM-side, map-only, no UDF. The
    whitespace count (token_count) underestimates LLM token budgets
    on punctuation-heavy text; this is the standard first-order
    estimator used by training-data pipelines."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_TOKEN_RE)).alias("n_bpe_pieces"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


def quality_score(spark, sf_dir) -> DataFrame:
    """Quality signals: token stats + stopword ratio. One shuffle
    (groupBy doc_id) with map-side partial aggregation."""
    toks = _tokens(_docs(spark, sf_dir))
    is_stop = F.col("tok").isin(*STOPWORDS_EN).cast("long")
    return (toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_stop).alias("n_stopwords"),
        (F.sum(is_stop) / F.count("*")).alias("stopword_ratio"),
        (F.sum(F.length("tok")) / F.count("*")).alias("avg_token_len"),
    ))


def lang_id(spark, sf_dir) -> DataFrame:
    """Stopword-dictionary language ID (n-gram heuristic at word
    level). Scores stay in one aggregation; argmax is a CASE chain —
    fully JVM-side."""
    toks = _tokens(_docs(spark, sf_dir))
    aggs = [
        F.sum(F.col("tok").isin(*kws).cast("long")).alias(f"score_{lang}")
        for lang, kws in sorted(LANG_STOPWORDS.items())
    ]
    scored = toks.groupBy("doc_id").agg(*aggs)
    best = F.greatest(*[F.col(f"score_{l}") for l in sorted(LANG_STOPWORDS)])
    pred = F.when(F.col("score_en") == best, F.lit("en"))
    for lang in ("de", "fr"):
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", *[f"score_{l}" for l in sorted(LANG_STOPWORDS)],
        pred.alias("pred_lang"))


def fingerprint(spark, sf_dir) -> DataFrame:
    """Document fingerprinting: full-text digest + a coarse prefix
    bucket (the rolling-hash stand-in that is cross-engine exact)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.md5(F.substring("text", 1, 40)).alias("fp_prefix40"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def exact_dedup(spark, sf_dir) -> DataFrame:
    """Exact duplicate groups on a 16-char prefix digest (hash-groupBy;
    the full-text variant is md5(text) — prefix 16 guarantees real
    collisions in the synthetic corpus). Returns one row per duplicate
    group: representative = min doc_id. Scale: single hash shuffle on
    the digest; skew-free (digests are uniform)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.substring("text", 1, 16)).alias("fp"))
    return (d.groupBy("fp").agg(
        F.count("*").alias("dup_count"),
        F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("dup_count") > 1))


def shingles(docs, n: int = 3):
    """Word 3-gram shingles via transform(sequence(...)) — array ops in
    codegen, exploded lazily by callers. Docs shorter than n tokens are
    dropped (sequence() would go negative)."""
    w = F.split("text", " ")
    docs = docs.filter(F.size(F.split("text", " ")) >= n)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", F.element_at(w, i + 1),
        F.element_at(w, i + 2), F.element_at(w, i + 3)))
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def doc_shingles(spark, sf_dir) -> DataFrame:
    return shingles(_docs(spark, sf_dir)).distinct()


def minhash_signatures(spark, sf_dir, perms: int = MINHASH_PERMS) -> DataFrame:
    """MinHash signatures: perm k's hash of a shingle is
    md5(k || '|' || shingle); the signature component is the min over
    the doc's distinct shingles. One explode + one groupBy; the min()
    aggregates combine map-side, so the shuffle carries one row per
    doc, not per shingle."""
    sh = shingles(_docs(spark, sf_dir)).distinct()
    aggs = [F.min(F.md5(F.concat_ws("|", F.lit(str(k)), "shingle")))
            .alias(f"mh{k}") for k in range(perms)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(spark, sf_dir, perms: int = MINHASH_PERMS,
                      bands: int = LSH_BANDS) -> DataFrame:
    """LSH candidate pairs: signature split into bands (2 rows each),
    band value hashed, equi-self-join per band, distinct pairs a<b.
    Scale: the join key is (band_id, band_hash) — co-partitioned
    shuffle join; no n^2."""
    sig = minhash_signatures(spark, sf_dir, perms)
    rows_per_band = perms // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}")
                 for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("bh"))
            for b in range(bands)])).alias("bd")
    ).select("doc_id", "bd.band_id", "bd.bh")
    a = stacked.alias("a")
    b = stacked.alias("b")
    pairs = (a.join(b, ["band_id", "bh"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs


def ngram_jaccard_pairs(spark, sf_dir, threshold: float = 0.8,
                        max_doc: int = 200) -> DataFrame:
    """n-gram Jaccard near-dup verification over a bounded doc range:
    intersection via shingle equi-join, union = |A|+|B|-∩. The join is
    on the shingle value (co-partitioned); sizes come from a broadcast
    of per-doc shingle counts."""
    sh = (shingles(_docs(spark, sf_dir).filter(F.col("doc_id") < max_doc))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("n_b"))
    j = (inter.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
         .withColumn("jaccard",
                     F.col("n_inter") /
                     (F.col("n_a") + F.col("n_b") - F.col("n_inter"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_inter", "jaccard"))


def lsh_verified_pairs(spark, sf_dir, threshold: float = 0.8) -> DataFrame:
    """The scale path for near-dup verification: exact n-gram Jaccard
    computed ONLY for LSH candidate pairs (minhash_lsh_pairs), over the
    FULL corpus — no doc_id bound, no raw shingle self-join.

    Scale shape: candidates are a vanishing fraction of docs, so the
    candidate-doc id set broadcasts; the heavy shingle table is
    semi-join-filtered map-side before any shuffle, and the
    intersection join only ever touches candidate-doc shingles. A hot
    shingle shared by non-candidate docs never enters a join."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    sh = shingles(_docs(spark, sf_dir)).distinct()
    cand_docs = (pairs.select(F.col("doc_a").alias("doc_id"))
                 .union(pairs.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    shc = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    sizes = shc.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shc.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shc.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(F.broadcast(pairs), "doc_a")
             .join(b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    j = (inter.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
         .withColumn("jaccard",
                     F.col("n_inter") /
                     (F.col("n_a") + F.col("n_b") - F.col("n_inter"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "n_inter", "jaccard"))


def simhash(spark, sf_dir, bits: int = 16) -> DataFrame:
    """SimHash: per token, bit b of md5(token) votes +1/-1; the
    fingerprint bit is the sign of the vote sum. Bits come from the
    first 4 hex chars (16 bits) — cross-engine exact. One explode +
    one groupBy with partial agg."""
    toks = _tokens(_docs(spark, sf_dir))
    hx = F.md5("tok")
    nib = [F.conv(F.substring(hx, i + 1, 1), 16, 10).cast("int").alias(
        f"n{i}") for i in range(bits // 4)]
    t = toks.select("doc_id", *nib)
    votes = []
    for b in range(bits):
        nibble = F.col(f"n{b // 4}")
        bit = F.shiftright(nibble, b % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{b}"))
    v = t.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0,
                      F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        fp = term if fp is None else (fp + term)
    return v.select("doc_id", fp.alias("simhash"))
