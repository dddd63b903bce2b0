"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship crawl on sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2 +
                   the training-data pipeline ops).
``oracle_sql()`` — DuckDB twins; omitted for genuinely non-SQL ops
                   (full crawl loop, UDF extraction, media stubs) which
                   get the weaker rows-only check.

Cross-engine exactness rules used throughout (see textops.py /
simsearch.py docstrings): md5 for portable hashing, DECIMAL for
order-independent sums, single-division doubles only, ranks instead of
raw float scores, explicit BIGINT casts for DuckDB HUGEINT sums.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from supacrawler_spark import graph, parseops, simsearch, textops  # noqa: E402
from supacrawler_spark.sources import sitemap, warc  # noqa: E402
from supacrawler_spark.functions import (  # noqa: E402
    canon_info,
    domain_scope_udf,
    match_patterns_udf,
)
from supacrawler_spark.operators.rank import ordered_row_number  # noqa: E402

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Synthetic URL construction shared (as literal SQL snippets) by the
# Spark side and the DuckDB oracle — both engines build byte-identical
# URL strings from doc_id.
URL_SQL = (
    "'https://h' || CAST(doc_id % 32 AS STRING) || '.example.org' || "
    "CASE CAST(doc_id % 5 AS INT) "
    " WHEN 0 THEN '/' "
    " WHEN 1 THEN '/blog/p' || CAST(doc_id AS STRING) || '#x' "
    " WHEN 2 THEN '/docs/p' || CAST(doc_id AS STRING) || '?q=1' "
    " WHEN 3 THEN '/news/p' || CAST(doc_id AS STRING) || '?q=1#y' "
    " ELSE '/product/p' || CAST(doc_id AS STRING) END"
)
URL_SQL_DUCK = URL_SQL.replace("AS STRING", "AS VARCHAR")

HOST_SQL = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'www.h1.example.org' "
    "WHEN 1 THEN 'h1.example.org' ELSE 'sub.h1.example.org' END"
)

# golden parquet oracles (scripts/make_goldens.py) for non-SQL queries
_GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "goldens")


# ---------------------------------------------------------------------------
# Group A — crawl-relational operator analogs (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_crawl_stats(spark, sf_dir):
    """A1: crawl statistics aggregate (crawl/service.go:701-706)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("total_pages"),
        F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0))
        .alias("successful_pages"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .alias("failed_pages"),
    )


def q_seen_anti_join(spark, sf_dir):
    """J2: URL-seen anti-join (crawl/service.go:525-527) — customers
    with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


def q_cuckoo_prefilter(spark, sf_dir):
    """J2 via the north rule's other named URL-seen family
    ("Bloom/cuckoo"): the same customers-with-no-orders anti-join,
    computed through the partitioned cuckoo pre-filter (cuckoo.py) —
    definite-new rows (probe negative, provably unseen) skip the
    exact anti-join entirely; maybe rows are exact-rechecked. Must
    equal the plain anti-join oracle regardless of the filter's
    false-positive rate. 100-TB shape: the probe is one
    applyInPandas pass per touched bucket (2 vectorized gathers),
    and only the maybe-fraction reaches the anti-join exchange."""
    import tempfile

    from supacrawler_spark.cuckoo import CuckooState

    c = (_t(spark, sf_dir, "customer")
         .select("c_custkey", "c_name",
                 F.xxhash64("c_custkey").alias("url_hash")))
    # seen set = a strict subset of ordering customers (integer gate,
    # cross-engine exact) so BOTH probe outcomes carry rows: definite-
    # new customers flow straight through, maybes get exact-rechecked
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") % 3 == 0).select("o_custkey"))
    ck = CuckooState(tempfile.mkdtemp(prefix="cuckoo_q_"),
                     n_buckets=8, log2_slots=14)
    ck.add(o.select(F.xxhash64("o_custkey").alias("url_hash")))
    flagged = ck.flag(c)
    fresh = flagged.filter(~F.col("_maybe_seen"))
    maybe = (flagged.filter(F.col("_maybe_seen"))
             .join(o, F.col("c_custkey") == F.col("o_custkey"),
                   "left_anti"))
    return fresh.unionByName(maybe).select("c_custkey", "c_name")


def q_fetch_join(spark, sf_dir):
    """J1: fetch left-join with miss -> 404 (isValidResult analog,
    scrape/service.go:648-668)."""
    o = _t(spark, sf_dir, "orders").filter("o_orderkey < 2000")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(
        c, (o.o_custkey == c.c_custkey) & (c.c_custkey % 7 != 0), "left")
    return joined.select(
        "o_orderkey", "o_custkey",
        F.when(F.col("c_custkey").isNull(), 404).otherwise(200)
        .alias("status_code"),
        "c_mktsegment")


def q_politeness_topk(spark, sf_dir):
    """A6/L: per-host politeness budget — first 3 orders per customer
    in deterministic order (window rank <= K)."""
    from pyspark.sql import Window
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn"))


def q_frontier_rank(spark, sf_dir):
    """§2.5: deterministic global crawl-order rank (priority queue) —
    exercises the scalable two-phase ordered_row_number."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    ranked = ordered_row_number(
        li, [F.col("l_extendedprice").desc(), F.col("l_orderkey"),
             F.col("l_linenumber")], "crawl_ord")
    return (ranked.filter(F.col("crawl_ord") <= 100)
            .select("crawl_ord", "l_orderkey", "l_linenumber",
                    "l_extendedprice"))


def q_first_seen_dedup(spark, sf_dir):
    """J5: first-seen-wins dedup (mapper/service.go:146-152) — first
    event per user."""
    from pyspark.sql import Window
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "event_id", "event_type"))


def q_host_reputation(spark, sf_dir):
    """Composed crawl-policy table — who deserves crawl budget: the
    host graph's TrustRank (spam demotion) and PageRank joined with a
    per-host document rollup (docs attributed by doc_id % 32 to the
    same h<k> universe the events graph uses), ranked into a
    deterministic crawl priority. Demonstrates operator composition:
    the Spark side joins three existing operators; the oracle nests
    their SQL twins as subqueries — exact end to end because every
    input is BIGINT fixed-point.

    100-TB shape: two bounded-by-|hosts| equi-joins over slim rank
    tables + one map-side-combinable doc rollup; the final rank is a
    bounded global sort (|hosts| rows)."""
    from pyspark.sql import Window
    tr = graph.trustrank_hosts(spark, sf_dir).withColumnRenamed(
        "pagerank_fp", "trustrank_fp")
    pr = graph.pagerank_hosts(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 32).cast("string"))
        .alias("host"), "n_chars")
    roll = docs.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_sum"))
    j = (tr.join(pr, "host")
         .join(roll, "host", "left")
         .select("host", "trustrank_fp", "pagerank_fp",
                 F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                 F.coalesce("chars_sum", F.lit(0)).alias("chars_sum")))
    j = j.withColumn("mean_len_e3",
                     F.expr("CASE WHEN n_docs > 0 THEN "
                            "(chars_sum * 1000) div n_docs END"))
    w = Window.orderBy(F.col("trustrank_fp").desc(),
                       F.col("pagerank_fp").desc(), F.col("host").asc())
    return j.withColumn("crawl_priority",
                        F.row_number().over(w).cast("int"))


def q_host_counts(spark, sf_dir):
    """A6: per-host frontier counts (synthetic host from user_id)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.withColumn(
        "host", F.concat(F.lit("h"), (F.col("user_id") % 32).cast("string")))
        .groupBy("host")
        .agg(F.count("*").alias("n_events"),
             F.min("value").alias("min_value"),
             F.max("value").alias("max_value")))


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped agg.

    Arithmetic stays in exact decimal (a double product cast to 2dp
    would tie-round differently across engines), but the OUTPUT columns
    are BIGINT-scaled integers (cents / 1e-4 units): decimal outputs
    hash-mismatch under any harness that converts DECIMAL through
    float64, so the result representation must be integer-exact in any
    engine's default conversion."""
    li = _t(spark, sf_dir, "lineitem").filter(
        "l_shipdate <= timestamp '2024-09-01 00:00:00'")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = price * (F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)"))
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty).cast("decimal(22,2)")
         * F.lit(100).cast("decimal(3,0)")).cast("bigint")
        .alias("sum_qty_e2"),
        (F.sum(price).cast("decimal(22,2)")
         * F.lit(100).cast("decimal(3,0)")).cast("bigint")
        .alias("sum_base_price_e2"),
        (F.sum(disc).cast("decimal(22,4)")
         * F.lit(10000).cast("decimal(5,0)")).cast("bigint")
        .alias("sum_disc_price_e4"),
        F.count("*").alias("count_order")))


def q_broadcast_dim(spark, sf_dir):
    """J4: broadcast dimension join (robots/politeness analog)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(F.count("*").alias("n_customers")))


def q_budget_limit(spark, sf_dir):
    """L1/L2: deterministic ORDER BY + LIMIT (link budget truncation)."""
    o = _t(spark, sf_dir, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(50)
            .select("o_orderkey", "o_totalprice"))


# ---------------------------------------------------------------------------
# Group B — URL kernel over synthesized URLs
# ---------------------------------------------------------------------------

def q_url_canonicalize(spark, sf_dir):
    """F1+F2: canonicalization UDF vs SQL-replicated rules."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", URL_SQL + " AS url")
    return (d.withColumn("_c", canon_info(F.col("url")))
            .select("doc_id", "url",
                    F.col("_c.url_canon").alias("url_canon"),
                    F.col("_c.host").alias("host")))


def q_pattern_filter(spark, sf_dir):
    """F4: glob pattern predicate (crawl/service.go:780-817)."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", URL_SQL + " AS url")
    keep = match_patterns_udf(("/blog/*", "/docs/*"))(F.col("url"))
    return d.filter(keep).select("doc_id", "url")


def q_domain_scope(spark, sf_dir):
    """F3: domain scoping incl. www-strip and subdomain flag
    (mapper/service.go:241-254)."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", HOST_SQL + " AS host")
    seed = F.lit("h1.example.org")
    return d.select(
        "doc_id", "host",
        domain_scope_udf(False)(F.col("host"), seed).alias("in_scope"),
        domain_scope_udf(True)(F.col("host"), seed).alias("in_scope_subs"))


def q_content_truncate(spark, sf_dir):
    """L5: per-page content cap + '...[TRUNCATED]' marker
    (parse/service.go:537-540; cap scaled to the testdata)."""
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || "
        "'...[TRUNCATED]' ELSE text END AS content")


def q_cache_key(spark, sf_dir):
    """X9: scrape cache-key normalization (scrape/service.go:599-614)."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", URL_SQL + " AS url")
    return d.selectExpr(
        "doc_id", "translate(url, ':/?&', '____') AS cache_key")


def q_union_dedup(spark, sf_dir):
    """§2.7 set ops: union + distinct (the seen-set union semantics)."""
    ev = _t(spark, sf_dir, "events").selectExpr("user_id AS id")
    oc = _t(spark, sf_dir, "orders").selectExpr("o_custkey AS id")
    return ev.union(oc).distinct()


def q_rollup_counts(spark, sf_dir):
    """Grouping-sets coverage: rollup aggregation (SURVEY.md §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n")))


def q_json_extract(spark, sf_dir):
    """X11: JSON payload decode (job/task payloads)."""
    return _t(spark, sf_dir, "events").selectExpr(
        "event_id", "get_json_object(props, '$.k') AS k")


def q_time_buckets(spark, sf_dir):
    """Timestamp handling: hourly event buckets (warc_ts-style)."""
    return (_t(spark, sf_dir, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("hour"))
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event")))


SESSION_GAP_MIN = 30


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the event stream via Spark's NATIVE
    session_window operator (the idiomatic scale path: one hash
    shuffle on user_id, sessions merged inside the aggregate — no
    lag/cumsum window sort needed). A new session starts when the gap
    from the previous event is >= 30 min (session_window's interval is
    end-exclusive: an event landing exactly at prev_ts + gap opens a
    new session; the oracle's lag+cumsum twin mirrors that with >=).
    session_seq ranks a user's sessions chronologically — session
    starts are > gap apart, so the order is total and engine-agnostic.
    Double `value` is aggregated only with order-independent min/max
    (float sums would hash-differ across engines); the duration is
    exact integer microseconds."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    s = (ev.groupBy("user_id",
                    F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
         .agg(F.count("*").alias("n_events"),
              F.min("ts").alias("session_start"),
              F.max("ts").alias("session_end"),
              F.min("value").alias("min_value"),
              F.max("value").alias("max_value")))
    w = Window.partitionBy("user_id").orderBy("session_start")
    return (s.select(
        "user_id", "n_events", "session_start", "session_end",
        "min_value", "max_value",
        (F.unix_micros(F.col("session_end").cast("timestamp"))
         - F.unix_micros(F.col("session_start").cast("timestamp")))
        .alias("duration_us"))
        .withColumn("session_seq", F.row_number().over(w)))


def _scrapeops():
    from supacrawler_spark import scrapeops
    return scrapeops


def _wet_extract(spark, sf_dir):
    from supacrawler_spark.sources import warc
    return warc.wet_extract(spark, sf_dir)


def _wet_oracle():
    from supacrawler_spark.sources import warc
    return warc.wet_extract_oracle_sql()


def _charset_sniff(spark, sf_dir):
    from supacrawler_spark.sources import charset
    return charset.charset_sniff(spark, sf_dir)


def _charset_oracle():
    from supacrawler_spark.sources import charset
    return charset.charset_sniff_oracle_sql()


def q_recrawl_schedule(spark, sf_dir):
    """Change-frequency recrawl scheduler over the events table read
    as per-page observation history (scrapeops.recrawl_schedule)."""
    return _scrapeops().recrawl_schedule(spark, sf_dir)


def q_label_centroids(spark, sf_dir):
    """Array/aggregate coverage: per-label per-dimension embedding
    sums. Per-element exact decimal (float->double->decimal, the only
    conversion both engines agree on) scaled to an integer 1e-10 grid
    BEFORE summing, so the output is a plain BIGINT sum — hash-stable
    under any engine's default type conversion (decimal outputs are
    not; see round-1 verdict)."""
    e = _t(spark, sf_dir, "embeddings")
    x = e.select("label", F.posexplode("embedding").alias("pos0", "v"))
    vd = F.col("v").cast("double").cast("decimal(20,10)")
    return (x.select("label", (F.col("pos0") + 1).alias("pos"),
                     (vd * F.lit(10000000000).cast("decimal(11,0)"))
                     .cast("bigint").alias("v_e10"))
            .groupBy("label", "pos")
            .agg(F.sum("v_e10").alias("sum_v_e10"),
                 F.count("*").alias("n"))
            .filter(F.col("pos") <= 8))


# ---------------------------------------------------------------------------
# Group C/D — text + dedup + similarity ops (builders in textops/simsearch)
# ---------------------------------------------------------------------------

def q_cosine_topk(spark, sf_dir):
    return simsearch.cosine_topk(spark, sf_dir).select(
        "query_id", "rank", "neighbor_id")


def q_lsh_buckets(spark, sf_dir):
    return simsearch.lsh_buckets(spark, sf_dir)


def q_lsh_topk(spark, sf_dir):
    return simsearch.lsh_topk(spark, sf_dir).select(
        "query_id", "rank", "neighbor_id")


def q_ivf_topk(spark, sf_dir):
    return simsearch.ivf_topk(spark, sf_dir).select(
        "query_id", "rank", "neighbor_id")


# ---------------------------------------------------------------------------
# Group E — Spark-only (rows-only check: non-SQL-expressible)
# ---------------------------------------------------------------------------

def q_crawl_trace(spark, sf_dir):
    """The flagship: full iterative crawl over the synthetic web
    (fetch-join + UDF extraction + politeness + bloom + checkpointing —
    not SQL-expressible; correctness is pinned by the oracle suite in
    tests/test_crawl_engine.py)."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_pages_df, gen_seeds

    pages_df, n_pages = gen_pages_df(spark, sf_dir, limit=150)
    run = run_crawl(spark, pages_df, gen_seeds(n_pages, k=2),
                    CrawlParams(depth=2, link_limit=25),
                    collect_lineage=False)
    return run.trace


def q_crawl_lineage(spark, sf_dir):
    """North-rule lineage clause as a driver row: the same flagship
    crawl with per-partition lineage collection ON, projected to its
    deterministic marginal (results per wave — partition ids and
    counts vary with parallelism, per-wave sums do not). The oracle is
    the INDEPENDENT crawl_trace golden aggregated by iter: every
    result row the engine wrote must be accounted for by the oracle's
    scheduled set, wave by wave."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_pages_df, gen_seeds

    pages_df, n_pages = gen_pages_df(spark, sf_dir, limit=150)
    run = run_crawl(spark, pages_df, gen_seeds(n_pages, k=2),
                    CrawlParams(depth=2, link_limit=25),
                    collect_lineage=True)
    return (run.lineage.groupBy("iter")
            .agg(F.sum("rows").cast("long").alias("n_results")))


def q_scrape_markdown(spark, sf_dir):
    """X1-X8: single-page scrape through the pipeline (extraction UDF
    output shape; byte-identity pinned by tests/test_htmlkit.py)."""
    from supacrawler_spark.plans import scrape_one
    from supacrawler_spark.sources import gen_pages_df
    from supacrawler_spark.sources.synth import page_url

    pages_df, n_pages = gen_pages_df(spark, sf_dir, limit=50)
    return scrape_one(spark, pages_df, page_url(0)).select(
        "url", "status_code", "success", "title", "discovered")


def q_scrape_cache_hits(spark, sf_dir):
    """J3 scrape cache as a driver query (ScrapeWithCache,
    scrape/service.go:46-69): crawl A populates the cache; crawl B
    (one more seed, bigger budget) consumes it with cached titles
    tagged 'CACHE:' so hits are observable in the output. Extraction
    is a pure function of html, so the cached run is bit-identical to
    a fresh one and the hit set is exactly scheduled(B) ∩
    successes(A) — which is what the independent two-oracle golden
    (scripts/make_goldens.py) computes with no engine involvement."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_pages_df, gen_seeds

    pages_df, n_pages = gen_pages_df(spark, sf_dir, limit=150)
    a = run_crawl(spark, pages_df, gen_seeds(n_pages, k=2),
                  CrawlParams(depth=2, link_limit=25),
                  collect_lineage=False)
    cache = a._results_all().withColumn(
        "title", F.concat(F.lit("CACHE:"), F.col("title")))
    b = run_crawl(spark, pages_df, gen_seeds(n_pages, k=3),
                  CrawlParams(depth=2, link_limit=40),
                  scrape_cache=cache, collect_lineage=False)
    return b.results.select(
        "url", "crawl_ord", "status_code", "title",
        F.col("title").startswith("CACHE:").alias("cache_hit"))


def q_media_metadata(spark, sf_dir):
    """Multimodal: REAL image bytes (PNG/GIF/JPEG synthesized per doc)
    -> typed metadata via a dependency-free header parser in
    mapInPandas. The oracle knows format/width/height a priori from
    the fixture's doc_id rule — the parser must recover them from the
    actual container bytes."""
    from supacrawler_spark import multimodal
    return multimodal.media_metadata(multimodal.docs_as_media(spark, sf_dir))


def q_media_resize(spark, sf_dir):
    """Multimodal resize: REAL pixel path — gradient PNGs (filters
    None/Sub/Up) are zlib-inflated, unfiltered, and nearest-neighbor
    resampled to 8x8 inside mapInPandas; the oracle recomputes every
    output pixel from the fixture's a-priori gradient formula, so a
    codec or mapping bug fails the hash."""
    from supacrawler_spark import multimodal
    return multimodal.media_resize(
        multimodal.docs_as_gradient_media(spark, sf_dir))


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction: brightness statistics in exact
    integer algebra over the decoded gradient pixels."""
    from supacrawler_spark import multimodal
    return multimodal.media_features(
        multimodal.docs_as_gradient_media(spark, sf_dir))


def q_frame_sample(spark, sf_dir):
    """Multimodal frame sampling: every 2nd frame of the FAKV fixture
    container; px_first/px_last read from the actual frame bytes pin
    the sampler's offset math against the a-priori byte rule."""
    from supacrawler_spark import multimodal
    return multimodal.frame_sample(
        multimodal.docs_as_video(spark, sf_dir), every=2)


def q_parse_robots(spark, sf_dir):
    """F5 source path: raw robots.txt text -> exploded rule rows via
    the RFC-9309 group-selection parser (robotskit). The oracle
    mirrors the fixture's a-priori rule pattern (even hids carry a
    more specific agent group that shades '*')."""
    from supacrawler_spark import robotskit
    from supacrawler_spark.sources.synth import host_name, n_hosts

    rows = [(host_name(h), robotskit.synth_robots_txt(h))
            for h in range(n_hosts())]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    return robotskit.parse_robots_rules(df)


def q_politeness_budget(spark, sf_dir):
    """The round-4 delay-budget rule through the ACTUAL engine path
    (plans.crawl.effective_politeness over the robotskit dim): B_eff =
    min(default 10, ceil(10000ms window / Crawl-delay)). The twin
    mirrors the fixture's a-priori delay pattern (even hids,
    (1 + hid%5) seconds) and the integer ceil."""
    from supacrawler_spark import robotskit
    from supacrawler_spark.plans.crawl import effective_politeness
    from supacrawler_spark.sources.synth import host_name, n_hosts

    rows = [(host_name(h), robotskit.synth_robots_txt(h))
            for h in range(n_hosts())]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    robots = robotskit.robots_df_from_texts(df)
    eff = effective_politeness(None, robots, wave_window_ms=10_000,
                               default_host_budget=10)
    return eff.select("host",
                      F.col("max_parallel").cast("int")
                      .alias("max_parallel"))


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap discovery from robots.txt bodies (robotskit
    .robots_sitemaps): every fixture host declares one Sitemap line
    up top; hid % 4 == 1 hosts add a lowercase one after the groups."""
    from supacrawler_spark import robotskit
    from supacrawler_spark.sources.synth import host_name, n_hosts

    rows = [(host_name(h), robotskit.synth_robots_txt(h))
            for h in range(n_hosts())]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    return robotskit.robots_sitemaps(df)


def q_audio_metadata(spark, sf_dir):
    """Multimodal audio: REAL RIFF/WAVE chunk-walk parsing of complete
    WAV containers; the oracle recomputes channels/rate/bits/samples/
    duration from the fixture's a-priori rule."""
    from supacrawler_spark import multimodal
    return multimodal.audio_metadata(
        multimodal.docs_as_audio(spark, sf_dir))


def q_media_digest(spark, sf_dir):
    """Multimodal plumbing byte-exactness: length + md5 of the binary
    payload column, computed JVM-side."""
    from supacrawler_spark import multimodal
    return multimodal.media_digest(
        multimodal.docs_as_text_media(spark, sf_dir))


# ---------------------------------------------------------------------------
# Group F — scrape-service page diagnostics (F8 / A4)
# ---------------------------------------------------------------------------

# Synthetic scrape responses shared (as literal SQL) by both engines:
# a deterministic slice of documents gets Cloudflare challenge markers
# injected into status/title/content.
_CF_STATUS_SQL = "CASE WHEN doc_id % 3 = 0 THEN 403 ELSE 200 END"
_CF_TITLE_SQL = (
    "CASE CAST(doc_id % 9 AS INT) "
    "WHEN 0 THEN 'Just a moment...' "
    "WHEN 3 THEN 'Attention Required! | Cloudflare' "
    "WHEN 6 THEN 'Checking your browser before accessing' "
    "ELSE 'Document ' || CAST(doc_id AS STRING) END"
)
_CF_CONTENT_SQL = (
    "CASE CAST(doc_id % 15 AS INT) "
    "WHEN 0 THEN text || ' Cloudflare Ray ID: 8f2a91c4' "
    "WHEN 6 THEN 'Waiting for example.org to respond...' || text "
    "ELSE text END"
)

# Derived (initial, final) signature pairs for the change heuristics —
# integer/md5 arithmetic both engines express identically, covering
# every clause: text growth, empty-page appearance, element growth,
# loading-indicator resolution, link growth, hash-change fallback.
_SIG_PAIR_SQL = (
    "CASE WHEN doc_id % 4 = 0 THEN 0 ELSE n_chars END AS i_text, "
    "n_chars + (doc_id % 400) AS f_text, "
    "doc_id % 100 AS i_elem, (doc_id % 100) + (doc_id % 77) AS f_elem, "
    "doc_id % 10 AS i_link, (doc_id % 10) + (doc_id % 9) AS f_link, "
    "doc_id % 3 AS i_async, doc_id % 2 AS f_async, "
    "md5(text) AS i_hash, "
    "CASE WHEN doc_id % 5 = 0 THEN md5(text || 'x') "
    "ELSE md5(text) END AS f_hash"
)


def q_stream_first_seen(spark, sf_dir):
    """§2.9 custom stateful streaming as a driver query (VERDICT r3
    #5): a multi-batch parquet-source stream of colliding URLs drains
    through the applyInPandasWithState first-seen operator
    (streaming.stream_first_seen — per-bucket seen-hash state across
    micro-batches); the emitted rows are exactly the first occurrences,
    so their url SET equals the batch DISTINCT of the same events — the
    DuckDB twin. Output is the set (order-independent), not the
    surviving ordinals, so the check is deterministic under any
    micro-batch partitioning."""
    import tempfile

    from supacrawler_spark.streaming import stream_first_seen

    events = _t(spark, sf_dir, "documents").selectExpr(
        "'https://s' || CAST(doc_id % 211 AS STRING) || '.example.org/p'"
        " || CAST(doc_id % 211 AS STRING) AS url"
    ).withColumn("url_hash", F.xxhash64("url"))
    base = tempfile.mkdtemp(prefix="stream_seen_")
    src = os.path.join(base, "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("url string, url_hash long")
              .option("maxFilesPerTrigger", "2").parquet(src))
    out = os.path.join(base, "out")
    q = (stream_first_seen(stream).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.read.schema("url string, url_hash long").parquet(out)
            .select("url"))


def q_stream_host_budget(spark, sf_dir):
    """§2.9 stateful politeness as a driver query: a multi-batch
    parquet-source stream of fetch candidates drains through the
    per-host quota operator (streaming.stream_host_budget — cumulative
    admitted count per host in state). Per-host admitted/deferred
    COUNTS are invariant to micro-batch partitioning — min(cap, n) —
    so the aggregate is the deterministic surface and the DuckDB twin
    is closed-form over the same event table."""
    import tempfile

    from supacrawler_spark.streaming import stream_host_budget

    cap = 7
    events = _t(spark, sf_dir, "documents").selectExpr(
        "'h' || CAST(doc_id % 53 AS STRING) AS host",
        "'https://h' || CAST(doc_id % 53 AS STRING)"
        " || '.example.org/p' || CAST(doc_id AS STRING) AS url")
    base = tempfile.mkdtemp(prefix="stream_budget_")
    src = os.path.join(base, "events")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("host string, url string")
              .option("maxFilesPerTrigger", "2").parquet(src))
    out = os.path.join(base, "out")
    q = (stream_host_budget(stream, cap=cap).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    decided = spark.read.schema(
        "host string, url string, admitted boolean").parquet(out)
    return (decided.groupBy("host")
            .agg(F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
                 F.sum((~F.col("admitted")).cast("long")).alias("n_deferred")))


def q_cloudflare_detect(spark, sf_dir):
    """F8: the Cloudflare-challenge predicate over synthetic scrape
    responses — native contains algebra, no UDF, map-only."""
    from supacrawler_spark import scrapeops
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_CF_STATUS_SQL} AS status_code",
        f"{_CF_TITLE_SQL} AS title", f"{_CF_CONTENT_SQL} AS content")
    return d.select(
        "doc_id",
        scrapeops.cloudflare_blocked(
            F.col("status_code"), F.col("title"), F.col("content")
        ).alias("cf_blocked"))


def q_js_change_detect(spark, sf_dir):
    """A4: the JS-rendering change heuristics over derived signature
    pairs — native integer/boolean algebra, map-only."""
    from supacrawler_spark import scrapeops
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", *_SIG_PAIR_SQL.split(", "))
    return d.select(
        "doc_id",
        scrapeops.significant_change(
            F.col("i_text"), F.col("i_elem"), F.col("i_link"),
            F.col("i_async"), F.col("i_hash"), F.col("f_text"),
            F.col("f_elem"), F.col("f_link"), F.col("f_async"),
            F.col("f_hash"),
        ).alias("changed"))


def q_retry_ladder(spark, sf_dir):
    """S3: the retry-ladder strategy + deterministic header-profile
    assignment over synthetic attempt counters — pure literal CASE
    algebra (scrapeWithRetriesPlaywright scrape/service.go:91-119,
    GetHeaderProfile headers.go:152-176)."""
    from supacrawler_spark import fetchprofiles as FP
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 4).cast("int").alias("attempt"))
    strat = FP.strategy_for_attempt(F.col("attempt"))
    prof = FP.profile_for(strat, F.col("doc_id"))
    return d.select(
        "doc_id", "attempt", strat.alias("strategy"),
        prof["user_agent"].alias("user_agent"))


def q_screenshot_artifacts(spark, sf_dir):
    """S8: the screenshot artifact pipeline over synthesized pages.
    Golden-parquet oracle (the same pure renderer outside Spark)."""
    from supacrawler_spark.screenshots import screenshot_artifacts
    return screenshot_artifacts(spark, sf_dir, limit=60)


def q_content_signature(spark, sf_dir):
    """A4: the content-signature kernel over real synthesized html
    (one Arrow pass; html pruned immediately after). Golden-parquet
    oracle: the same kernel run by scripts/make_goldens.py outside
    Spark over the same deterministic pages."""
    from supacrawler_spark import scrapeops
    from supacrawler_spark.sources import gen_pages_df

    pages_df, _ = gen_pages_df(spark, sf_dir, limit=60)
    sig = scrapeops.content_signature(pages_df.select("url", "html"))
    return sig.select(
        "url", "signature.text_length", "signature.element_count",
        "signature.link_count", "signature.async_load_indicators",
        "signature.content_hash")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: an end-to-end crawl;
    returns the crawl-ordered result rows (driver checks rows>0)."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_pages_df, gen_seeds

    sf = "/root/testdata/sf0.001"
    pages_df, n_pages = gen_pages_df(spark, sf, limit=200)
    run = run_crawl(spark, pages_df, gen_seeds(n_pages, k=2),
                    CrawlParams(depth=2, link_limit=30),
                    collect_lineage=False)
    return run.results.select(
        "url", "iter", "depth", "crawl_ord", "status_code", "title",
        "discovered", "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl-relational operator analogs
        "crawl_stats": q_crawl_stats,
        "seen_anti_join": q_seen_anti_join,
        "cuckoo_prefilter": q_cuckoo_prefilter,
        "fetch_join": q_fetch_join,
        "politeness_topk": q_politeness_topk,
        "frontier_rank": q_frontier_rank,
        "first_seen_dedup": q_first_seen_dedup,
        "host_counts": q_host_counts,
        "pricing_summary": q_pricing_summary,
        "broadcast_dim": q_broadcast_dim,
        "budget_limit": q_budget_limit,
        # URL kernel
        "url_canonicalize": q_url_canonicalize,
        "pattern_filter": q_pattern_filter,
        "domain_scope": q_domain_scope,
        "cache_key": q_cache_key,
        # scalar/relational coverage
        "content_truncate": q_content_truncate,
        "union_dedup": q_union_dedup,
        "rollup_counts": q_rollup_counts,
        "json_extract": q_json_extract,
        "time_buckets": q_time_buckets,
        "sessionize": q_sessionize,
        "label_centroids": q_label_centroids,
        # text analysis
        "token_count": textops.token_count,
        "bpe_token_count": textops.bpe_token_count,
        "quality_score": textops.quality_score,
        "gopher_quality": textops.gopher_quality,
        "c4_line_filter": textops.c4_line_filter,
        "lang_id": textops.lang_id,
        "fingerprint": textops.fingerprint,
        # dedup
        "exact_dedup": textops.exact_dedup,
        "doc_shingles": textops.doc_shingles,
        "minhash_signatures": textops.minhash_signatures,
        "minhash_lsh_pairs": textops.minhash_lsh_pairs,
        "ngram_jaccard": textops.ngram_jaccard_pairs,
        "lsh_verified_pairs": textops.lsh_verified_pairs,
        "dup_clusters": textops.dup_clusters,
        "simhash_clusters": textops.simhash_clusters,
        "winnow_fingerprints": textops.winnow_fingerprints,
        "dup_span_stats": textops.dup_span_stats,
        "multi_signal_clusters": textops.multi_signal_clusters,
        "dedup_rate_by_source": textops.dedup_rate_by_source,
        "dedup_keep_best": textops.dedup_keep_best,
        "simhash": textops.simhash,
        "simhash_near_dup": textops.simhash_near_dup,
        "repetition_stats": textops.repetition_stats,
        "decontam_overlap": textops.decontam_overlap,
        "pii_redact": textops.pii_redact,
        "paragraph_dedup": textops.paragraph_dedup,
        "corpus_select": textops.corpus_select,
        "top_terms": textops.top_terms,
        "stratified_sample": textops.stratified_sample,
        "export_shards": textops.export_shards,
        "mixture_sample": textops.mixture_sample,
        "epoch_shuffle": textops.epoch_shuffle,
        "redirect_chains":
            lambda spark, sf: _scrapeops().redirect_chains(spark, sf),
        "dup_span_removal": textops.dup_span_removal,
        "trap_detect":
            lambda spark, sf: _scrapeops().trap_detect(spark, sf),
        "charset_sniff": _charset_sniff,
        "rarity_score": textops.rarity_score,
        "host_reputation": q_host_reputation,
        "crawl_diff":
            lambda spark, sf: _scrapeops().crawl_diff(spark, sf),
        "wet_extract": _wet_extract,
        "source_stats": textops.source_stats,
        "vocab_stats": textops.vocab_stats,
        "bm25_topk": textops.bm25_topk,
        "tokenize_ids": textops.tokenize_ids,
        "lsh_recall": textops.lsh_recall,
        "containment_pairs": textops.containment_pairs,
        "allpairs_jaccard": textops.allpairs_jaccard,
        "allpairs_containment": textops.allpairs_containment,
        "pack_windows": textops.pack_windows,
        "cms_token_counts": textops.cms_token_counts,
        "kmv_distinct": textops.kmv_distinct,
        "source_ngram_overlap": textops.source_ngram_overlap,
        "length_percentiles": textops.length_percentiles,
        "recrawl_schedule": q_recrawl_schedule,
        "robots_sitemaps": q_robots_sitemaps,
        # WARC container source (Common-Crawl-style shards)
        "warc_roundtrip": warc.warc_roundtrip,
        "warc_cdx": warc.warc_cdx,
        "sitemap_parse": sitemap.sitemap_parse,
        # host link graph
        "host_link_edges": graph.host_link_edges,
        "pagerank_hosts": graph.pagerank_hosts,
        "trustrank_hosts": graph.trustrank_hosts,
        "host_degree_stats": graph.host_degree_stats,
        "anchor_text": graph.anchor_text,
        "hits_hosts": graph.hits_hosts,
        "host_gini": graph.host_gini,
        # parse data plane
        "parse_prep": parseops.parse_prep,
        "parse_templates": parseops.parse_templates,
        # similarity search
        "cosine_topk": q_cosine_topk,
        "lsh_buckets": q_lsh_buckets,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "cosine_near_dup": simsearch.cosine_near_dup,
        "label_pair_distances": simsearch.label_pair_distances,
        "ann_recall": simsearch.ann_recall,
        "embedding_quantize": simsearch.embedding_quantize,
        "pq_codes": simsearch.pq_codes,
        "pq_topk": simsearch.pq_topk,
        "pq_recall": simsearch.pq_recall,
        # scrape-service page diagnostics
        "cloudflare_detect": q_cloudflare_detect,
        "js_change_detect": q_js_change_detect,
        "content_signature": q_content_signature,
        # retry ladder / token accounting / screenshot artifacts
        "retry_ladder": q_retry_ladder,
        "parse_tokens": parseops.parse_tokens,
        "screenshot_artifacts": q_screenshot_artifacts,
        # Spark-only (rows-only check)
        "crawl_trace": q_crawl_trace,
        "crawl_lineage": q_crawl_lineage,
        "scrape_markdown": q_scrape_markdown,
        "scrape_cache_hits": q_scrape_cache_hits,
        "media_metadata": q_media_metadata,
        "media_digest": q_media_digest,
        "media_resize": q_media_resize,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "audio_metadata": q_audio_metadata,
        "parse_robots": q_parse_robots,
        "politeness_budget": q_politeness_budget,
        # streaming (stateful first-seen; batch-projection oracle)
        "stream_first_seen": q_stream_first_seen,
        "stream_host_budget": q_stream_host_budget,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _retry_ladder_sql() -> str:
    from supacrawler_spark import fetchprofiles as FP
    strat = ("CASE WHEN doc_id % 4 >= 2 THEN 'bot_friendly' "
             "WHEN doc_id % 4 = 1 THEN 'mobile_device' "
             "ELSE 'modern_browser' END")
    ua = FP.profile_sql(strat, "doc_id")
    return (f"SELECT doc_id, CAST(doc_id % 4 AS INT) AS attempt, "
            f"{strat} AS strategy, {ua} AS user_agent FROM documents")

def _minhash_sql_core() -> str:
    """Shared shingle CTE (3-gram, distinct, docs with >= 3 tokens)."""
    return (
        "WITH sh AS (SELECT DISTINCT doc_id, "
        "unnest(list_transform(range(1, len(w)-1), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle "
        "FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents "
        "WHERE len(string_split(text,' ')) >= 3))"
    )


def _verified_pairs_sql_cte() -> str:
    """The full lsh_verified_pairs pipeline as a WITH chain ending in
    CTE ``vp(doc_a, doc_b, n_inter, jaccard)`` so downstream oracles
    (dup_clusters, dedup_keep_best) can extend it."""
    mh = ", ".join(
        f"min(md5('{k}' || '|' || shingle)) AS mh{k}"
        for k in range(textops.MINHASH_PERMS))
    rows_per_band = textops.MINHASH_PERMS // textops.LSH_BANDS
    return (
        _minhash_sql_core() + ", "
        f"sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
        "bands AS (" + " UNION ALL ".join(
            "SELECT doc_id, {b} AS band_id, md5({cat}) AS bh FROM sig"
            .format(b=b, cat=" || '|' || ".join(
                f"mh{b * rows_per_band + r}" for r in range(rows_per_band)))
            for b in range(textops.LSH_BANDS)) + "), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band_id = b.band_id "
        "AND a.bh = b.bh AND a.doc_id < b.doc_id), "
        "cd AS (SELECT doc_a AS doc_id FROM cand "
        "UNION SELECT doc_b FROM cand), "
        "shc AS (SELECT sh.doc_id, sh.shingle FROM sh "
        "JOIN cd USING (doc_id)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM shc "
        "GROUP BY doc_id), "
        "inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter "
        "FROM cand c JOIN shc a ON a.doc_id = c.doc_a "
        "JOIN shc b ON b.doc_id = c.doc_b AND b.shingle = a.shingle "
        "GROUP BY 1, 2), "
        "vp AS (SELECT doc_a, doc_b, n_inter, "
        "n_inter / (sa.n + sb.n - n_inter) AS jaccard "
        "FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
        "JOIN sizes sb ON sb.doc_id = doc_b "
        "WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8)")


def _lsh_recall_sql(threshold: float = 0.8, max_doc: int = 200) -> str:
    """textops.lsh_recall twin: exact-Jaccard truth on the bounded doc
    range vs the LSH `cand` CTE (from _verified_pairs_sql_cte; its
    unused downstream CTEs are never evaluated). recall divides two
    BIGINTs — one IEEE op, bit-identical."""
    return (
        _verified_pairs_sql_cte() + ", "
        "tsizes AS (SELECT doc_id, count(*) AS n FROM sh "
        f"WHERE doc_id < {max_doc} GROUP BY doc_id), "
        "tinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "count(*) AS n_inter FROM sh a JOIN sh b "
        "ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        f"WHERE a.doc_id < {max_doc} AND b.doc_id < {max_doc} "
        "GROUP BY 1, 2), "
        "truth AS (SELECT doc_a, doc_b FROM tinter "
        "JOIN tsizes sa ON sa.doc_id = doc_a "
        "JOIN tsizes sb ON sb.doc_id = doc_b "
        f"WHERE n_inter / (sa.n + sb.n - n_inter) >= {threshold}), "
        "bc AS (SELECT doc_a, doc_b FROM cand "
        f"WHERE doc_a < {max_doc} AND doc_b < {max_doc}), "
        "tl AS (SELECT t.doc_a, CASE WHEN c.doc_a IS NOT NULL "
        "THEN 1 ELSE 0 END AS hit FROM truth t LEFT JOIN bc c "
        "ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n_truth, "
        "CAST(sum(hit) AS BIGINT) AS n_hit FROM tl), "
        "nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM bc) "
        "SELECT n_truth, n_candidates, n_hit, n_hit / n_truth AS recall "
        "FROM st CROSS JOIN nc")


def _dup_clusters_sql_cte() -> str:
    """_verified_pairs_sql_cte() extended with min-label transitive
    closure (recursive CTE; UNION set-semantics guarantees halting)
    ending in CTE ``lab(id, cluster_id)`` — one row per clustered
    doc, cluster_id = min doc_id in the component."""
    return (
        _verified_pairs_sql_cte().replace("WITH ", "WITH RECURSIVE ", 1)
        + ", edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp "
        "UNION ALL SELECT doc_b AS src, doc_a AS dst FROM vp), "
        "cc AS (SELECT src AS id, src AS lbl FROM edges "
        "UNION SELECT e.src AS id, cc.lbl FROM edges e "
        "JOIN cc ON cc.id = e.dst), "
        "lab AS (SELECT id, MIN(lbl) AS cluster_id FROM cc GROUP BY id)")


_CC_CLUSTERS_SQL = (
    ", cc AS (SELECT src AS id, src AS lbl FROM edges "
    "UNION SELECT e.src AS id, cc.lbl FROM edges e "
    "JOIN cc ON cc.id = e.dst), "
    "lab AS (SELECT id, MIN(lbl) AS cluster_id FROM cc GROUP BY id) "
    "SELECT id AS doc_id, cluster_id, "
    "count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM lab")


def _winnow_sql(k: int = textops.WINNOW_K, w: int = textops.WINNOW_W) -> str:
    gram = (" || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
            .replace("ws[i+0]", "ws[i]"))
    return (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws "
        f"FROM documents WHERE len(string_split(text, ' ')) >= {k + w - 1}), "
        "g AS (SELECT doc_id, list_transform("
        f"range(1, len(ws) - {k - 2}), i -> md5({gram})) AS hs FROM d), "
        "f AS (SELECT doc_id, unnest(list_distinct(list_transform("
        f"range(1, len(hs) - {w - 2}), "
        f"i -> list_aggregate(hs[i:i+{w - 1}], 'min')))) AS fp FROM g) "
        "SELECT DISTINCT doc_id, fp FROM f")


def _dup_span_sql(n: int = textops.DUP_SPAN_N) -> str:
    gram = (" || ' ' || ".join(f"w[i+{j}]" for j in range(n))
            .replace("w[i+0]", "w[i]"))
    return (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS w "
        f"FROM documents WHERE len(string_split(text, ' ')) >= {n}), "
        f"g AS (SELECT doc_id, md5(unnest(list_transform("
        f"range(1, len(w) - {n - 2}), i -> {gram}))) AS gh FROM d), "
        "s AS (SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh) "
        "SELECT doc_id, count(*) AS n_spans, "
        "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_dup_spans, "
        "sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) / count(*) "
        "AS dup_span_frac "
        "FROM g JOIN s USING (gh) GROUP BY doc_id")


def _simhash_clusters_sql() -> str:
    return (
        f"WITH RECURSIVE nd AS ({_simhash_near_dup_sql()}), "
        "edges AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM nd "
        "UNION ALL SELECT doc_id_b AS src, doc_id_a AS dst FROM nd)"
        + _CC_CLUSTERS_SQL)


def _multi_signal_clusters_sql() -> str:
    return (
        _verified_pairs_sql_cte().replace("WITH ", "WITH RECURSIVE ", 1)
        + f", nd AS ({_simhash_near_dup_sql()}), "
        "pe AS (SELECT doc_a AS src, doc_b AS dst FROM vp "
        "UNION SELECT doc_id_a AS src, doc_id_b AS dst FROM nd), "
        "edges AS (SELECT src, dst FROM pe "
        "UNION ALL SELECT dst AS src, src AS dst FROM pe)"
        + _CC_CLUSTERS_SQL)


def _lang_scores_sql() -> str:
    parts = []
    for lang, kws in sorted(textops.LANG_STOPWORDS.items()):
        inlist = ",".join(f"'{k}'" for k in kws)
        parts.append(
            f"CAST(sum(CASE WHEN tok IN ({inlist}) THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS score_{lang}")
    return ", ".join(parts)


def _simhash_sql(bits: int = 16) -> str:
    nib = ", ".join(
        f"strpos('0123456789abcdef', substring(md5(tok), {i + 1}, 1)) - 1"
        f" AS n{i}" for i in range(bits // 4))
    votes = ", ".join(
        f"CAST(sum(CASE WHEN (n{b // 4} >> {b % 4}) & 1 = 1 THEN 1 "
        f"ELSE -1 END) AS BIGINT) AS v{b}" for b in range(bits))
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) "
        f"ELSE 0 END)" for b in range(bits))
    return (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok"
        " FROM documents), "
        f"nibs AS (SELECT doc_id, {nib} FROM toks), "
        f"votes AS (SELECT doc_id, {votes} FROM nibs GROUP BY doc_id) "
        f"SELECT doc_id, {fp} AS simhash FROM votes")


def _simhash_near_dup_sql(bits: int = textops.SIMHASH_ND_BITS,
                          bands: int = textops.SIMHASH_ND_BANDS,
                          max_dist: int = textops.SIMHASH_ND_MAXDIST) -> str:
    width = bits // bands
    mask = (1 << width) - 1
    band_vals = ",".join(f"({i})" for i in range(bands))
    return (
        f"WITH sig AS ({_simhash_sql(bits)}), "
        f"keyed AS (SELECT doc_id, simhash, band, "
        f"(simhash >> (band * {width})) & {mask} AS key "
        f"FROM sig CROSS JOIN (VALUES {band_vals}) AS bb(band)), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, "
        "b.doc_id AS doc_id_b, a.simhash AS sa, b.simhash AS sb "
        "FROM keyed a JOIN keyed b ON a.band = b.band AND a.key = b.key "
        "AND a.doc_id < b.doc_id) "
        "SELECT doc_id_a, doc_id_b, "
        "CAST(bit_count(xor(sa, sb)) AS INT) AS hamming "
        f"FROM cand WHERE bit_count(xor(sa, sb)) <= {max_dist}")


def _cosine_sql(ann: bool, n_queries: "int | None" = None,
                k: "int | None" = None) -> str:
    planes = simsearch.plane_weights()
    if ann:
        n_queries, k = n_queries or 20, k or 3
        bucket = " + ".join(
            "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{','.join(str(x) for x in w)}]::DOUBLE[]) >= 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
            for p, w in enumerate(planes))
        return (
            f"WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket "
            "FROM embeddings), "
            "q AS (SELECT vec_id AS query_id, embedding AS qe, bucket "
            f"FROM b WHERE vec_id < {n_queries}), "
            "c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket "
            f"FROM b WHERE vec_id >= {n_queries}), "
            "s AS (SELECT query_id, neighbor_id, "
            "list_cosine_similarity(CAST(qe AS DOUBLE[]), "
            "CAST(ce AS DOUBLE[])) AS score "
            "FROM c JOIN q USING (bucket)), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank "
            "FROM s) "
            "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id "
            f"FROM r WHERE rank <= {k}")
    n_queries, k = n_queries or 5, k or 5
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
        f"FROM embeddings WHERE vec_id < {n_queries}), "
        "c AS (SELECT vec_id AS neighbor_id, embedding AS ce "
        f"FROM embeddings WHERE vec_id >= {n_queries}), "
        "s AS (SELECT query_id, neighbor_id, "
        "list_cosine_similarity(CAST(qe AS DOUBLE[]), CAST(ce AS DOUBLE[]))"
        " AS score FROM q CROSS JOIN c), "
        "r AS (SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank "
        "FROM s) "
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id "
        f"FROM r WHERE rank <= {k}")


def _ann_recall_sql(n_queries: int = 20, k: int = 3) -> str:
    """Recall@k twin: the exact, LSH and IVF top-k queries as nested
    CTEs over the SAME query/corpus split, hits counted by LEFT join
    on (query_id, neighbor_id)."""
    return (
        f"WITH ex AS ({_cosine_sql(False, n_queries, k)}), "
        f"lshq AS ({_cosine_sql(True, n_queries, k)}), "
        f"ivfq AS ({_ivf_sql(n_queries, k)}) "
        "SELECT ex.query_id, "
        "CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS lsh_hits, "
        "CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ivf_hits, "
        "count(*) AS n_exact, "
        "sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) "
        "/ count(*) AS lsh_recall, "
        "sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) "
        "/ count(*) AS ivf_recall "
        "FROM ex "
        "LEFT JOIN lshq l ON l.query_id = ex.query_id "
        "AND l.neighbor_id = ex.neighbor_id "
        "LEFT JOIN ivfq i ON i.query_id = ex.query_id "
        "AND i.neighbor_id = ex.neighbor_id "
        "GROUP BY ex.query_id")


def _ivf_sql(n_queries: int = 20, k: int = 3, n_probe: int = 2) -> str:
    """IVF twin: same integer-grid centroid derivation, same
    assignment/probe/verify structure."""
    return (
        "WITH e AS (SELECT vec_id, label, "
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        "x AS (SELECT label, generate_subscripts(embedding, 1) AS pos, "
        "unnest(embedding) AS val FROM embeddings), "
        "s AS (SELECT label, pos, "
        "CAST(sum(CAST(CAST(CAST(val AS DOUBLE) AS DECIMAL(20,10)) "
        "* CAST(10000000000 AS DECIMAL(11,0)) AS BIGINT)) AS BIGINT) "
        "AS se10, count(*) AS n FROM x GROUP BY label, pos), "
        "cent AS (SELECT label, "
        "list(CAST(se10 AS DOUBLE) / (n * 10000000000) ORDER BY pos) "
        "AS c FROM s GROUP BY label), "
        "cellscore AS (SELECT e.vec_id, e.v, cent.label, "
        "list_inner_product(e.v, cent.c) AS score, "
        "row_number() OVER (PARTITION BY e.vec_id "
        "ORDER BY list_inner_product(e.v, cent.c) DESC, cent.label) "
        "AS rk FROM e CROSS JOIN cent), "
        "asg AS (SELECT vec_id, label AS cell FROM cellscore "
        "WHERE rk = 1), "
        "qp AS (SELECT vec_id AS query_id, v AS qv, label AS cell "
        f"FROM cellscore WHERE vec_id < {n_queries} "
        f"AND rk <= {n_probe}), "
        "cand AS (SELECT e.vec_id AS neighbor_id, e.v AS cv, asg.cell "
        f"FROM e JOIN asg USING (vec_id) WHERE e.vec_id >= {n_queries}), "
        "sc AS (SELECT query_id, neighbor_id, "
        "list_cosine_similarity(qv, cv) AS score "
        "FROM cand JOIN qp USING (cell)), "
        "r AS (SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, neighbor_id) "
        "AS rank FROM sc) "
        "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id "
        f"FROM r WHERE rank <= {k}")


def _pq_recall_sql(n_queries: int = 20, k: int = 3) -> str:
    """simsearch.pq_recall twin: the exact and PQ/ADC rankings as
    parenthesized WITH-subqueries joined on (query_id, neighbor_id);
    recall divides two BIGINTs."""
    exact = _cosine_sql(ann=False, n_queries=n_queries, k=k)
    pq = simsearch.pq_topk_oracle_sql(n_queries=n_queries, k=k)
    return (
        "WITH ex AS (SELECT query_id, neighbor_id FROM "
        f"({exact})), "
        f"pqr AS (SELECT query_id, neighbor_id FROM ({pq})), "
        "j AS (SELECT e.query_id, CASE WHEN p.neighbor_id IS NOT NULL "
        "THEN 1 ELSE 0 END AS hit FROM ex e LEFT JOIN pqr p "
        "ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id) "
        "SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact, "
        "CAST(sum(hit) AS BIGINT) AS n_hit, "
        "CAST(sum(hit) AS BIGINT) / CAST(count(*) AS BIGINT) AS recall "
        "FROM j GROUP BY query_id")


def _near_dup_sql() -> str:
    """Banded-LSH cosine near-dup twin: same planes, same banding."""
    bw = simsearch.NEAR_DUP_BAND_PLANES
    planes = simsearch.plane_weights(simsearch.NEAR_DUP_BANDS * bw)

    def band_expr(ps):
        return " + ".join(
            "(CASE WHEN list_inner_product(v, "
            f"[{','.join(str(x) for x in planes[p])}]::DOUBLE[]) >= 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for i, p in enumerate(ps))

    bands = " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band, "
        f"{band_expr(range(b * bw, (b + 1) * bw))} AS sketch FROM e"
        for b in range(simsearch.NEAR_DUP_BANDS))
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        f"bs AS ({bands}), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
        "FROM bs a JOIN bs b ON a.band = b.band AND a.sketch = b.sketch "
        "AND a.vec_id < b.vec_id), "
        "sc AS (SELECT id_a, id_b, "
        "list_cosine_similarity(ea.v, eb.v) AS score FROM cand "
        "JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b) "
        f"SELECT id_a, id_b, round(score, 6) AS score_r FROM sc "
        f"WHERE score >= {simsearch.NEAR_DUP_TAU}")


def _lsh_bucket_sql() -> str:
    planes = simsearch.plane_weights()
    bucket = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(str(x) for x in w)}]::DOUBLE[]) >= 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p, w in enumerate(planes))
    return f"SELECT vec_id, {bucket} AS bucket FROM embeddings"


_HOST_EDGES_SQL = (
    "WITH ev AS (SELECT 'h' || CAST(user_id % 32 AS VARCHAR) AS src, "
    "'h' || CAST(event_id % 32 AS VARCHAR) AS dst FROM events), "
    "edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS weight "
    "FROM ev WHERE src <> dst GROUP BY 1, 2) ")


def _pagerank_sql(iters: int = graph.PR_ITERS) -> str:
    """Unrolled integer fixed-point power iteration — `//` is DuckDB
    BIGINT floor division, identical to Spark's DIV on the positive
    operands used here, so every rank is bit-identical."""
    sql = (_HOST_EDGES_SQL +
           ", outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out "
           "FROM edges GROUP BY 1), "
           "nodes AS (SELECT src AS host FROM edges "
           "UNION SELECT dst FROM edges), "
           f"r0 AS (SELECT host, CAST({graph.PR_SCALE} AS BIGINT) AS pr "
           "FROM nodes)")
    for k in range(1, iters + 1):
        sql += (
            f", r{k} AS (SELECT n.host, CAST({graph.PR_BASE} "
            "+ COALESCE(s.in_sum, 0) AS BIGINT) AS pr "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS host, CAST(sum("
            f"(r.pr * {graph.PR_DAMP_NUM} * e.weight) // "
            f"({graph.PR_DAMP_DEN} * o.w_out)) AS BIGINT) AS in_sum "
            "FROM edges e JOIN outw o ON o.src = e.src "
            f"JOIN r{k - 1} r ON r.host = e.src "
            "GROUP BY 1) s ON s.host = n.host)")
    return sql + f" SELECT host, pr AS pagerank_fp FROM r{iters}"


def _trustrank_sql(iters: int = graph.PR_ITERS) -> str:
    """_pagerank_sql with the teleport/base term gated on the fixture's
    trusted-host rule (graph.trusted_host: numeric id % 7 == 0)."""
    trusted = "CAST(substr({h}, 2) AS BIGINT) % 7 = 0"
    sql = (_HOST_EDGES_SQL +
           ", outw AS (SELECT src, CAST(sum(weight) AS BIGINT) AS w_out "
           "FROM edges GROUP BY 1), "
           "nodes AS (SELECT src AS host FROM edges "
           "UNION SELECT dst FROM edges), "
           f"r0 AS (SELECT host, CAST(CASE WHEN "
           f"{trusted.format(h='host')} THEN {graph.PR_SCALE} ELSE 0 END "
           "AS BIGINT) AS pr FROM nodes)")
    for k in range(1, iters + 1):
        sql += (
            f", r{k} AS (SELECT n.host, CAST(CASE WHEN "
            f"{trusted.format(h='n.host')} THEN {graph.PR_BASE} ELSE 0 END "
            "+ COALESCE(s.in_sum, 0) AS BIGINT) AS pr "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst AS host, CAST(sum("
            f"(r.pr * {graph.PR_DAMP_NUM} * e.weight) // "
            f"({graph.PR_DAMP_DEN} * o.w_out)) AS BIGINT) AS in_sum "
            "FROM edges e JOIN outw o ON o.src = e.src "
            f"JOIN r{k - 1} r ON r.host = e.src "
            "GROUP BY 1) s ON s.host = n.host)")
    return sql + f" SELECT host, pr AS pagerank_fp FROM r{iters}"


def _hits_sql(iters: int = graph.HITS_ITERS) -> str:
    """Unrolled HITS twin of graph.hits_hosts: each half-step is an
    integer weighted sum of the opposite score plus a max-normalizing
    `// mx` back to SCALE — sums and max of BIGINTs are reduction-
    order-independent and `//` matches Spark's DIV on these
    non-negative operands, so hub/authority are bit-identical."""
    def half(k, prev, src, dst):
        return (
            f", {k}raw AS (SELECT e.{dst} AS host, "
            f"CAST(sum(p.s * e.weight) AS BIGINT) AS raw "
            f"FROM edges e JOIN {prev} p ON p.host = e.{src} GROUP BY 1)"
            f", {k}mx AS (SELECT max(raw) AS mx FROM {k}raw)"
            f", {k} AS (SELECT n.host, CAST(COALESCE("
            f"(r.raw * {graph.PR_SCALE}) // m.mx, 0) AS BIGINT) AS s "
            f"FROM nodes n LEFT JOIN ({k}raw r CROSS JOIN {k}mx m) "
            "ON r.host = n.host)")

    sql = (_HOST_EDGES_SQL +
           ", nodes AS (SELECT src AS host FROM edges "
           "UNION SELECT dst FROM edges), "
           f"h0 AS (SELECT host, CAST({graph.PR_SCALE} AS BIGINT) AS s "
           "FROM nodes)")
    for k in range(1, iters + 1):
        sql += half(f"a{k}", f"h{k - 1}", "src", "dst")
        sql += half(f"h{k}", f"a{k}", "dst", "src")
    return (sql + f" SELECT h.host, h.s AS hub_fp, a.s AS authority_fp "
            f"FROM h{iters} h JOIN a{iters} a ON a.host = h.host")


def _corpus_select_sql() -> str:
    """corpus_select twin: the dup-cluster recursive chain extended
    with per-doc repetition, language and contamination CTEs, joined
    into one verdict row per document. Gate thresholds come from the
    same textops constants the Spark side uses."""
    g = " || ' ' || ".join(f"w[i+{k}]" for k in range(4))
    return (
        _dup_clusters_sql_cte() +
        ", tokc AS (SELECT doc_id, len(string_split(text, ' ')) "
        "AS n_tokens FROM documents), "
        "kb AS (SELECT lab.id AS doc_id, row_number() OVER ("
        "PARTITION BY lab.cluster_id "
        "ORDER BY tokc.n_tokens DESC, lab.id ASC) AS rn "
        "FROM lab JOIN tokc ON tokc.doc_id = lab.id), "
        "reptok AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS tok FROM documents), "
        "reptc AS (SELECT doc_id, tok, count(*) AS c FROM reptok "
        "GROUP BY 1, 2), "
        "rep AS (SELECT t.doc_id, "
        "count(*) / max(tokc.n_tokens) AS dtr, "
        "max(c) / max(tokc.n_tokens) AS ttf FROM reptc t "
        "JOIN tokc ON tokc.doc_id = t.doc_id GROUP BY t.doc_id), "
        f"langs AS (SELECT doc_id, {_lang_scores_sql()} FROM reptok "
        "GROUP BY doc_id), "
        "langp AS (SELECT doc_id, "
        "CASE WHEN score_en = greatest(score_de, score_en, score_fr) "
        "THEN 'en' WHEN score_de = greatest(score_de, score_en, score_fr) "
        "THEN 'de' ELSE 'fr' END AS pred_lang FROM langs), "
        "cw AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents WHERE len(string_split(text, ' ')) >= 4), "
        "cgh AS (SELECT DISTINCT doc_id, gh FROM (SELECT doc_id, "
        f"unnest(list_transform(range(1, len(w) - 2), i -> md5({g}))) "
        "AS gh FROM cw)), "
        "contam AS (SELECT DISTINCT c.doc_id FROM cgh c JOIN "
        "(SELECT DISTINCT gh FROM cgh WHERE doc_id % 97 = 0) b "
        "USING (gh) WHERE c.doc_id % 97 <> 0) "
        "SELECT d.doc_id, "
        f"(tokc.n_tokens BETWEEN {textops.CS_MIN_TOKENS} AND "
        f"{textops.CS_MAX_TOKENS}) AS keep_tokens, "
        f"(rep.dtr >= {textops.CS_MIN_DISTINCT_RATIO} AND "
        f"rep.ttf <= {textops.CS_MAX_TOP_TOKEN_FRAC}) "
        "AS keep_repetition, "
        "(d.lang = 'en' AND langp.pred_lang = 'en') AS keep_lang, "
        "(lab.id IS NULL OR kb.rn = 1) AS keep_dup, "
        "(contam.doc_id IS NULL AND d.doc_id % 97 <> 0) "
        "AS keep_decontam, "
        f"(tokc.n_tokens BETWEEN {textops.CS_MIN_TOKENS} AND "
        f"{textops.CS_MAX_TOKENS} "
        f"AND rep.dtr >= {textops.CS_MIN_DISTINCT_RATIO} "
        f"AND rep.ttf <= {textops.CS_MAX_TOP_TOKEN_FRAC} "
        "AND d.lang = 'en' AND langp.pred_lang = 'en' "
        "AND (lab.id IS NULL OR kb.rn = 1) "
        "AND contam.doc_id IS NULL AND d.doc_id % 97 <> 0) AS keep "
        "FROM documents d "
        "JOIN tokc ON tokc.doc_id = d.doc_id "
        "JOIN rep ON rep.doc_id = d.doc_id "
        "JOIN langp ON langp.doc_id = d.doc_id "
        "LEFT JOIN lab ON lab.id = d.doc_id "
        "LEFT JOIN kb ON kb.doc_id = d.doc_id "
        "LEFT JOIN contam ON contam.doc_id = d.doc_id")


def oracle_sql() -> dict[str, str]:
    mh = ", ".join(
        f"min(md5('{k}' || '|' || shingle)) AS mh{k}"
        for k in range(textops.MINHASH_PERMS))
    rows_per_band = textops.MINHASH_PERMS // textops.LSH_BANDS
    band_exprs = []
    for b in range(textops.LSH_BANDS):
        parts = " || '|' || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        band_exprs.append(f"({b}, md5({parts}))")

    stop_in = ",".join(f"'{s}'" for s in textops.STOPWORDS_EN)

    return {
        "crawl_stats": (
            "SELECT count(*) AS total_pages, "
            "CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS successful_pages, "
            "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS failed_pages FROM events"),
        "seen_anti_join": (
            "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"),
        "cuckoo_prefilter": (
            "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_custkey % 3 = 0)"),
        "fetch_join": (
            "SELECT o_orderkey, o_custkey, "
            "CASE WHEN c_custkey IS NULL THEN 404 ELSE 200 END "
            "AS status_code, c_mktsegment "
            "FROM (SELECT * FROM orders WHERE o_orderkey < 2000) o "
            "LEFT JOIN customer c ON c.c_custkey = o.o_custkey "
            "AND c.c_custkey % 7 <> 0"),
        "politeness_topk": (
            "SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM ("
            "SELECT o_custkey, o_orderkey, row_number() OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn "
            "FROM orders) WHERE rn <= 3"),
        "frontier_rank": (
            "SELECT crawl_ord, l_orderkey, l_linenumber, l_extendedprice "
            "FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, "
            "row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, "
            "l_linenumber) AS crawl_ord FROM lineitem) WHERE crawl_ord <= 100"),
        "first_seen_dedup": (
            "SELECT user_id, event_id, event_type FROM ("
            "SELECT user_id, event_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) "
            "WHERE rn = 1"),
        "host_counts": (
            "SELECT 'h' || CAST(user_id % 32 AS VARCHAR) AS host, "
            "count(*) AS n_events, min(value) AS min_value, "
            "max(value) AS max_value FROM events GROUP BY 1"),
        "host_link_edges": _HOST_EDGES_SQL + "SELECT * FROM edges",
        "pagerank_hosts": _pagerank_sql(),
        "trustrank_hosts": _trustrank_sql(),
        "host_reputation": (
            "WITH tr AS (SELECT host, pagerank_fp AS trustrank_fp "
            "FROM (" + _trustrank_sql() + ")), "
            "pr AS (" + _pagerank_sql() + "), "
            "roll AS (SELECT 'h' || CAST(doc_id % 32 AS VARCHAR) "
            "AS host, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS chars_sum "
            "FROM documents GROUP BY 1), "
            "j AS (SELECT tr.host, tr.trustrank_fp, pr.pagerank_fp, "
            "coalesce(roll.n_docs, 0) AS n_docs, "
            "coalesce(roll.chars_sum, 0) AS chars_sum "
            "FROM tr JOIN pr ON tr.host = pr.host "
            "LEFT JOIN roll ON tr.host = roll.host) "
            "SELECT host, trustrank_fp, pagerank_fp, n_docs, "
            "chars_sum, CASE WHEN n_docs > 0 THEN "
            "(chars_sum * 1000) // n_docs END AS mean_len_e3, "
            "CAST(row_number() OVER (ORDER BY trustrank_fp DESC, "
            "pagerank_fp DESC, host ASC) AS INT) AS crawl_priority "
            "FROM j"),
        "hits_hosts": _hits_sql(),
        "host_gini": graph.host_gini_oracle_sql(),
        "host_degree_stats": (
            _HOST_EDGES_SQL +
            ", o AS (SELECT src AS host, count(*) AS out_degree, "
            "CAST(sum(weight) AS BIGINT) AS out_weight "
            "FROM edges GROUP BY 1), "
            "i AS (SELECT dst AS host, count(*) AS in_degree, "
            "CAST(sum(weight) AS BIGINT) AS in_weight "
            "FROM edges GROUP BY 1) "
            "SELECT COALESCE(o.host, i.host) AS host, "
            "COALESCE(out_degree, 0) AS out_degree, "
            "COALESCE(out_weight, 0) AS out_weight, "
            "COALESCE(in_degree, 0) AS in_degree, "
            "COALESCE(in_weight, 0) AS in_weight "
            "FROM o FULL OUTER JOIN i ON o.host = i.host"),
        "pii_redact": (
            "WITH d AS (SELECT doc_id, text || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@mail' || "
            "CAST(doc_id % 7 AS VARCHAR) || '.com ip 10.' || "
            "CAST(doc_id % 200 AS VARCHAR) || '.0.' || "
            "CAST(doc_id % 250 AS VARCHAR) || ' tel +1-555-' || "
            "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text "
            "FROM documents), "
            "e AS (SELECT doc_id, len(regexp_extract_all(text, "
            f"'{textops.PII_EMAIL_RE}')) AS n_emails, "
            f"regexp_replace(text, '{textops.PII_EMAIL_RE}', "
            "'[EMAIL]', 'g') AS t1 FROM d), "
            "i AS (SELECT doc_id, n_emails, "
            f"len(regexp_extract_all(t1, '{textops.PII_IPV4_RE}')) "
            "AS n_ips, "
            f"regexp_replace(t1, '{textops.PII_IPV4_RE}', '[IP]', 'g') "
            "AS t2 FROM e) "
            "SELECT doc_id, n_emails, n_ips, "
            f"len(regexp_extract_all(t2, '{textops.PII_PHONE_RE}')) "
            "AS n_phones, "
            f"md5(regexp_replace(t2, '{textops.PII_PHONE_RE}', "
            "'[PHONE]', 'g')) AS redacted_md5 FROM i"),
        "paragraph_dedup": (
            "WITH a AS (SELECT doc_id, string_split(text, ' ') AS arr "
            "FROM documents), "
            "p AS (SELECT doc_id, CAST(i AS INT) AS pos, "
            "md5(array_to_string(list_slice(arr, (i-1)*8+1, (i-1)*8+8), "
            "' ')) AS para_hash FROM a, "
            "LATERAL (SELECT unnest(generate_series(1, "
            "CAST(ceil(len(arr)/8.0) AS BIGINT))) AS i) t) "
            "SELECT doc_id, pos, para_hash, "
            "row_number() OVER (PARTITION BY para_hash "
            "ORDER BY doc_id, pos) = 1 AS keep FROM p"),
        "corpus_select": _corpus_select_sql(),
        "warc_roundtrip": warc.warc_roundtrip_oracle_sql(),
        "warc_cdx": warc.warc_cdx_oracle_sql(),
        "sitemap_parse": sitemap.sitemap_parse_oracle_sql(),
        "stratified_sample": textops.stratified_sample_oracle_sql(),
        "export_shards": textops.export_shards_oracle_sql(),
        "mixture_sample": textops.mixture_sample_oracle_sql(),
        "epoch_shuffle": textops.epoch_shuffle_oracle_sql(),
        "redirect_chains": _scrapeops().redirect_chains_oracle_sql(),
        "dup_span_removal": textops.dup_span_removal_oracle_sql(),
        "trap_detect": _scrapeops().trap_detect_oracle_sql(),
        "charset_sniff": _charset_oracle(),
        "rarity_score": textops.rarity_score_oracle_sql(),
        "crawl_diff": _scrapeops().crawl_diff_oracle_sql(),
        "wet_extract": _wet_oracle(),
        "source_stats": textops.source_stats_oracle_sql(),
        "vocab_stats": textops.vocab_stats_oracle_sql(),
        "bm25_topk": textops.bm25_topk_oracle_sql(),
        "tokenize_ids": textops.tokenize_ids_oracle_sql(),
        "lsh_recall": _lsh_recall_sql(),
        "containment_pairs": textops.containment_pairs_oracle_sql(),
        "allpairs_jaccard": textops.allpairs_jaccard_oracle_sql(),
        "allpairs_containment": textops.allpairs_containment_oracle_sql(),
        "pack_windows": textops.pack_windows_oracle_sql(),
        "cms_token_counts": textops.cms_token_counts_oracle_sql(),
        "kmv_distinct": textops.kmv_distinct_oracle_sql(),
        "source_ngram_overlap": textops.source_ngram_overlap_oracle_sql(),
        "length_percentiles": textops.length_percentiles_oracle_sql(),
        "recrawl_schedule": _scrapeops().recrawl_schedule_oracle_sql(),
        "robots_sitemaps": (
            "WITH h AS (SELECT CAST(t.x AS BIGINT) AS hid, "
            "CASE WHEN t.x = 0 THEN 'hot.example.org' "
            "ELSE 'h' || t.x || '.example.org' END AS host "
            "FROM range(42) t(x)) "
            "SELECT host, CAST(0 AS INT) AS pos, "
            "'https://example.org/sitemap.xml' AS sitemap_url FROM h "
            "UNION ALL SELECT host, CAST(1 AS INT), "
            "'https://example.org/sitemap-news.xml' FROM h "
            "WHERE hid % 4 = 1"),
        "top_terms": (
            "WITH toks AS (SELECT doc_id, source, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "ft AS (SELECT * FROM toks WHERE term NOT IN ("
            + ", ".join(f"'{s}'" for s in textops.STOPWORDS_EN) + ")), "
            "tf AS (SELECT source, term, count(*) AS tf FROM ft "
            "GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM "
            "(SELECT DISTINCT doc_id, term FROM ft) GROUP BY 1), "
            "r AS (SELECT tf.source, tf.term, tf.tf, df.df, "
            "row_number() OVER (PARTITION BY tf.source "
            "ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank "
            "FROM tf JOIN df USING (term)) "
            f"SELECT * FROM r WHERE rank <= {textops.TOP_TERMS_K}"),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) "
            "AS DECIMAL(22,2)) * 100 AS BIGINT) AS sum_qty_e2, "
            "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
            "AS DECIMAL(22,2)) * 100 AS BIGINT) AS sum_base_price_e2, "
            "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(22,4)) * 10000 AS BIGINT) AS sum_disc_price_e4, "
            "count(*) AS count_order FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"),
        "broadcast_dim": (
            "SELECT r_name, n_name, count(*) AS n_customers FROM customer c "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r_name, n_name"),
        "budget_limit": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50"),
        "url_canonicalize": (
            f"WITH u AS (SELECT doc_id, {URL_SQL_DUCK} AS url "
            "FROM documents), "
            "c AS (SELECT doc_id, url, regexp_replace("
            "regexp_replace(url, '#.*$', ''), "
            "'^(https://[^/]+)/$', '\\1') AS url_canon FROM u) "
            "SELECT doc_id, url, url_canon, "
            "regexp_extract(url, '^https://([^/#?]+)', 1) AS host FROM c"),
        "pattern_filter": (
            f"WITH u AS (SELECT doc_id, {URL_SQL_DUCK} AS url "
            "FROM documents), "
            "p AS (SELECT doc_id, url, coalesce(nullif(regexp_extract("
            "url, '^https://[^/]+(/[^?#]*)', 1), ''), '/') AS path FROM u) "
            "SELECT doc_id, url FROM p WHERE path = '/blog' "
            "OR path LIKE '/blog/%' OR path = '/docs' OR path LIKE '/docs/%'"),
        "domain_scope": (
            f"WITH h AS (SELECT doc_id, {HOST_SQL} AS host FROM documents), "
            "s AS (SELECT doc_id, host, "
            "regexp_replace(host, '^www\\.', '') AS stripped FROM h) "
            "SELECT doc_id, host, stripped = 'h1.example.org' AS in_scope, "
            "(stripped = 'h1.example.org' OR stripped LIKE '%.h1.example.org'"
            " OR 'h1.example.org' LIKE '%.' || stripped) AS in_scope_subs "
            "FROM s"),
        "content_truncate": (
            "SELECT doc_id, CASE WHEN length(text) > 200 THEN "
            "substr(text, 1, 200) || '...[TRUNCATED]' ELSE text END "
            "AS content FROM documents"),
        "cache_key": (
            f"SELECT doc_id, translate({URL_SQL_DUCK}, ':/?&', '____') "
            "AS cache_key FROM documents"),
        "union_dedup": (
            "SELECT DISTINCT id FROM (SELECT user_id AS id FROM events "
            "UNION ALL SELECT o_custkey AS id FROM orders)"),
        "rollup_counts": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"),
        "json_extract": (
            "SELECT event_id, json_extract_string(props, '$.k') AS k "
            "FROM events"),
        "sessionize": (
            "WITH x AS (SELECT user_id, event_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "epoch_us(ts) - epoch_us(lag(ts) OVER w) >= "
            f"{SESSION_GAP_MIN} * 60 * 1000000 THEN 1 ELSE 0 END "
            "AS is_new FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT user_id, event_id, ts, value, "
            "sum(is_new) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS seq "
            "FROM x) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "min(value) AS min_value, max(value) AS max_value, "
            "epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us, "
            "CAST(seq AS INT) AS session_seq "
            "FROM y GROUP BY user_id, seq"),
        "time_buckets": (
            "SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events, "
            "min(event_id) AS first_event FROM events GROUP BY 1"),
        "label_centroids": (
            "WITH x AS (SELECT label, generate_subscripts(embedding, 1) "
            "AS pos, unnest(embedding) AS v FROM embeddings) "
            "SELECT label, pos, CAST(sum(CAST(CAST(CAST(v AS DOUBLE) "
            "AS DECIMAL(20,10)) * CAST(10000000000 AS DECIMAL(11,0)) "
            "AS BIGINT)) AS BIGINT) AS sum_v_e10, "
            "count(*) AS n FROM x WHERE pos <= 8 GROUP BY label, pos"),
        "ann_recall": _ann_recall_sql(),
        "label_pair_distances": (
            "WITH x AS (SELECT label, generate_subscripts(embedding, 1) "
            "AS pos, unnest(embedding) AS v FROM embeddings), "
            "g AS (SELECT label, pos, CAST(sum(CAST(CAST(CAST(v AS "
            "DOUBLE) AS DECIMAL(20,10)) * CAST(10000000000 AS "
            "DECIMAL(11,0)) AS BIGINT)) AS BIGINT) AS s, count(*) AS n "
            "FROM x GROUP BY label, pos), "
            "cd AS (SELECT label, pos, CAST(s AS DOUBLE) / "
            "(n * 10000000000) AS c FROM g), "
            "t AS (SELECT a.label AS label_a, b.label AS label_b, "
            "a.pos AS pos, (a.c - b.c) * (a.c - b.c) AS tt "
            "FROM cd a JOIN cd b ON a.pos = b.pos AND a.label < b.label) "
            "SELECT label_a, label_b, sum(tt ORDER BY pos) AS dist2, "
            "sqrt(sum(tt ORDER BY pos)) AS dist FROM t "
            "GROUP BY label_a, label_b"),
        "token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) "
            "AS n_tokens, CAST(length(text) AS INT) AS len_chars "
            "FROM documents"),
        "bpe_token_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS INT) "
            "AS n_bpe_pieces, "
            "CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens "
            "FROM documents"),
        "quality_score": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) "
            "AS tok FROM documents) "
            "SELECT doc_id, count(*) AS n_tokens, "
            f"CAST(sum(CASE WHEN tok IN ({stop_in}) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_stopwords, "
            f"CAST(sum(CASE WHEN tok IN ({stop_in}) THEN 1 ELSE 0 END) "
            "AS BIGINT) / count(*) AS stopword_ratio, "
            "CAST(sum(length(tok)) AS BIGINT) / count(*) AS avg_token_len "
            "FROM toks GROUP BY doc_id"),
        "gopher_quality": (
            "WITH d AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), "
            "w -> w <> '') AS ws, "
            "string_split(text, chr(10)) AS lns FROM documents), "
            "s AS (SELECT doc_id, "
            "CAST(len(ws) AS BIGINT) AS n_words, "
            "CAST(len(lns) AS BIGINT) AS n_lines, "
            "CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)"
            " AS BIGINT) AS sum_len, "
            "CAST(len(list_filter(ws, w -> "
            "regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha, "
            "CAST(len(list_filter(ws, w -> contains(w, '#') OR "
            "contains(w, '...') OR contains(w, '…'))) AS BIGINT) "
            "AS n_symbol, "
            "CAST(len(list_filter(lns, l -> "
            "regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS n_bullet, "
            "CAST(len(list_filter(lns, l -> "
            "regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS BIGINT) "
            "AS n_ellipsis FROM d), "
            "o AS (SELECT doc_id, n_words, n_lines, "
            "CASE WHEN n_words = 0 THEN NULL ELSE sum_len / n_words END "
            "AS mean_word_len, "
            "CASE WHEN n_words = 0 THEN NULL ELSE n_alpha / n_words END "
            "AS alpha_ratio, "
            "CASE WHEN n_words = 0 THEN NULL ELSE n_symbol / n_words END "
            "AS symbol_ratio, "
            "n_bullet / n_lines AS bullet_ratio, "
            "n_ellipsis / n_lines AS ellipsis_ratio FROM s) "
            "SELECT o.*, CAST(coalesce(n_words >= 50 AND "
            "n_words <= 100000 AND mean_word_len >= 3 AND "
            "mean_word_len <= 10 AND symbol_ratio <= 0.1 AND "
            "alpha_ratio >= 0.8 AND bullet_ratio <= 0.9 AND "
            "ellipsis_ratio <= 0.3, FALSE) AS INT) AS gopher_pass "
            "FROM o"),
        "c4_line_filter": (
            "WITH d AS (SELECT doc_id, text, "
            "string_split(text, chr(10)) AS lns FROM documents), "
            "s AS (SELECT doc_id, "
            "CAST(len(lns) AS BIGINT) AS n_lines, "
            "CAST(len(list_filter(lns, l -> "
            "regexp_matches(l, '[.!?\"]\\s*$') AND "
            "len(list_filter(regexp_split_to_array(l, '\\s+'), "
            "w -> w <> '')) >= 5 "
            "AND NOT contains(lower(l), 'javascript'))) AS BIGINT) "
            "AS kept_lines, "
            "CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 "
            "ELSE 0 END AS has_lorem, "
            "CASE WHEN contains(text, '{') THEN 1 ELSE 0 END "
            "AS has_brace FROM d) "
            "SELECT doc_id, n_lines, kept_lines, "
            "kept_lines / n_lines AS kept_ratio, has_lorem, has_brace, "
            "CAST((kept_lines >= 3 AND has_lorem = 0 AND has_brace = 0) "
            "AS INT) AS c4_pass FROM s"),
        "lang_id": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) "
            "AS tok FROM documents), "
            f"s AS (SELECT doc_id, {_lang_scores_sql()} FROM toks "
            "GROUP BY doc_id) "
            "SELECT doc_id, score_de, score_en, score_fr, "
            "CASE WHEN score_en = greatest(score_de, score_en, score_fr) "
            "THEN 'en' WHEN score_de = greatest(score_de, score_en, score_fr)"
            " THEN 'de' ELSE 'fr' END AS pred_lang FROM s"),
        "fingerprint": (
            "SELECT doc_id, md5(text) AS fp, "
            "md5(substring(text, 1, 40)) AS fp_prefix40 FROM documents"),
        "exact_dedup": (
            "SELECT fp, count(*) AS dup_count, min(doc_id) AS keep_doc_id "
            "FROM (SELECT doc_id, md5(substring(text,1,16)) AS fp "
            "FROM documents) GROUP BY fp HAVING count(*) > 1"),
        "doc_shingles": _minhash_sql_core() + " SELECT doc_id, shingle FROM sh",
        "minhash_signatures": (
            _minhash_sql_core() +
            f" SELECT doc_id, {mh} FROM sh GROUP BY doc_id"),
        "minhash_lsh_pairs": (
            _minhash_sql_core() + ", "
            f"sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
            "bands AS (" + " UNION ALL ".join(
                "SELECT doc_id, {b} AS band_id, md5({cat}) AS bh FROM sig"
                .format(b=b, cat=" || '|' || ".join(
                    f"mh{b * rows_per_band + r}"
                    for r in range(rows_per_band)))
                for b in range(textops.LSH_BANDS)) + ") "
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM bands a JOIN bands b ON a.band_id = b.band_id "
            "AND a.bh = b.bh AND a.doc_id < b.doc_id"),
        "lsh_verified_pairs": (
            _verified_pairs_sql_cte() +
            " SELECT doc_a, doc_b, n_inter, jaccard FROM vp"),
        "dup_clusters": (
            _dup_clusters_sql_cte() +
            " SELECT id AS doc_id, cluster_id, "
            "count(*) OVER (PARTITION BY cluster_id) AS cluster_size "
            "FROM lab"),
        "repetition_stats": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents), "
            "toks AS (SELECT doc_id, len(w) AS n_tokens, unnest(w) AS tok "
            "FROM d), "
            "tc AS (SELECT doc_id, n_tokens, tok, count(*) AS c FROM toks "
            "GROUP BY 1, 2, 3), "
            "ts AS (SELECT doc_id, n_tokens, count(*) AS n_distinct, "
            "max(c) AS top_c FROM tc GROUP BY 1, 2), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), "
            "i -> w[i] || ' ' || w[i+1])) AS b FROM d WHERE len(w) >= 2), "
            "bs AS (SELECT doc_id, max(c) AS top_bg_c FROM "
            "(SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2) "
            "GROUP BY 1) "
            "SELECT ts.doc_id, CAST(n_tokens AS INT) AS n_tokens, "
            "n_distinct / n_tokens AS distinct_token_ratio, "
            "top_c / n_tokens AS top_token_frac, "
            "top_bg_c / (n_tokens - 1) AS top_bigram_frac "
            "FROM ts LEFT JOIN bs ON bs.doc_id = ts.doc_id"),
        "decontam_overlap": (
            "WITH w4 AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents WHERE len(string_split(text, ' ')) >= 4), "
            "g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-2), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]"
            ")) AS gram FROM w4), "
            "gh AS (SELECT DISTINCT doc_id, md5(gram) AS gh FROM g), "
            "bench AS (SELECT DISTINCT gh, doc_id AS bench_doc_id FROM gh "
            "WHERE doc_id % 97 = 0), "
            "corp AS (SELECT doc_id, gh FROM gh WHERE doc_id % 97 <> 0) "
            "SELECT c.doc_id, count(DISTINCT c.gh) AS n_hits, "
            "count(DISTINCT b.bench_doc_id) AS n_bench_docs "
            "FROM corp c JOIN bench b USING (gh) GROUP BY 1"),
        "dedup_keep_best": (
            _dup_clusters_sql_cte() +
            ", tc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) "
            "AS INT) AS n_tokens FROM documents), "
            "ranked AS (SELECT lab.cluster_id, lab.id AS doc_id, "
            "tc.n_tokens, "
            "row_number() OVER (PARTITION BY lab.cluster_id "
            "ORDER BY tc.n_tokens DESC, lab.id ASC) AS rn, "
            "count(*) OVER (PARTITION BY lab.cluster_id) AS cluster_size "
            "FROM lab JOIN tc ON tc.doc_id = lab.id) "
            "SELECT cluster_id, doc_id AS keep_doc_id, cluster_size, "
            "n_tokens FROM ranked WHERE rn = 1"),
        "parse_prep": (
            "WITH p AS (SELECT doc_id % 50 AS job_id, doc_id, "
            "CASE WHEN length(r) > 15000 THEN substr(r, 1, 15000) || "
            "'...[TRUNCATED]' ELSE r END AS content FROM "
            "(SELECT doc_id, repeat(text || ' ', 40) AS r "
            "FROM documents)), "
            "n AS (SELECT job_id, doc_id, content, row_number() OVER ("
            "PARTITION BY job_id ORDER BY doc_id) AS rn FROM p) "
            "SELECT job_id, count(*) AS n_sources, "
            "CAST(sum(length(content)) AS BIGINT) AS total_chars, "
            "md5(string_agg('=== SOURCE ' || rn || ': doc-' || doc_id || "
            "' ===' || chr(10) || content || chr(10) || chr(10), '' "
            "ORDER BY doc_id)) AS prompt_md5 "
            "FROM n GROUP BY job_id"),
        "ngram_jaccard": (
            "WITH sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(range(1, len(w)-1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle "
            "FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents "
            "WHERE doc_id < 200 AND len(string_split(text,' ')) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),"
            " inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS n_inter FROM sh a JOIN sh b ON a.shingle = b.shingle"
            " AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, n_inter, "
            "n_inter / (sa.n + sb.n - n_inter) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8"),
        "simhash": _simhash_sql(),
        "simhash_near_dup": _simhash_near_dup_sql(),
        "simhash_clusters": _simhash_clusters_sql(),
        "winnow_fingerprints": _winnow_sql(),
        "dup_span_stats": _dup_span_sql(),
        "multi_signal_clusters": _multi_signal_clusters_sql(),
        "dedup_rate_by_source": (
            f"WITH mc AS ({_multi_signal_clusters_sql()}) "
            "SELECT d.source, count(*) AS n_docs, "
            "CAST(sum(CASE WHEN mc.doc_id IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_dup_docs, "
            "sum(CASE WHEN mc.doc_id IS NOT NULL THEN 1 ELSE 0 END) "
            "/ count(*) AS dup_rate "
            "FROM documents d LEFT JOIN mc ON mc.doc_id = d.doc_id "
            "GROUP BY d.source"),
        "media_metadata": (
            "SELECT doc_id, "
            "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' "
            "WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format, "
            "CAST(16 + doc_id % 48 AS INT) AS width, "
            "CAST(16 + (doc_id * 7) % 48 AS INT) AS height "
            "FROM documents"),
        "media_digest": (
            "SELECT doc_id, "
            "CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes, "
            "md5(text) AS digest FROM documents"),
        # pixel-path multimodal: the oracle recomputes pixels from the
        # gradient fixture's a-priori formula (doc_id + 3x + 5y) % 251
        # with dims (16 + doc_id%48, 16 + 7*doc_id%48) — fully
        # independent of the PNG codec the Spark UDF exercises
        "media_resize": (
            "WITH px AS (SELECT d.doc_id, "
            "(d.doc_id + 3*((tx.x * (16 + d.doc_id % 48)) // 8) "
            " + 5*((ty.y * (16 + (d.doc_id * 7) % 48)) // 8)) % 251 AS v "
            "FROM documents d, range(8) tx(x), range(8) ty(y)) "
            "SELECT doc_id, CASE WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'png' END AS format, CAST(8 AS INT) AS width, "
            "CAST(8 AS INT) AS height, CAST(min(v) AS INT) AS px_min, "
            "CAST(max(v) AS INT) AS px_max FROM px GROUP BY doc_id"),
        "media_features": (
            "WITH px AS (SELECT d.doc_id, "
            "(16 + d.doc_id % 48) AS w, (16 + (d.doc_id * 7) % 48) AS h, "
            "(d.doc_id + 3*tx.x + 5*ty.y) % 251 AS v "
            "FROM documents d, range(64) tx(x), range(64) ty(y) "
            "WHERE tx.x < (16 + d.doc_id % 48) "
            "AND ty.y < (16 + (d.doc_id * 7) % 48)) "
            "SELECT doc_id, CASE WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'png' END AS format, CAST(w AS INT) AS width, "
            "CAST(h AS INT) AS height, CAST(w * h AS INT) AS n_px, "
            "CAST(sum(v) AS BIGINT) AS px_sum, "
            "CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max "
            "FROM px GROUP BY doc_id, w, h"),
        # F5 robots.txt parser: the oracle re-derives the rule rows
        # from the fixture's a-priori pattern (hot host = hid 0;
        # even hids: the specific agent group shades '*')
        # the delay-budget fold (even hids carry Crawl-delay
        # (1 + hid%5) s; B_eff = min(10, intceil(10000 / delay_ms)))
        "politeness_budget": (
            "WITH h AS (SELECT CAST(t.x AS BIGINT) AS hid, "
            "CASE WHEN t.x = 0 THEN 'hot.example.org' "
            "ELSE 'h' || t.x || '.example.org' END AS host "
            "FROM range(42) t(x)) "
            "SELECT host, CAST(least(10, (10000 + d - 1) // d) AS INT) "
            "AS max_parallel FROM (SELECT host, "
            "(1 + hid % 5) * 1000 AS d FROM h WHERE hid % 2 = 0)"),
        "parse_robots": (
            "WITH h AS (SELECT CAST(t.x AS BIGINT) AS hid, "
            "CASE WHEN t.x = 0 THEN 'hot.example.org' "
            "ELSE 'h' || t.x || '.example.org' END AS host "
            "FROM range(42) t(x)) "
            "SELECT host, 'disallow' AS kind, CAST(0 AS INT) AS pos, "
            "CASE WHEN hid % 2 = 0 THEN '/news/' ELSE '/product/' END "
            "AS value FROM h "
            "UNION ALL SELECT host, 'allow', CAST(0 AS INT), "
            "'/product/open' FROM h WHERE hid % 2 = 1 "
            "UNION ALL SELECT host, 'crawl_delay_ms', CAST(0 AS INT), "
            "CAST((1 + hid % 5) * 1000 AS VARCHAR) FROM h "
            "WHERE hid % 2 = 0"),
        "audio_metadata": (
            "WITH p AS (SELECT doc_id, "
            "CAST(1 + doc_id % 2 AS INT) AS channels, "
            "CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 "
            "WHEN 1 THEN 16000 WHEN 2 THEN 22050 ELSE 44100 END AS INT) "
            "AS sample_rate, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS INT) "
            "AS bits, "
            "CAST(256 + (doc_id * 13) % 1024 AS INT) AS n_samples "
            "FROM documents) "
            "SELECT doc_id, channels, sample_rate, bits, n_samples, "
            "CAST(n_samples * 1000 // sample_rate AS INT) AS duration_ms "
            "FROM p"),
        "frame_sample": (
            "WITH f AS (SELECT d.doc_id, CAST(t.f AS INT) AS frame_idx, "
            "(16 + d.doc_id % 48) AS w, (16 + (d.doc_id * 7) % 48) AS h "
            "FROM documents d, range(10) t(f) "
            "WHERE t.f < 4 + d.doc_id % 7 AND t.f % 2 = 0) "
            "SELECT doc_id, frame_idx, CAST(w AS INT) AS width, "
            "CAST(h AS INT) AS height, "
            "CAST((doc_id + frame_idx) % 251 AS INT) AS px_first, "
            "CAST((doc_id + frame_idx + w * h - 1) % 251 AS INT) "
            "AS px_last FROM f"),
        "cosine_topk": _cosine_sql(ann=False),
        "lsh_buckets": _lsh_bucket_sql(),
        "lsh_topk": _cosine_sql(ann=True),
        "ivf_topk": _ivf_sql(),
        "cosine_near_dup": _near_dup_sql(),
        # int8 scalar quantization: two IEEE ops + floor per element,
        # maxabs/sums order-independent — bit-identical (see
        # simsearch.embedding_quantize docstring)
        "embedding_quantize": (
            "WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
            "FROM embeddings), "
            "m AS (SELECT vec_id, e, "
            "list_max(list_transform(e, x -> abs(x))) AS maxabs FROM d), "
            "qv AS (SELECT vec_id, maxabs, CASE WHEN maxabs = 0 "
            "THEN list_transform(e, x -> CAST(0 AS BIGINT)) "
            "ELSE list_transform(e, x -> CAST(floor((x * 127.0) / maxabs) "
            "AS BIGINT)) END AS q FROM m) "
            "SELECT vec_id, maxabs, "
            "md5(array_to_string(q, ',')) AS q_digest, "
            "CAST(list_sum(q) AS BIGINT) AS q_sum, "
            "CAST(list_min(q) AS BIGINT) AS q_min, "
            "CAST(list_max(q) AS BIGINT) AS q_max, "
            "CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) "
            "AS n_sat FROM qv"),
        "pq_codes": simsearch.pq_codes_oracle_sql(),
        "pq_topk": simsearch.pq_topk_oracle_sql(),
        "pq_recall": _pq_recall_sql(),
        # The iterative crawl and the UDF-kernel scrape are not
        # SQL-expressible, but their expected outputs ARE computable a
        # priori by the independent pure-Python oracle (oracle.py);
        # scripts/make_goldens.py freezes them to parquet at fixture-
        # build time so the driver gets a full value-hash check.
        "crawl_trace": (
            "SELECT crawl_ord, iter, depth, url, status_code FROM "
            f"'{_GOLDENS}/crawl_trace_sf001.parquet'"),
        # lineage marginal == the independent trace golden's per-wave
        # cardinality (every engine-written result row accounted for)
        "crawl_lineage": (
            "SELECT iter, CAST(count(*) AS BIGINT) AS n_results FROM "
            f"'{_GOLDENS}/crawl_trace_sf001.parquet' GROUP BY iter"),
        "scrape_markdown": (
            "SELECT url, status_code, success, title, discovered FROM "
            f"'{_GOLDENS}/scrape_markdown_sf001.parquet'"),
        # anchor-text corpus: golden enumerated a priori from the page
        # TEMPLATE (nav sections + _link_specs), no html parsed —
        # scripts/make_goldens.py:golden_anchor_text
        "anchor_text": (
            "SELECT target_url, n_refs, n_sources, n_texts, top_text, "
            f"top_count FROM '{_GOLDENS}/anchor_text_sf001.parquet'"),
        # J3 scrape cache: golden from TWO independent oracle runs +
        # the pure cache-membership rule (no engine involvement)
        "scrape_cache_hits": (
            "SELECT url, crawl_ord, status_code, title, cache_hit FROM "
            f"'{_GOLDENS}/scrape_cache_hits_sf001.parquet'"),
        # F8/A4: the scrape-service diagnostics are pure predicate
        # algebra — the twin re-expresses isCloudflareBlocked /
        # hasSignificantContentChange directly in SQL.
        "cloudflare_detect": (
            "WITH r AS (SELECT doc_id, "
            f"{_CF_STATUS_SQL} AS status_code, "
            f"{_CF_TITLE_SQL.replace('AS STRING', 'AS VARCHAR')} AS title, "
            f"{_CF_CONTENT_SQL} AS content FROM documents) "
            "SELECT doc_id, status_code = 403 AND ("
            "contains(title, 'Just a moment') "
            "OR contains(title, 'Checking your browser') "
            "OR contains(title, 'Attention Required') "
            "OR (contains(content, 'Waiting for') "
            "    AND contains(content, 'to respond')) "
            "OR (contains(content, 'Cloudflare') "
            "    AND contains(content, 'Ray ID'))) AS cf_blocked FROM r"),
        "js_change_detect": (
            f"WITH s AS (SELECT doc_id, {_SIG_PAIR_SQL} FROM documents) "
            "SELECT doc_id, ("
            "(CASE WHEN i_text > 0 THEN (f_text - i_text) * 10 > i_text * 3 "
            " ELSE f_text > 200 END) "
            "OR (f_elem - i_elem) > 50 "
            "OR (i_async - f_async) > 0 "
            "OR (f_link - i_link) > 5 "
            "OR (i_hash <> f_hash AND f_text > i_text + 100)) AS changed "
            "FROM s"),
        # A4 signature kernel: golden parquet (the same pure-Python
        # kernel run outside Spark by scripts/make_goldens.py)
        "content_signature": (
            "SELECT url, text_length, element_count, link_count, "
            "async_load_indicators, content_hash FROM "
            f"'{_GOLDENS}/content_signature_sf001.parquet'"),
        # S3 retry ladder: strategy CASE + the profile constants as a
        # generated CASE (single source of truth: fetchprofiles.PROFILES)
        "retry_ladder": _retry_ladder_sql(),
        # A5 token accumulation over the parse_prep jobs
        "parse_tokens": (
            "WITH p AS (SELECT doc_id % 50 AS job_id, "
            "CASE WHEN length(r) > 15000 THEN substr(r, 1, 15000) || "
            "'...[TRUNCATED]' ELSE r END AS content FROM "
            "(SELECT doc_id, repeat(text || ' ', 40) AS r "
            "FROM documents)) "
            "SELECT job_id, count(*) AS pages_processed, "
            "CAST((sum(length(content)) + 3) // 4 AS BIGINT) "
            "AS input_tokens, "
            "CAST(2000 AS BIGINT) AS output_budget, "
            "CAST((sum(length(content)) + 3) // 4 + 2000 AS BIGINT) "
            "AS total_budget FROM p GROUP BY job_id"),
        # GET /parse/templates|examples static catalog: hand-written
        # literal twin (the constants ARE the spec,
        # parse/service.go:1048-1083)
        "parse_templates": (
            "SELECT * FROM (VALUES "
            "('example', 'blog_crawl_streaming', CAST(NULL AS VARCHAR), "
            "'Crawl https://example.com/blog and stream the latest posts', "
            '\'{"properties":{"date":{"type":"string"},"title":'
            '{"type":"string"},"url":{"type":"string"}},"type":"object"}\'),'
            " ('example', 'product_scrape_single', CAST(NULL AS VARCHAR), "
            "'Extract product details from "
            "https://shop.example.com/product/123', "
            '\'{"properties":{"name":{"type":"string"},"price":'
            '{"type":"number"}},"type":"object"}\'),'
            " ('template', 'intelligent_workflow', 'AI-powered parsing "
            "with automatic scrape/crawl detection', CAST(NULL AS VARCHAR), "
            "CAST(NULL AS VARCHAR)),"
            " ('template', 'schema_extraction', 'Structured data "
            "extraction with custom JSON schemas', CAST(NULL AS VARCHAR), "
            "CAST(NULL AS VARCHAR)),"
            " ('template', 'streaming_processing', 'Real-time streaming "
            "workflow for large crawling operations', CAST(NULL AS VARCHAR),"
            " CAST(NULL AS VARCHAR))"
            ") AS t(kind, name, description, prompt, schema_json)"),
        # S8 screenshot artifacts: golden parquet (same pure renderer)
        "screenshot_artifacts": (
            "SELECT url, device, viewport_w, viewport_h, format, name, "
            "n_bytes, digest FROM "
            f"'{_GOLDENS}/screenshot_artifacts_sf001.parquet'"),
        # §2.9 stateful streaming, batch projection: the first-seen
        # operator's emitted url set == DISTINCT of the event urls
        "stream_first_seen": (
            "SELECT DISTINCT 'https://s' || CAST(doc_id % 211 AS VARCHAR)"
            " || '.example.org/p' || CAST(doc_id % 211 AS VARCHAR) AS url"
            " FROM documents"),
        "stream_host_budget": (
            "SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) AS host, "
            "CAST(LEAST(7, count(*)) AS BIGINT) AS n_admitted, "
            "CAST(count(*) - LEAST(7, count(*)) AS BIGINT) AS n_deferred "
            "FROM documents GROUP BY 1"),
    }
