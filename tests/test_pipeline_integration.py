"""End-to-end integration: the crawl engine's output IS the training
pipeline's input. Crawl the synthetic web, then run the corpus ops
(exact dedup -> split -> shard-export digest) over the crawled text
and check every number against an independent pandas recomputation
from the crawl oracle's results."""

import hashlib

from pyspark.sql import functions as F

from supacrawler_spark.oracle import crawl_oracle
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds


def _bucket(salt: str, key: str) -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:4],
               16) % 100


def test_crawl_feeds_training_pipeline(spark, web):
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=3)
    params = CrawlParams(depth=3, link_limit=60)
    run = run_crawl(spark, pages_df, seeds, params)

    corpus = run.results.select("url", "text").filter(
        F.col("text").isNotNull())

    # 1. exact dedup over crawled text (keep first url per digest)
    dedup = (corpus.withColumn("d", F.md5("text"))
             .groupBy("d").agg(F.count("*").alias("n"),
                               F.min("url").alias("keeper")))

    # 2. salted-hash split on the url key (stable across engines)
    split = corpus.select(
        "url", (F.conv(F.substring(
            F.md5(F.concat(F.lit("split|"), F.col("url"))), 1, 4),
            16, 10).cast("int") % 100 < 90).alias("train"))

    # 3. export digest over the kept docs in url order
    digest = (corpus.agg(F.md5(F.concat_ws("", F.transform(
        F.sort_array(F.collect_list(F.struct("url", "text"))),
        lambda s: F.md5(s["text"])))).alias("dg")).collect()[0].dg)

    # independent recomputation from the ORACLE's crawl results
    orc = crawl_oracle(pages_local, seeds, params)
    texts = {u: rec["text"] for u, rec in orc.pages.items()
             if rec.get("text") is not None}
    assert {r.keeper for r in dedup.collect()} <= set(texts)
    exp_groups = {}
    for u, t in texts.items():
        exp_groups.setdefault(hashlib.md5(t.encode()).hexdigest(),
                              []).append(u)
    got_groups = {r.d: r.n for r in dedup.collect()}
    assert got_groups == {d: len(us) for d, us in exp_groups.items()}

    exp_train = {u: _bucket("split|", u) < 90 for u in texts}
    assert {r.url: r.train for r in split.collect()} == exp_train

    exp_digest = hashlib.md5("".join(
        hashlib.md5(texts[u].encode()).hexdigest()
        for u in sorted(texts)).encode()).hexdigest()
    assert digest == exp_digest
