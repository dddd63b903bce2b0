"""J3 scrape-cache semantics: cache-hit crawls are bit-identical to
fresh crawls (extraction is a pure function of html), and
params.fresh bypasses the cache (scrape/service.go:64-69,
583-614)."""

from pyspark.sql import functions as F

from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds


def _trace(run):
    return [tuple(r) for r in run.trace.collect()]


def test_cached_run_equals_fresh_run(spark, web):
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=30)

    first = run_crawl(spark, pages_df, seeds, params)
    cache = first._results_all()  # includes discovery column

    second = run_crawl(spark, pages_df, seeds, params, scrape_cache=cache)
    assert _trace(second) == _trace(first)
    a = {r.url: (r.markdown, r.text, list(r.links or []))
         for r in first.results.collect()}
    b = {r.url: (r.markdown, r.text, list(r.links or []))
         for r in second.results.collect()}
    assert a == b
    for k in ("total_pages", "successful_pages", "failed_pages"):
        assert second.stats[k] == first.stats[k]


def test_fresh_bypasses_cache(spark, web):
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=1)
    params = CrawlParams(depth=1, link_limit=10, fresh=True)
    first = run_crawl(spark, pages_df, seeds,
                      CrawlParams(depth=1, link_limit=10))
    # poison the cache: if it were consulted, titles would differ
    poisoned = first._results_all().withColumn(
        "title", F.lit("CACHED-POISON"))
    run = run_crawl(spark, pages_df, seeds, params, scrape_cache=poisoned)
    titles = {r.title for r in run.results.collect()}
    assert "CACHED-POISON" not in titles


def test_cache_consulted_when_not_fresh(spark, web):
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=1)
    base = CrawlParams(depth=1, link_limit=10)
    first = run_crawl(spark, pages_df, seeds, base)
    poisoned = first._results_all().withColumn(
        "title", F.lit("CACHED-POISON"))
    run = run_crawl(spark, pages_df, seeds, base, scrape_cache=poisoned)
    titles = {r.title for r in run.results.collect()}
    assert "CACHED-POISON" in titles
