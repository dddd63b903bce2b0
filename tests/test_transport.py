"""The injectable live-fetch seam (S2/S3, transport.py):

1. a MockTransport serving the corpus is crawl-identical to the
   corpus join (same trace, same bytes) — the live path differs only
   in where the bytes come from;
2. the F9 attempt column drives the S3 retry ladder THROUGH the
   transport: a url served only under the mobile_device strategy
   (attempt 1) fails once, retries, and succeeds on the second
   attempt.
"""

from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds
from supacrawler_spark.transport import MockTransport


def _trace(run):
    return [tuple(r) for r in run.trace.collect()]


def test_mock_transport_equals_corpus_join(spark, web):
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=3, link_limit=60)

    base = run_crawl(spark, pages_df, seeds, params)
    live = run_crawl(spark, pages_df, seeds, params,
                     transport=MockTransport(pages_local))
    assert _trace(live) == _trace(base)
    a = {r.url: (r.markdown, r.text, list(r.links or []), r.title)
         for r in base.results.collect()}
    b = {r.url: (r.markdown, r.text, list(r.links or []), r.title)
         for r in live.results.collect()}
    assert a == b
    for k in ("total_pages", "successful_pages", "failed_pages"):
        assert live.stats[k] == base.stats[k]


def test_attempt_column_drives_ladder_through_transport(spark, web):
    from collections import Counter

    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=1)
    # make the seed's first same-host link flaky: present in the
    # corpus but served only under the attempt-1 strategy
    base = run_crawl(spark, pages_df, seeds, CrawlParams(depth=1))
    flaky = sorted(
        r.url for r in base.results.collect() if r.depth == 1)[:1]
    assert flaky, "need a depth-1 fetched url to make flaky"

    run = run_crawl(
        spark, pages_df, seeds,
        CrawlParams(depth=2, link_limit=40, retry_failures=True),
        transport=MockTransport(
            pages_local,
            require_strategy={flaky[0]: "mobile_device"}))
    tr = _trace(run)
    counts = Counter(t[3] for t in tr)
    assert counts[flaky[0]] == 2, "flaky url must be attempted twice"
    ok = {r.url for r in run.results.collect()}
    assert flaky[0] in ok, \
        "second attempt (mobile_device strategy) must succeed"


def test_transport_with_scrape_cache(spark, web):
    """Transport and scrape-cache compose: cache hits bypass the
    transport entirely; misses fetch through it. The combined run is
    bit-identical to the plain corpus-join crawl."""
    from pyspark.sql import functions as F

    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=30)
    base = run_crawl(spark, pages_df, seeds, params)

    # cache from the base run, poisoned so hits are detectable;
    # transport serving the corpus handles the misses
    poisoned = base._results_all().withColumn(
        "title", F.concat(F.lit("CACHED:"), F.col("title")))
    run = run_crawl(spark, pages_df, seeds, params,
                    scrape_cache=poisoned,
                    transport=MockTransport(pages_local))
    assert _trace(run) == _trace(base)
    titles = {r.title for r in run.results.collect()}
    assert any(t and t.startswith("CACHED:") for t in titles), \
        "cache must serve hits"
