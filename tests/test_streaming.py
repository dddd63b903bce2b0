"""Structured Streaming layer over the crawl state (SURVEY.md §2.9)."""

import os
import shutil
import tempfile

from supacrawler_spark import streaming as S
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds


def test_stream_results_and_stats(spark, web):
    pages_df, _, n_docs = web
    state = tempfile.mkdtemp(prefix="stream_test_")
    try:
        run = run_crawl(spark, pages_df, gen_seeds(n_docs, k=2),
                        CrawlParams(depth=2, link_limit=25),
                        state_dir=state)
        ck = tempfile.mkdtemp(prefix="ck_res_")
        rows = S.run_available_now(S.stream_results(spark, state), ck)
        assert len(rows) == run.stats["urls_scheduled"]

        ck2 = tempfile.mkdtemp(prefix="ck_stats_")
        stats = S.run_available_now(S.stream_stats(spark, state), ck2,
                                    output_mode="complete")
        last = stats[-1]
        assert last.successful_pages >= run.stats["successful_pages"]
        assert last.total_pages == run.stats["urls_scheduled"]
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_stream_host_windows_watermark(spark, web):
    pages_df, _, n_docs = web
    state = tempfile.mkdtemp(prefix="stream_hw_")
    try:
        run_crawl(spark, pages_df, gen_seeds(n_docs, k=2),
                  CrawlParams(depth=2, link_limit=20), state_dir=state)
        ck = tempfile.mkdtemp(prefix="ck_hw_")
        # complete mode: append would only emit watermark-finalized
        # windows, which a single availableNow batch never closes
        rows = S.run_available_now(
            S.stream_host_windows(spark, state,
                                  os.path.join(state, "pages")), ck,
            output_mode="complete")
        assert rows, "expected at least one (window, host) aggregate"
        assert all(r.n_fetched > 0 for r in rows)
    finally:
        shutil.rmtree(state, ignore_errors=True)
