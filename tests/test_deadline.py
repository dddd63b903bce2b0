"""L6 wall-clock deadline (crawl/service.go:323-331): the cap stops the
crawl BETWEEN waves, flags the run, and leaves committed state fully
resumable. The check fires at the top of the wave loop, so
``max_seconds=0`` deterministically triggers it before the next wave
starts — no fake clock needed (the elapsed time since ``t_start`` is
strictly positive by the first loop entry)."""

import shutil
import tempfile

from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds


def _trace(run):
    return [tuple(r) for r in run.trace.collect()]


def test_deadline_fires_before_any_wave(spark, web):
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    run = run_crawl(spark, pages_df, seeds,
                    CrawlParams(depth=3, link_limit=60, max_seconds=0.0))
    assert run.stats["deadline_hit"] is True
    assert run.stats["waves"] == 0
    assert run.trace.count() == 0


def test_deadline_mid_crawl_state_stays_resumable(spark, web):
    """Wave 1 committed, then a deadline-capped resume adds nothing
    (deadline_hit=True, trace unchanged), then an uncapped resume
    completes to exactly the uninterrupted run's trace."""
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    full_params = CrawlParams(depth=3, link_limit=60)
    full = run_crawl(spark, pages_df, seeds, full_params)
    assert full.stats["waves"] >= 2, "need a multi-wave crawl"

    state = tempfile.mkdtemp(prefix="deadline_test_")
    try:
        part = run_crawl(spark, pages_df, seeds,
                         CrawlParams(depth=3, link_limit=60, max_waves=1),
                         state_dir=state)
        assert part.stats["waves"] == 1

        capped = run_crawl(spark, pages_df, seeds,
                           CrawlParams(depth=3, link_limit=60,
                                       max_seconds=0.0),
                           state_dir=state, resume=True)
        assert capped.stats["deadline_hit"] is True
        assert capped.stats["waves"] == 1          # no new wave ran
        assert _trace(capped) == _trace(part)      # state untouched

        resumed = run_crawl(spark, pages_df, seeds, full_params,
                            state_dir=state, resume=True)
        assert resumed.stats["deadline_hit"] is False
        assert _trace(resumed) == _trace(full)
        for k in ("total_pages", "successful_pages", "failed_pages"):
            assert resumed.stats[k] == full.stats[k]
    finally:
        shutil.rmtree(state, ignore_errors=True)
