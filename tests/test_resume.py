"""Checkpoint/resume: kill after wave k, resume from the manifest,
final state equals the uninterrupted run (SURVEY.md §5.2.5;
north_rule "resumable from checkpoint")."""

import os
import shutil
import tempfile

from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds


def _trace(run):
    return [tuple(r) for r in run.trace.collect()]


def test_resume_equals_uninterrupted(spark, web):
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    full_params = CrawlParams(depth=3, link_limit=60)

    full = run_crawl(spark, pages_df, seeds, full_params)
    assert full.stats["waves"] >= 2, "need a multi-wave crawl to test resume"

    state = tempfile.mkdtemp(prefix="resume_test_")
    try:
        # run only the first wave, then stop
        partial_params = CrawlParams(depth=3, link_limit=60, max_waves=1)
        part = run_crawl(spark, pages_df, seeds, partial_params,
                         state_dir=state)
        assert part.stats["waves"] == 1

        resumed = run_crawl(spark, pages_df, seeds, full_params,
                            state_dir=state, resume=True)
        assert _trace(resumed) == _trace(full)
        assert {r.url for r in resumed.seen.collect()} == \
               {r.url for r in full.seen.collect()}
        for k in ("total_pages", "successful_pages", "failed_pages"):
            assert resumed.stats[k] == full.stats[k]
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_resume_after_crash_between_frontier_write_and_commit(spark, web):
    """Wave k's frontier/results files are written BEFORE the manifest
    line that commits them. A crash in that window leaves orphan files;
    a resumed run must ignore them (known_df would otherwise anti-join
    the regenerated candidates against the orphan's is_new rows and
    silently drop a whole wave of discoveries)."""
    import json

    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=3, link_limit=60)
    full = run_crawl(spark, pages_df, seeds, params)
    assert full.stats["waves"] >= 3, "need >=3 waves to stage the crash"

    state = tempfile.mkdtemp(prefix="crash_test_")
    try:
        # run 3 waves committed, then forge the crash window: wave 2's
        # files stay on disk but its manifest line is rolled back
        run_crawl(spark, pages_df, seeds,
                  CrawlParams(depth=3, link_limit=60, max_waves=3),
                  state_dir=state)
        mpath = os.path.join(state, "manifest.jsonl")
        with open(mpath) as f:
            lines = [l for l in f if l.strip()]
        assert len(lines) == 3
        assert os.path.isdir(os.path.join(state, "frontier", "00002"))
        with open(mpath, "w") as f:
            f.writelines(lines[:2])

        resumed = run_crawl(spark, pages_df, seeds, params,
                            state_dir=state, resume=True)
        assert _trace(resumed) == _trace(full)
        for k in ("total_pages", "successful_pages", "failed_pages"):
            assert resumed.stats[k] == full.stats[k]
        # the orphan wave files were pruned and rewritten, not merged
        committed = [json.loads(l)["iter"] for l in lines[:2]]
        assert committed == [0, 1]
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_manifest_written_per_wave(spark, web):
    pages_df, _, n_docs = web
    state = tempfile.mkdtemp(prefix="manifest_test_")
    try:
        run = run_crawl(spark, pages_df, gen_seeds(n_docs, k=1),
                        CrawlParams(depth=2, link_limit=20),
                        state_dir=state)
        with open(os.path.join(state, "manifest.jsonl")) as f:
            lines = [l for l in f if l.strip()]
        assert len(lines) == run.stats["waves"]
        # lineage rows exist for every committed wave
        lin = run.lineage.collect()
        assert {r.iter for r in lin} == set(range(run.stats["waves"]))
        assert all(r.rows > 0 for r in lin)
    finally:
        shutil.rmtree(state, ignore_errors=True)
