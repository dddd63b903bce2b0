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


def test_stream_first_seen_stateful_across_restarts(spark, tmp_path):
    """applyInPandasWithState URL-seen dedup: intra-batch duplicates
    collapse to first-seen, and the per-bucket state survives a full
    query restart via the checkpoint (a second availableNow run over
    new files emits only genuinely-new hashes)."""
    import os

    from supacrawler_spark.streaming import stream_first_seen

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    schema = "url string, url_hash long"

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)

    def drain():
        # file sink (memory sink cannot recover from a checkpoint)
        q = (stream_first_seen(
                spark.readStream.schema(schema).parquet(src))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.schema(schema).parquet(out).collect()

    emit([("u1", 1), ("u2", 2), ("u3", 3), ("u2-dup", 2)])
    got1 = drain()
    assert sorted(r.url_hash for r in got1) == [1, 2, 3]
    assert "u2-dup" not in {r.url for r in got1}

    emit([("u2-again", 2), ("u3-again", 3), ("u4", 4)])
    got2 = drain()
    new = [(r.url, r.url_hash) for r in got2
           if r.url not in {g.url for g in got1}]
    assert new == [("u4", 4)]
    assert len(got2) == len(got1) + 1


def test_stream_host_budget_quota_and_restart(spark, tmp_path):
    """Per-host quota gate: admitted counts are exactly min(cap, n) per
    host; arrival order decides WHICH rows pass when batches arrive one
    file at a time; the cumulative used-count state survives a query
    restart via the checkpoint (rows after restart are deferred once
    the quota filled before it)."""
    import os

    from supacrawler_spark.streaming import stream_host_budget

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    schema = "host string, url string"
    out_schema = schema + ", admitted boolean"

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(src)

    def drain():
        q = (stream_host_budget(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(src),
                cap=2)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.schema(out_schema).parquet(out).collect()

    emit([("a", "a1"), ("a", "a2"), ("b", "b1")])
    got1 = drain()
    by_url = {r.url: r.admitted for r in got1}
    assert by_url == {"a1": True, "a2": True, "b1": True}

    # second drop: host a is at quota -> everything deferred; host b
    # admits exactly one more; host c is fresh
    emit([("a", "a3"), ("b", "b2"), ("b", "b3"), ("c", "c1")])
    got2 = drain()
    by_url = {r.url: r.admitted for r in got2}
    assert by_url["a3"] is False
    assert by_url["c1"] is True
    assert [by_url["b2"], by_url["b3"]] == [True, False]

    # per-host totals: min(cap, n) admitted regardless of batching
    from collections import Counter

    admitted = Counter(r.host for r in got2 if r.admitted)
    totals = Counter(r.host for r in got2)
    for h in totals:
        assert admitted[h] == min(2, totals[h])
