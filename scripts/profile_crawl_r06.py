"""Round-6 crawl profiler: one bench-identical crawl leg with the
Spark event log enabled, then a per-job/stage attribution report
parsed from the log (guide §1/§7 — measure before touching anything).

Usage: python scripts/profile_crawl_r06.py [runs]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench defaults).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from supacrawler_spark.params import CrawlParams  # noqa: E402
from supacrawler_spark.plans import run_crawl  # noqa: E402
from supacrawler_spark.session import get_spark  # noqa: E402
from supacrawler_spark.sources import gen_seeds, gen_politeness_df  # noqa: E402


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus,
        app_name="profile-crawl-r06",
        extra_conf={"spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": evdir})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.supacrawler.smallScanRepartition", "true")

    import duckdb
    n_docs = duckdb.sql(
        f"select count(*) from '{sf_dir}/documents.parquet'").fetchone()[0]
    replicate = max(1, 200_000 // max(1, n_docs))
    cache_dir = f"/tmp/supacrawler_corpus_v3_sf{sf}_r{replicate}_w2"
    pages_path = os.path.join(cache_dir, "pages")
    assert os.path.exists(os.path.join(cache_dir, "_COMPLETE")), \
        "run bench.py once first to build the corpus cache"
    pages_prep = spark.read.parquet(pages_path)
    n_pages = n_docs * replicate
    seeds = gen_seeds(n_pages, k=64)
    pol = gen_politeness_df(spark, max_parallel=32768, delay_ms=None)
    work = tempfile.mkdtemp(prefix="profile_crawl_")

    # warmup (bench-identical)
    t0 = time.time()
    run_crawl(spark, pages_prep, seeds[:2], CrawlParams(depth=1, link_limit=32),
              politeness_df=pol, default_host_budget=32768,
              state_dir=os.path.join(work, "warm"), pages_prepared=True,
              collect_lineage=False, use_bloom=False, cache_pages=False)
    print(f"warmup: {round(time.time() - t0, 2)}s", file=sys.stderr)

    for i in range(runs):
        spark.sparkContext.setJobDescription(f"crawl_run_{i}")
        t0 = time.time()
        r = run_crawl(spark, pages_prep, seeds, CrawlParams(depth=6),
                      politeness_df=pol, default_host_budget=32768,
                      state_dir=os.path.join(work, f"state_{i}"),
                      pages_prepared=True, collect_lineage=False,
                      use_bloom=True, cache_pages=False)
        sec = round(time.time() - t0, 2)
        print(f"crawl run {i}: {r.stats['urls_scheduled']} urls "
              f"{r.stats['waves']} waves {sec}s "
              f"pre={r.stats['wall_preloop_ms']} "
              f"waves_ms={r.stats['wall_waves_ms']} "
              f"post={r.stats['wall_postloop_ms']}", file=sys.stderr)
    spark.stop()

    # ---- parse the event log: per-job wall + per-stage task time ----------
    evfiles = []
    for root, _dirs, files in os.walk(evdir):
        evfiles += [os.path.join(root, f) for f in files
                    if "events" in f or f.startswith("eventLog")]
    jobs = {}
    stages = {}
    for path in evfiles:
        for ln in open(path):
            try:
                e = json.loads(ln)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]]}
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0],
                    "n_tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)),
                }
    print("\n== jobs (wall ms) ==")
    for jid in sorted(jobs):
        j = jobs[jid]
        wall = j.get("t1", 0) - j["t0"]
        st = [(sid, stages[sid]["ms"], stages[sid]["n_tasks"],
               stages[sid]["name"][:60])
              for sid in j["stages"] if sid in stages]
        print(f"job {jid:3d} wall={wall:6d}ms desc={j['desc'][:40]!r}")
        for sid, ms, nt, nm in st:
            print(f"    stage {sid:3d} {ms:6d}ms tasks={nt:3d} {nm}")
    print(f"\nevent log dir: {evdir}")


if __name__ == "__main__":
    main()
