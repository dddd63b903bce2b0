"""Seed-count scaling microbench (VERDICT r3 #2 evidence): wave-0 cost
must be flat per seed as the seed list grows — the dim path replaces
the driver-side literal with a broadcast join, so 10^2 -> 10^5 seeds
must not inflate the driver or the plan.

Runs a depth-1 crawl whose seeds are synthetic distinct-host URLs
(none resolve in the corpus, so wave-0 IS the whole run: seed
canonicalization, politeness, rank, fetch join miss path, commit).
Reports wall seconds and us/seed at each seed count.

Usage: python scripts/bench_seeds.py [counts...]   (default 1000 10000 100000)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supacrawler_spark.params import CrawlParams  # noqa: E402
from supacrawler_spark.plans import run_crawl  # noqa: E402
from supacrawler_spark.session import get_spark  # noqa: E402
from supacrawler_spark.sources import gen_pages_df  # noqa: E402


def main():
    counts = [int(c) for c in sys.argv[1:]] or [1000, 10_000, 100_000]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages_df, _ = gen_pages_df(spark, sf_dir, limit=500)
    pages_df = pages_df.cache()
    pages_df.count()

    # JVM/Python-worker warmup (protocol cost, excluded from numbers)
    warm = spark.range(64).selectExpr(
        "concat('https://warm', CAST(id AS STRING), '.example.net/p') "
        "AS url", "CAST(id AS INT) AS seed_rank")
    run_crawl(spark, pages_df, warm, CrawlParams(depth=1, max_waves=1),
              collect_lineage=False)

    print(f"{'seeds':>8} {'wall_s':>8} {'us/seed':>9} {'waves':>6}")
    for n in counts:
        seeds_df = spark.range(n).selectExpr(
            "concat('https://bulk', CAST(id AS STRING), "
            "'.example.net/p', CAST(id AS STRING)) AS url",
            "CAST(id AS INT) AS seed_rank")
        t0 = time.time()
        run = run_crawl(spark, pages_df, seeds_df,
                        CrawlParams(depth=1, max_waves=2),
                        collect_lineage=False)
        dt = time.time() - t0
        assert run.stats["urls_scheduled"] == n, run.stats
        print(f"{n:>8} {dt:>8.2f} {dt / n * 1e6:>9.1f} "
              f"{run.stats['waves']:>6}")


if __name__ == "__main__":
    main()
