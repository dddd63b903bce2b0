"""Isolate which stage of the wave job fails to scale 4->16 cores.

Times, at a given core count, on the cached bench corpus:
  scan      — full corpus scan + length(html) aggregate
  join      — fetch_join (broadcast path) of a fixed 29k-url wave
  extract   — join + mapInPandas extraction, count only
  write     — join + extraction + parquet write

Usage: python scripts/probe_scaling.py <cores>
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from supacrawler_spark.operators.fetch import fetch_join, make_extractor  # noqa: E402
from supacrawler_spark.schemas import RESULT_SCHEMA  # noqa: E402
from supacrawler_spark.session import get_spark  # noqa: E402

CORPUS = "/tmp/supacrawler_corpus_v3_sf0.1_r40_w2/pages"
N_WAVE = 29274


def main():
    cores = int(sys.argv[1])
    extra = {}
    if len(sys.argv) > 2:  # maxPartitionBytes override
        extra = {"spark.sql.files.maxPartitionBytes": sys.argv[2],
                 "spark.sql.files.openCostInBytes": str(512 * 1024)}
    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                      app_name=f"probe-{cores}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t = {}

    pages = spark.read.parquet(CORPUS)

    # warm-up: page cache + JIT + python workers
    pages.limit(2000).select(F.sum(F.length("html"))).collect()

    t0 = time.time()
    pages.select(F.sum(F.length("html"))).collect()
    t["scan"] = round(time.time() - t0, 2)

    # fixed deterministic 29k-url wave
    sched = (pages.select(F.col("url_canon").alias("url"))
             .filter(F.pmod(F.xxhash64("url"), F.lit(7)) == 0)
             .limit(N_WAVE)
             .withColumn("host", F.lit("h"))
             .withColumn("url_hash", F.xxhash64("url"))
             .withColumn("depth", F.lit(1))
             .withColumn("parent_ord", F.lit(0))
             .withColumn("link_pos", F.lit(0))
             .withColumn("seed_rank", F.lit(0))
             .withColumn("seed_host", F.lit("h"))
             .withColumn("priority", F.lit(0.0))
             .withColumn("attempt", F.lit(0))
             .withColumn("iter", F.lit(1))
             .withColumn("crawl_ord", F.monotonically_increasing_id())
             .withColumn("pattern_ok", F.lit(True))
             .withColumn("robots_ok", F.lit(True))
             .repartition(max(8, cores), "url").persist())
    sched.count()

    t0 = time.time()
    joined = fetch_join(sched, pages, small_wave=True,
                        pages_urls=pages.select("url_canon"))
    joined.select(F.sum(F.length("html"))).collect()
    t["join"] = round(time.time() - t0, 2)

    t0 = time.time()
    res = joined.mapInPandas(make_extractor(False, False), RESULT_SCHEMA)
    res.select(F.count("*")).collect()
    t["extract"] = round(time.time() - t0, 2)

    out = tempfile.mkdtemp(prefix="probe_") + "/res"
    t0 = time.time()
    res.write.mode("overwrite").parquet(out)
    t["write"] = round(time.time() - t0, 2)

    print(json.dumps({"cores": cores, **t}), flush=True)


if __name__ == "__main__":
    main()
