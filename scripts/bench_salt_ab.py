"""r6 (r5 verdict #2): hot-host skew salting A/B for
politeness_select — the operator the north rule names.

Builds a hot-host frontier (one host holding HOT_FRAC of the rows,
rest spread over many cold hosts), then times the politeness
selection at local[8] with the salted two-phase path vs the salt-off
single-window control (SALT_THRESHOLD monkeypatched high). The
salt-off control puts the hot host's entire row set through ONE
window task; the salted path splits it into SALT_BUCKETS tasks and
re-ranks only the <= buckets x budget survivors.

Usage: [N_ROWS=2000000] [HOT_FRAC=0.5] [PAIRS=2]
       python scripts/bench_salt_ab.py
Prints one JSON line with per-pair walls.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_frontier(spark, n_rows: int, hot_frac: float):
    """Deterministic frontier: first hot_frac of rows on one host."""
    hot_n = int(n_rows * hot_frac)
    df = spark.range(n_rows).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string"))
        .alias("url"),
        F.when(F.col("id") < hot_n, F.lit("hot.example.org"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 512).cast("string"),
                            F.lit(".example.org"))).alias("host"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(3).alias("depth"),
        (F.col("id") % 1000).cast("long").alias("parent_ord"),
        (F.col("id") % 50).cast("int").alias("link_pos"),
        F.lit(1).alias("seed_rank"),
        F.lit("hot.example.org").alias("seed_host"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("attempt"))
    path = f"/tmp/salt_ab_frontier_{n_rows}_{hot_frac}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def leg(cores: int, n_rows: int, hot_frac: float, salted: bool,
        budget: int = 4096) -> float:
    from supacrawler_spark.operators import frontier as FR
    from supacrawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 2,
                      app_name=f"salt-ab-{'on' if salted else 'off'}")
    spark.sparkContext.setLogLevel("ERROR")
    fr = build_frontier(spark, n_rows, hot_frac)
    fr.count()  # warm scan
    old = FR.SALT_THRESHOLD
    try:
        FR.SALT_THRESHOLD = 200_000 if salted else (1 << 60)
        t0 = time.time()
        sel, deferred, cache = FR.politeness_select(
            fr, None, default_budget=budget, hint_count=n_rows)
        n_sel = sel.count()
        n_def = deferred.count()
        wall = round(time.time() - t0, 2)
    finally:
        FR.SALT_THRESHOLD = old
        if cache is not None:
            cache.unpersist()
    print(f"cores={cores} salted={salted}: {wall}s "
          f"(selected={n_sel}, deferred={n_def})", file=sys.stderr,
          flush=True)
    spark.stop()
    return wall


def main():
    n_rows = int(os.environ.get("N_ROWS", "2000000"))
    hot_frac = float(os.environ.get("HOT_FRAC", "0.5"))
    pairs = int(os.environ.get("PAIRS", "2"))
    out = {"metric": "salt_ab_politeness_select_sec", "n_rows": n_rows,
           "hot_frac": hot_frac, "cores": 8, "pairs": []}
    for p in range(pairs):
        w_off = leg(8, n_rows, hot_frac, salted=False)
        w_on = leg(8, n_rows, hot_frac, salted=True)
        out["pairs"].append({"pair": p, "salt_off": w_off,
                             "salted": w_on})
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
