"""r6 (r5 verdict #2): the salted politeness path must (a) carry the
salt column in its phase-1 exchange — the hot host's rows really do
spread over SALT_BUCKETS tasks — and (b) produce output identical to
the salt-off single-window control on a skewed frontier."""

from pyspark.sql import functions as F

from supacrawler_spark.operators import frontier as FR


def _frontier(spark, n=3000, hot_frac=0.5):
    hot_n = int(n * hot_frac)
    return spark.range(n).select(
        F.concat(F.lit("https://x/"), F.col("id").cast("string"))
        .alias("url"),
        F.when(F.col("id") < hot_n, F.lit("hot.example.org"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                            F.lit(".example.org"))).alias("host"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(3).alias("depth"),
        (F.col("id") % 100).cast("long").alias("parent_ord"),
        (F.col("id") % 50).cast("int").alias("link_pos"),
        F.lit(1).alias("seed_rank"),
        F.lit("hot.example.org").alias("seed_host"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("attempt"))


def test_salted_exchange_carries_salt_column(spark):
    fr = _frontier(spark)
    # hint_count=None -> salted path unconditionally
    sel, deferred, _ = FR.politeness_select(fr, None, default_budget=8,
                                            hint_count=None)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    salted_exchanges = [
        ln for ln in plan.splitlines()
        if "hashpartitioning" in ln and "_salt" in ln]
    assert salted_exchanges, plan


def test_salted_equals_salt_off_on_skewed_frontier(spark):
    fr = _frontier(spark)
    sel_a, def_a, _ = FR.politeness_select(fr, None, default_budget=8,
                                           hint_count=None)  # salted
    sel_b, def_b, _ = FR.politeness_select(fr, None, default_budget=8,
                                           hint_count=10)    # salt-off
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(sel_a) == key(sel_b)
    assert key(def_a) == key(def_b)
