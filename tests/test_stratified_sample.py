"""Stratified split/sample: determinism, holdout stability under
corpus growth, proportion sanity, and the map-only plan shape."""

import pandas as pd

from supacrawler_spark import textops

SF = "/root/testdata/sf0.01"


def test_deterministic_and_stable_under_growth(spark):
    full = textops.stratified_sample(spark, SF).toPandas()
    again = textops.stratified_sample(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    # a doc's split is a pure function of doc_id: the assignment at
    # sf0.001 (a subset corpus) agrees row-for-row with sf0.01
    small = textops.stratified_sample(
        spark, "/root/testdata/sf0.001").toPandas()
    merged = small.merge(full, on="doc_id", suffixes=("_s", "_f"))
    assert len(merged) == len(small)
    assert (merged["split_s"] == merged["split_f"]).all()
    assert (merged["keep_s"] == merged["keep_f"]).all()


def test_split_proportions(spark):
    df = textops.stratified_sample(spark, SF).toPandas()
    frac = df["split"].value_counts(normalize=True)
    assert 0.72 <= frac["train"] <= 0.88
    assert 0.05 <= frac["val"] <= 0.15
    assert 0.05 <= frac["test"] <= 0.15
    # per-source keep rate tracks the quota knob within noise
    for src, grp in df.groupby("source"):
        rate = ((int(src[3:]) % 5) * 10 + 50) / 100
        assert abs(grp["keep"].mean() - rate) < 0.35


def test_map_only_plan(spark):
    plan = textops.stratified_sample(spark, SF)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_export_digest_partitioning_invariant(spark):
    """The per-shard digest is a pure function of corpus content:
    repartitioning the input (different task order) cannot change it."""
    from pyspark.sql import functions as F

    base = textops.export_shards(spark, SF).toPandas() \
        .sort_values("shard_id").reset_index(drop=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .repartition(17, "lang")
    h = F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
    per = docs.select(
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
         % textops.N_EXPORT_SHARDS).alias("shard_id"),
        "doc_id", F.md5("text").alias("doc_md5"),
        F.length("text").alias("n_chars"))
    again = (per.groupBy("shard_id")
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_chars").alias("chars_sum"),
                  F.md5(F.concat_ws("", F.transform(
                      F.sort_array(F.collect_list(
                          F.struct("doc_id", "doc_md5"))),
                      lambda s: s["doc_md5"]))).alias("digest"))
             ).toPandas().sort_values("shard_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, again)
    # shards are usefully balanced (uniform hash): no empty shard at
    # 500 docs / 16 shards
    assert (base["n_docs"] > 0).all()
