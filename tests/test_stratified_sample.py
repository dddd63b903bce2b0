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
