"""lsh_recall (textops): consistency with its two constituent
pipelines and the recall identity."""

from pyspark.sql import functions as F

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_recall_identity(spark):
    row = textops.lsh_recall(spark, SF_DIR).collect()[0]
    truth = {(r["doc_a"], r["doc_b"]) for r in
             textops.ngram_jaccard_pairs(spark, SF_DIR).collect()}
    cand = {(r["doc_a"], r["doc_b"]) for r in
            textops.minhash_lsh_pairs(spark, SF_DIR)
            .filter((F.col("doc_a") < 200) & (F.col("doc_b") < 200))
            .collect()}
    assert row["n_truth"] == len(truth)
    assert row["n_candidates"] == len(cand)
    assert row["n_hit"] == len(truth & cand)
    if truth:
        assert row["recall"] == len(truth & cand) / len(truth)
        assert 0.0 <= row["recall"] <= 1.0
