"""Embedding-space diagnostics (simsearch.label_pair_distances) vs a
numpy brute force over the collected sf0.001 embeddings table."""

import numpy as np

from supacrawler_spark import simsearch

SF_DIR = "/root/testdata/sf0.001"


def test_label_pair_distances_vs_numpy(spark):
    rows = simsearch._emb(spark, SF_DIR).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64))
    cents = {lb: np.mean(np.stack(vs), axis=0)
             for lb, vs in by_label.items()}
    got = {(r["label_a"], r["label_b"]): (r["dist2"], r["dist"])
           for r in simsearch.label_pair_distances(spark, SF_DIR).collect()}
    labels = sorted(cents)
    assert set(got) == {(a, b) for i, a in enumerate(labels)
                        for b in labels[i + 1:]}
    for (a, b), (d2, d) in got.items():
        want = float(np.sum((cents[a] - cents[b]) ** 2))
        # engine centroids are 1e-10-grid quantized; numpy's are not
        assert abs(d2 - want) < 1e-8
        assert abs(d - want ** 0.5) < 1e-8
        assert d >= 0 and d2 >= 0


def test_ann_recall_consistent_with_topk_sets(spark):
    """ann_recall's counts must equal set intersections of the three
    top-k frames it composes (and recalls their exact ratios)."""
    def pairs(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = pairs(simsearch.cosine_topk(spark, SF_DIR, n_queries=20, k=3))
    lsh = pairs(simsearch.lsh_topk(spark, SF_DIR, n_queries=20, k=3))
    ivf = pairs(simsearch.ivf_topk(spark, SF_DIR, n_queries=20, k=3))
    got = {r["query_id"]: r
           for r in simsearch.ann_recall(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for q, ex in exact.items():
        r = got[q]
        assert r["n_exact"] == len(ex)
        assert r["lsh_hits"] == len(ex & lsh.get(q, set()))
        assert r["ivf_hits"] == len(ex & ivf.get(q, set()))
        assert r["lsh_recall"] == r["lsh_hits"] / r["n_exact"]
        assert 0.0 <= r["ivf_recall"] <= 1.0
