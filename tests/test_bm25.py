"""BM25 keyword search (textops.bm25_topk): Python brute-force twin
with the identical expression tree (bit-exact float parity), plus the
map-only plan shape (no explode — tf comes from higher-order filter)."""

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
K1, B = textops.BM25_K1, textops.BM25_B


def _py_bm25(docs):
    terms = textops.BM25_TERMS
    per = {d: (len(ws), [sum(1 for x in ws if x == t) for t in terms])
           for d, ws in ((d, txt.split(" ")) for d, txt in docs.items())}
    n = float(len(per))
    sum_dl = sum(dl for dl, _ in per.values())
    dfs = [float(sum(1 for _, tfs in per.values() if tfs[i] > 0))
           for i in range(len(terms))]
    avgdl = float(sum_dl) / n
    out = {}
    for d, (dl, tfs) in per.items():
        norm = 0.25 + 0.75 * (float(dl) / avgdl)
        score = None
        for i in range(len(terms)):
            tf, df = float(tfs[i]), dfs[i]
            s = ((n - df + 0.5) / (df + 0.5)) * (tf * 2.2) / (
                tf + 1.2 * norm)
            score = s if score is None else score + s
        if score > 0:
            out[d] = score
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:textops.BM25_TOPK]


def test_bm25_matches_python_twin_bit_exact(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_bm25(docs)
    got = [(r["doc_id"], r["score"])
           for r in textops.bm25_topk(spark, SF_DIR).collect()]
    assert got == want          # exact float equality: same IEEE tree
    assert 0 < len(got) <= textops.BM25_TOPK


def test_bm25_plan_is_map_only_tf(spark):
    """tf extraction must not explode tokens: the only wide stages are
    the 1-row global aggregate and the top-k."""
    plan = textops.bm25_topk(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate" not in plan          # no explode
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort
