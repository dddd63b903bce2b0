"""cms_token_counts (textops): Python sketch twin + the CMS one-sided
error guarantee (est >= true, always)."""

import hashlib
from collections import Counter

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
D, W = textops.CMS_D, textops.CMS_W


def _h(r, tok):
    return int(hashlib.md5(f"{r}|{tok}".encode()).hexdigest()[0], 16)


def _py_cms(docs, topn=textops.CMS_TOPN):
    counts = Counter()
    for t in docs.values():
        counts.update(t.split(" "))
    sketch = Counter()
    for tok, n in counts.items():
        for r in range(D):
            sketch[(r, _h(r, tok))] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]
    return {tok: (n, min(sketch[(r, _h(r, tok))] for r in range(D)))
            for tok, n in top}


def test_cms_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_cms(docs)
    got = {r["tok"]: (r["n_true"], r["n_est"])
           for r in textops.cms_token_counts(spark, SF_DIR).collect()}
    assert got == want
    # one-sided error guarantee, and at least one collision is visible
    # (64 counters vs a larger vocabulary)
    assert all(est >= true for true, est in got.values())
    assert any(est > true for true, est in got.values())
