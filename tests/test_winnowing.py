"""Winnowing fingerprints (textops.winnow_fingerprints): Python
brute-force twin + the SIGMOD'03 guarantee (a shared token run of
length >= k+w-1 forces a shared fingerprint)."""

import hashlib

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
K, W = textops.WINNOW_K, textops.WINNOW_W


def _py_winnow(text, k=K, w=W):
    toks = text.split(" ")
    if len(toks) < k + w - 1:
        return set()
    hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
          for i in range(len(toks) - k + 1)]
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = {(d, fp) for d, t in docs.items() for fp in _py_winnow(t)}
    got = {(r["doc_id"], r["fp"])
           for r in textops.winnow_fingerprints(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0


def test_winnow_shared_run_guarantee():
    """Any two texts sharing a run of k+w-1 tokens share >= 1
    fingerprint, regardless of surrounding/reordered content."""
    run = "alpha beta gamma delta epsilon zeta"        # k+w-1 = 6 tokens
    a = "one two " + run + " three four"
    b = "nine eight seven " + run
    assert _py_winnow(a) & _py_winnow(b)
    # and a text NOT containing the run shares nothing with a
    c = "totally different words everywhere here now and then again"
    assert not (_py_winnow(a) & _py_winnow(c))
