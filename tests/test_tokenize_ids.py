"""tokenize_ids (textops): Python brute-force twin + vocab boundary
determinism + UNK accounting."""

import hashlib
from collections import Counter

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _py_tokenize(docs, vocab_size=textops.TOKENIZE_VOCAB):
    counts = Counter()
    for t in docs.values():
        counts.update(t.split(" "))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {tok: i for i, (tok, _) in enumerate(ranked[:vocab_size])}
    out = {}
    for d, t in docs.items():
        ws = t.split(" ")
        ids = [vocab.get(w, textops.TOKENIZE_UNK) for w in ws]
        digest = hashlib.md5(
            ",".join(str(i) for i in ids).encode()).hexdigest()
        out[d] = (len(ws), sum(1 for i in ids if i == textops.TOKENIZE_UNK),
                  digest)
    return out


def test_tokenize_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_tokenize(docs)
    got = {r["doc_id"]: (r["n_tokens"], r["n_unk"], r["ids_digest"])
           for r in textops.tokenize_ids(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) == len(docs)


def test_tokenize_small_vocab_forces_unks(spark):
    """With a tiny vocab the UNK path is exercised and the boundary
    tiebreak (count desc, token asc) is what decides membership."""
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_tokenize(docs, vocab_size=3)
    old = textops.TOKENIZE_VOCAB
    textops.TOKENIZE_VOCAB = 3
    try:
        got = {r["doc_id"]: (r["n_tokens"], r["n_unk"], r["ids_digest"])
               for r in textops.tokenize_ids(spark, SF_DIR).collect()}
    finally:
        textops.TOKENIZE_VOCAB = old
    assert got == want
    assert any(v[1] > 0 for v in got.values())
