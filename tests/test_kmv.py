"""kmv_distinct (textops): Python sketch twin + estimate-accuracy
sanity on the fixture vocabulary."""

import hashlib
from collections import Counter

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
K = textops.KMV_K


def _h48(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)


def _py_kmv(docs, k=K):
    vocab = set()
    for t in docs.values():
        vocab.update(t.split(" "))
    hs = sorted(_h48(t) for t in vocab)
    mins = hs[:k]
    kth = mins[-1]
    return (len(vocab), len(mins), kth, ((len(mins) - 1) * 16**12) // kth)


def test_kmv_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_kmv(docs)
    row = textops.kmv_distinct(spark, SF_DIR).collect()[0]
    assert (row["n_true"], row["k"], row["kth_hash"], row["n_est"]) == want
    # 64-value sketch should land within ~50% of truth on this vocab
    assert abs(row["n_est"] - row["n_true"]) / row["n_true"] < 0.5


def test_kmv_hash_is_48_bit_uniformish():
    hs = [_h48(f"w{i}") for i in range(1000)]
    assert all(0 <= h < 16**12 for h in hs)
    assert len(set(hs)) == 1000          # no 48-bit collisions at 1k
