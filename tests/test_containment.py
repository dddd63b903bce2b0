"""containment_pairs (textops): Python brute-force twin + the
quote-inclusion case symmetric Jaccard misses."""

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
T = textops.CONTAIN_THRESHOLD


def _sh(text, n=3):
    ws = text.split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)} \
        if len(ws) >= n else set()


def test_containment_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()
            if r["doc_id"] < 200}
    shs = {d: _sh(t) for d, t in docs.items() if _sh(t)}
    want = {}
    ids = sorted(shs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(shs[a] & shs[b])
            if inter == 0:
                continue
            c = inter / min(len(shs[a]), len(shs[b]))
            if c >= T:
                want[(a, b)] = (inter, c)
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["containment"])
           for r in textops.containment_pairs(spark, SF_DIR).collect()}
    assert got == want


def test_containment_catches_quote_inclusion():
    """A short doc fully quoted inside a long one: containment = 1.0
    while Jaccard stays below any near-dup threshold."""
    short = "alpha beta gamma delta epsilon"
    long_ = ("intro words here " + short +
             " and then a very long tail " +
             " ".join(f"tok{i}" for i in range(40)))
    a, b = _sh(short), _sh(long_)
    inter = len(a & b)
    containment = inter / min(len(a), len(b))
    jaccard = inter / len(a | b)
    assert containment == 1.0
    assert jaccard < 0.2
