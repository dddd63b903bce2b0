"""pq_codes (simsearch): Python twin with the same integer-grid
codebooks + assignment semantics (codes reconstruct the per-subspace
argmax), and code-distribution sanity."""

from decimal import Decimal

from supacrawler_spark import simsearch

SF_DIR = "/root/testdata/sf0.001"
M = simsearch.PQ_M
D = simsearch.DIM // M
E10 = 10_000_000_000


def _py_pq(rows):
    # integer-grid per-label centroids per subspace slice
    by_label = {}
    for vid, emb, label in rows:
        by_label.setdefault(label, []).append(
            [float(x) for x in emb])
    codes = {}
    for s in range(M):
        cents = {}
        for label, vecs in by_label.items():
            n = len(vecs)
            c = []
            for p in range(D):
                tot = sum(int(Decimal(repr(v[s * D + p])) * E10)
                          for v in vecs)
                c.append(tot / (n * E10))
            cents[label] = c
        for vid, emb, _ in rows:
            sub = [float(x) for x in emb[s * D:(s + 1) * D]]
            best = None
            for label in cents:
                acc = 0.0
                for a, b in zip(sub, cents[label]):
                    acc = acc + a * b
                key = (acc, -label)
                if best is None or key > best:
                    best, bl = key, label
            codes.setdefault(vid, []).append(bl)
    return {v: tuple(c) for v, c in codes.items()}


def test_pq_matches_python_twin(spark):
    rows = [(r["vec_id"], r["embedding"], r["label"])
            for r in simsearch._emb(spark, SF_DIR).collect()]
    want = _py_pq(rows)
    got = {r["vec_id"]: tuple(r[f"code{s}"] for s in range(M))
           for r in simsearch.pq_codes(spark, SF_DIR).collect()}
    assert got == want
    # codes index the label codebook; same-label vectors should often
    # (not always) quantize to their own label's centroid
    labels = {vid: l for vid, _, l in rows}
    self_hits = sum(1 for v, cs in got.items()
                    if labels[v] in cs)
    assert self_hits > len(got) // 2
