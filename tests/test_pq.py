"""pq_codes (simsearch): Python twin with the same integer-grid
codebooks + assignment semantics (codes reconstruct the per-subspace
argmax), and code-distribution sanity."""

from decimal import Decimal

from supacrawler_spark import simsearch

SF_DIR = "/root/testdata/sf0.001"
M = simsearch.PQ_M
D = simsearch.DIM // M
E10 = 10_000_000_000


def _py_codebooks(rows):
    """Integer-grid per-label centroids per subspace slice:
    {subspace: {label: [D floats]}}."""
    by_label = {}
    for vid, emb, label in rows:
        by_label.setdefault(label, []).append(
            [float(x) for x in emb])
    books = {}
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
        books[s] = cents
    return books


def _py_pq(rows):
    books = _py_codebooks(rows)
    codes = {}
    for s in range(M):
        cents = books[s]
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


def test_pq_topk_shape_and_recall_floor(spark):
    """ADC ranking returns k rows/query; PQ reconstruction is lossy
    but the label structure keeps recall well above chance."""
    k = 3
    got = simsearch.pq_topk(spark, SF_DIR, n_queries=10, k=k).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(range(10))
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # Pin the ADC semantics end-to-end in Python: rebuild codes and
    # codebooks with the twin, reconstruct each corpus vector, rank by
    # cosine(query, reconstruction) with the same (score desc, id)
    # tiebreak, and demand the identical top-k id lists.
    import math
    rows = [(r["vec_id"], r["embedding"], r["label"])
            for r in simsearch._emb(spark, SF_DIR).collect()]
    codes = _py_pq(rows)
    cents = _py_codebooks(rows)
    vecs = {vid: [float(x) for x in e] for vid, e, _ in rows}
    want = {}
    for q in range(10):
        qv = vecs[q]
        scored = []
        for vid in vecs:
            if vid < 10:
                continue
            rv = [c for s in range(M) for c in cents[s][codes[vid][s]]]
            dot = nq = nr = 0.0
            for a, b in zip(qv, rv):
                dot, nq, nr = dot + a * b, nq + a * a, nr + b * b
            scored.append((-dot / (math.sqrt(nq) * math.sqrt(nr)), vid))
        want[q] = [vid for _, vid in sorted(scored)[:k]]
    got_ids = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_ids.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got_ids == want
