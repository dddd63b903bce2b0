"""Corpus-profiling operators (textops.vocab_stats,
textops.source_ngram_overlap) vs independent driver-side brute force
over the collected sf0.001 documents table.
"""

from collections import Counter

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _docs_local(spark):
    return [(r["source"], r["text"])
            for r in textops._docs(spark, SF_DIR).collect()]


def test_vocab_stats_vs_bruteforce(spark):
    counts = {}
    for src, text in _docs_local(spark):
        counts.setdefault(src, Counter()).update(text.split(" "))
    expect = {}
    for src, c in counts.items():
        vocab, total = len(c), sum(c.values())
        hapax = sum(1 for v in c.values() if v == 1)
        expect[src] = (vocab, total, hapax, vocab / total)
    got = {r["source"]: (r["vocab_size"], r["total_tokens"],
                         r["hapax_count"], r["type_token_ratio"])
           for r in textops.vocab_stats(spark, SF_DIR).collect()}
    assert got == expect


def test_source_ngram_overlap_vs_bruteforce(spark):
    n = 4
    sets = {}
    for src, text in _docs_local(spark):
        w = text.split(" ")
        sets.setdefault(src, set()).update(
            " ".join(w[i:i + n]) for i in range(len(w) - n + 1))
    expect = {}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(sets[a] & sets[b])
            if shared:
                union = len(sets[a]) + len(sets[b]) - shared
                expect[(a, b)] = (shared, len(sets[a]), len(sets[b]),
                                  shared / union)
    got = {(r["source_a"], r["source_b"]):
           (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
           for r in textops.source_ngram_overlap(spark, SF_DIR).collect()}
    assert got == expect
    assert len(expect) > 0  # fixture must exercise the overlap path


def test_overlap_join_is_equi_join(spark):
    plan = textops.source_ngram_overlap(spark, SF_DIR)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_rate_by_source_consistent(spark):
    dup_docs = {r["doc_id"] for r in
                textops.multi_signal_clusters(spark, SF_DIR).collect()}
    docs = [(r["doc_id"], r["source"]) for r in
            textops._docs(spark, SF_DIR).select("doc_id", "source")
            .collect()]
    got = {r["source"]: (r["n_docs"], r["n_dup_docs"], r["dup_rate"])
           for r in textops.dedup_rate_by_source(spark, SF_DIR).collect()}
    from collections import Counter
    n = Counter(src for _, src in docs)
    nd = Counter(src for d, src in docs if d in dup_docs)
    assert got == {s: (n[s], nd[s], nd[s] / n[s]) for s in n}


def test_dup_span_stats_vs_bruteforce(spark):
    n = textops.DUP_SPAN_N
    docs = {r["doc_id"]: r["text"].split(" ")
            for r in textops._docs(spark, SF_DIR).collect()}
    from collections import defaultdict
    owners = defaultdict(set)
    spans = {}
    for d, w in docs.items():
        spans[d] = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        for s in spans[d]:
            owners[s].add(d)
    expect = {}
    for d, ss in spans.items():
        if not ss:
            continue
        dup = sum(1 for s in ss if len(owners[s]) > 1)
        expect[d] = (len(ss), dup, dup / len(ss))
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"],
                         r["dup_span_frac"])
           for r in textops.dup_span_stats(spark, SF_DIR).collect()}
    assert got == expect
    assert any(v[1] > 0 for v in got.values())  # duplicates exist
