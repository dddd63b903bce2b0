"""SimHash banded-Hamming near-dup (textops.simhash_near_dup).

Pins two independent properties:

1. RECALL EXACTNESS (pigeonhole): with 4 contiguous bands over a
   48-bit fingerprint, any pair at Hamming distance <= 3 must agree on
   at least one full band, so the banded equi-join candidate set must
   recover EVERY such pair. Verified against a driver-side brute-force
   O(n^2) popcount over the collected signatures.
2. PRECISION: every emitted pair's hamming matches the brute-force
   popcount and respects the threshold (verify step is exact).

Plus a plan-shape guard: the candidate join is an equi-join (no
CartesianProduct / BroadcastNestedLoopJoin in the physical plan).
"""

from pyspark.sql import functions as F

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _brute_pairs(sigs, max_dist):
    out = {}
    items = sorted(sigs.items())
    for i, (da, sa) in enumerate(items):
        for db, sb in items[i + 1:]:
            d = bin(sa ^ sb).count("1")
            if d <= max_dist:
                out[(da, db)] = d
    return out


def test_recall_and_precision_vs_bruteforce(spark):
    sigs = {r["doc_id"]: r["simhash"]
            for r in textops._simhash_df(
                textops._docs(spark, SF_DIR),
                textops.SIMHASH_ND_BITS).collect()}
    expect = _brute_pairs(sigs, textops.SIMHASH_ND_MAXDIST)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"]
           for r in textops.simhash_near_dup(spark, SF_DIR).collect()}
    assert got == expect
    assert len(expect) > 0  # fixture must actually exercise the path


def test_candidate_join_is_equi_join(spark):
    plan = textops.simhash_near_dup(spark, SF_DIR)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wider_fingerprint_contains_tight_pairs(spark):
    """Pairs at distance <= 1 on 48 bits are also found at 64-band
    config widths: run the operator at bits=48/bands=6 (8-bit bands,
    pigeonhole holds up to dist 5) and check it is a superset of the
    default's dist<=1 pairs — guards the band/width arithmetic."""
    tight = {(r["doc_id_a"], r["doc_id_b"])
             for r in textops.simhash_near_dup(spark, SF_DIR).collect()
             if r["hamming"] <= 1}
    wide = {(r["doc_id_a"], r["doc_id_b"])
            for r in textops.simhash_near_dup(
                spark, SF_DIR, bits=48, bands=6, max_dist=5).collect()}
    assert tight <= wide
