"""corpus_select consistency: the composed verdict must agree with
each constituent signal query it is built from (which are themselves
pinned by oracle twins), and the final keep must be exactly the
conjunction of its gates.
"""

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_select_consistent_with_parts(spark):
    sel = {r["doc_id"]: r
           for r in textops.corpus_select(spark, SF_DIR).collect()}
    rep = {r["doc_id"]: r
           for r in textops.repetition_stats(spark, SF_DIR).collect()}
    clustered = {r["doc_id"]
                 for r in textops.dup_clusters(spark, SF_DIR).collect()}
    keepers = {r["keep_doc_id"]
               for r in textops.dedup_keep_best(spark, SF_DIR).collect()}
    contam = {r["doc_id"]
              for r in textops.decontam_overlap(spark, SF_DIR).collect()}

    assert len(sel) == 500  # one verdict row per document
    for did, r in sel.items():
        assert r["keep_tokens"] == (
            textops.CS_MIN_TOKENS <= rep[did]["n_tokens"]
            <= textops.CS_MAX_TOKENS)
        assert r["keep_repetition"] == (
            rep[did]["distinct_token_ratio"]
            >= textops.CS_MIN_DISTINCT_RATIO
            and rep[did]["top_token_frac"]
            <= textops.CS_MAX_TOP_TOKEN_FRAC)
        assert r["keep_dup"] == (did not in clustered or did in keepers)
        assert r["keep_decontam"] == (did not in contam and did % 97 != 0)
        assert r["keep"] == (
            r["keep_tokens"] and r["keep_repetition"] and r["keep_lang"]
            and r["keep_dup"] and r["keep_decontam"])
    # every gate must actually fire somewhere, and the verdict must
    # keep a non-trivial subset
    kept = sum(r["keep"] for r in sel.values())
    assert 0 < kept < len(sel)
    for gate in ("keep_tokens", "keep_repetition", "keep_lang",
                 "keep_dup", "keep_decontam"):
        assert any(not r[gate] for r in sel.values()), gate
