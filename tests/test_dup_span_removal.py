"""dup_span_removal: brute-force Python twin (exact ==) and the
keep-first semantics (the global first occurrence of every span is
never counted as removable)."""

import pandas as pd

from supacrawler_spark import textops

SF = "/root/testdata/sf0.001"
N = textops.DUP_SPAN_N


def _brute(docs: pd.DataFrame) -> pd.DataFrame:
    occ = {}  # gram -> list[(doc_id, pos 1-based)]
    toks = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        if len(w) < N:
            continue
        toks[int(r["doc_id"])] = len(w)
        for i in range(len(w) - N + 1):
            occ.setdefault(" ".join(w[i:i + N]), []).append(
                (int(r["doc_id"]), i + 1))
    covered = {d: set() for d in toks}
    for g, lst in occ.items():
        first = min(lst)
        for d, p in lst:
            if (d, p) != first:
                covered[d].update(range(p, p + N))
    rows = [(d, toks[d], len(covered[d]),
             len(covered[d]) / toks[d]) for d in sorted(toks)]
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_tokens", "n_dup_tokens", "dup_token_frac"])


def test_brute_force_twin(spark):
    got = (textops.dup_span_removal(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "n_tokens", "n_dup_tokens"):
        got[c] = got[c].astype("int64")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _brute(docs)
    pd.testing.assert_frame_equal(got, want)
    # the fixture exercises both outcomes: some docs lose tokens,
    # none loses more than it has, and at least one keeps everything
    assert (got["n_dup_tokens"] <= got["n_tokens"]).all()
    assert (got["n_dup_tokens"] > 0).any()
    assert (got["n_dup_tokens"] == 0).any()


def test_keep_first_never_removes_unique_content(spark):
    # a span that occurs exactly once corpus-wide must not be covered:
    # recompute coverage excluding singletons and it is unchanged
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _brute(docs)
    occ = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        for i in range(len(w) - N + 1):
            occ.setdefault(" ".join(w[i:i + N]), []).append(1)
    # sanity of the fixture itself: singletons exist in volume
    assert sum(1 for v in occ.values() if len(v) == 1) > 100
    # and total removable mass is strictly less than total mass
    assert want["n_dup_tokens"].sum() < want["n_tokens"].sum()
