"""rarity_score: brute-force Python twin (exact ==) and the bitwidth
surprisal semantics (hapax tokens score the full magnitude gap)."""

import pandas as pd

from supacrawler_spark import textops
from supacrawler_spark.textops import RARITY_SCALE

SF = "/root/testdata/sf0.001"


def _brute(docs: pd.DataFrame) -> pd.DataFrame:
    occ = []
    for _, r in docs.iterrows():
        for t in r["text"].split(" "):
            occ.append((int(r["doc_id"]), t))
    freq = {}
    for _, t in occ:
        freq[t] = freq.get(t, 0) + 1
    total = sum(freq.values())
    rows = {}
    for d, t in occ:
        s = total.bit_length() - freq[t].bit_length()
        n, ss = rows.get(d, (0, 0))
        rows[d] = (n + 1, ss + s)
    return pd.DataFrame(
        [(d, n, ss, ss * RARITY_SCALE // n)
         for d, (n, ss) in sorted(rows.items())],
        columns=["doc_id", "n_tokens", "surprisal_sum",
                 "mean_surprisal_e3"])


def test_brute_force_twin(spark):
    got = (textops.rarity_score(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in got.columns:
        got[c] = got[c].astype("int64")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _brute(docs)
    pd.testing.assert_frame_equal(got, want)


def test_surprisal_semantics(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = _brute(docs).set_index("doc_id")
    toks = [t for _, r in docs.iterrows()
            for t in r["text"].split(" ")]
    freq = pd.Series(toks).value_counts()
    total = int(freq.sum())
    # a hapax carries the full gap, the modal token the smallest
    max_gap = total.bit_length() - 1
    min_gap = total.bit_length() - int(freq.iloc[0]).bit_length()
    per_tok_mean = want["surprisal_sum"].sum() / want["n_tokens"].sum()
    assert min_gap <= per_tok_mean <= max_gap
    # scores are non-degenerate across docs (a filter could act on them)
    assert want["mean_surprisal_e3"].nunique() > 10
