"""host_reputation composition: rollup twin, priority is a proper
permutation ordered by (trustrank, pagerank), spam demotion shows."""

import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_host_reputation(spark):
    got = (E.q_host_reputation(spark, SF).toPandas()
           .sort_values("crawl_priority").reset_index(drop=True))
    assert len(got) == 32
    # priority is a permutation of 1..32 in (trustrank, pagerank) order
    assert sorted(got["crawl_priority"]) == list(range(1, 33))
    key = list(zip(-got["trustrank_fp"], -got["pagerank_fp"],
                   got["host"]))
    assert key == sorted(key)
    # doc rollup twin
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["host"] = "h" + (docs["doc_id"] % 32).astype(str)
    roll = docs.groupby("host").agg(
        n_docs=("doc_id", "size"), chars_sum=("n_chars", "sum"))
    merged = got.set_index("host").join(roll, rsuffix="_w")
    assert (merged["n_docs"] == merged["n_docs_w"]).all()
    assert (merged["chars_sum"] == merged["chars_sum_w"]).all()
    assert (merged["mean_len_e3"]
            == merged["chars_sum"] * 1000 // merged["n_docs"]).all()
    # spam demotion direction: teleport mass only lands on the trusted
    # seeds (id % 7 == 0), so their mean trustrank must dominate (the
    # sf0.001 graph is dense enough that nothing converges to 0)
    trusted = got["host"].str[1:].astype(int) % 7 == 0
    assert (got.loc[trusted, "trustrank_fp"].mean()
            > got.loc[~trusted, "trustrank_fp"].mean())
