"""Redirect-chain resolution: pointer-doubling closure vs a linear
brute-force walk, crafted cycles, and the hop-cap semantics at the
exact boundary (chain length == MAX_HOPS and == MAX_HOPS+1)."""

import pandas as pd

from supacrawler_spark import scrapeops as S

SF = "/root/testdata/sf0.001"


def _brute(edges: dict, nodes, cap=S.REDIRECT_MAX_HOPS):
    out = []
    for d in nodes:
        cur, hops = d, 0
        while cur in edges and hops < cap:
            cur = edges[cur]
            hops += 1
        out.append((d, cur, hops, cur in edges))
    return pd.DataFrame(
        out, columns=["doc_id", "final_doc", "n_hops", "is_cycle"])


def _run(spark, edges: dict, nodes):
    e_df = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges.items()],
        "src long, dst long") if edges else spark.createDataFrame(
        [], "src long, dst long")
    n_df = spark.createDataFrame([(int(n),) for n in nodes],
                                 "doc_id long")
    got = (S.resolve_redirects(e_df, n_df).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "final_doc", "n_hops"):
        got[c] = got[c].astype("int64")
    return got


def test_crafted_cycle_chain_and_terminal(spark):
    edges = {1: 2, 2: 3, 3: 1,          # 3-cycle
             4: 5,                       # 1-hop chain
             7: 7}                       # self-loop
    nodes = [0, 1, 2, 3, 4, 5, 6, 7]
    got = _run(spark, edges, nodes)
    want = _brute(edges, nodes)
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    assert not by.loc[0, "is_cycle"] and by.loc[0, "n_hops"] == 0
    assert by.loc[1, "is_cycle"] and by.loc[1, "n_hops"] == 16
    # 16 hops around a 3-cycle from 1: 16 % 3 = 1 -> lands on 2
    assert by.loc[1, "final_doc"] == 2
    assert by.loc[4, "final_doc"] == 5 and by.loc[4, "n_hops"] == 1
    assert by.loc[7, "is_cycle"] and by.loc[7, "final_doc"] == 7


def test_hop_cap_boundary(spark):
    # chain of exactly MAX_HOPS edges resolves (not a cycle); one
    # edge longer hits the cap with is_cycle=true at the capped pos
    h = S.REDIRECT_MAX_HOPS
    edges = {100 + i: 100 + i + 1 for i in range(h + 1)}  # h+1 edges
    nodes = [100, 101, 200]
    got = _run(spark, edges, nodes)
    want = _brute(edges, nodes)
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    assert by.loc[101, "n_hops"] == h and not by.loc[101, "is_cycle"]
    assert by.loc[100, "n_hops"] == h and by.loc[100, "is_cycle"]
    assert by.loc[100, "final_doc"] == 100 + h


def test_fixture_brute_force(spark):
    import hashlib
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    edges = {int(d): int(hashlib.md5(f"redir|{d}".encode())
                         .hexdigest()[:8], 16) % n
             for d in docs["doc_id"] if d % 4 == 1}
    got = (S.redirect_chains(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "final_doc", "n_hops"):
        got[c] = got[c].astype("int64")
    want = _brute(edges, sorted(docs["doc_id"].astype(int)))
    pd.testing.assert_frame_equal(got, want)
    # the fixture really exercises multi-hop chains
    assert (got["n_hops"] >= 2).any()
