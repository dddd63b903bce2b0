"""HITS (graph.hits): semantic sanity on a hand graph + a Python
fixed-point twin over the fixture host graph (bit-exact integers)."""

from collections import defaultdict

from supacrawler_spark import graph


def _py_hits(edges, iters=graph.HITS_ITERS, scale=graph.PR_SCALE):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    hub = {n: scale for n in nodes}

    def half(score, key_in, key_out):
        raw = defaultdict(int)
        for s, d, w in edges:
            src, dst = (s, d) if key_in == "src" else (d, s)
            if src in score:
                raw[dst] += score[src] * w
        mx = max(raw.values())
        return {n: (raw[n] * scale) // mx if n in raw else 0
                for n in nodes}

    auth = None
    for _ in range(iters):
        auth = half(hub, "src", "dst")
        hub = half(auth, "dst", "src")
    return {n: (hub[n], auth[n]) for n in nodes}


def _spark_hits(spark, edges, iters=graph.HITS_ITERS):
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    return {r["host"]: (r["hub_fp"], r["authority_fp"])
            for r in graph.hits(df, iters).collect()}


def test_hits_star_graph_semantics(spark):
    # p1..p3 all point at c; c points at one of them back
    edges = [("p1", "c", 1), ("p2", "c", 1), ("p3", "c", 1), ("c", "p1", 1)]
    got = _spark_hits(spark, edges)
    assert got == _py_hits(edges)
    # c is the unique authority; the pointers are the top hubs
    assert got["c"][1] == graph.PR_SCALE
    assert all(got[p][0] == graph.PR_SCALE for p in ("p1", "p2", "p3"))
    assert got["c"][0] < graph.PR_SCALE          # c hubs only via p1
    assert got["p2"][1] == 0                     # nothing points at p2


def test_hits_matches_python_twin_on_host_graph(spark):
    e = graph.host_link_edges(spark, "/root/testdata/sf0.001")
    edges = [(r["src"], r["dst"], r["weight"]) for r in e.collect()]
    got = {r["host"]: (r["hub_fp"], r["authority_fp"])
           for r in graph.hits(e).collect()}
    assert got == _py_hits(edges)
    assert len(got) > 0
