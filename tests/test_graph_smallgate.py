"""r6: the PR_SMALL_EDGES driver-side gate (graph.py) must be a pure
physical-plan choice — local and distributed paths bit-identical for
pagerank, trustrank, and HITS, on the fixture graph and on random
graphs (dangling nodes, untrusted islands, zero-score hosts)."""

import random

from pyspark.sql import functions as F

from supacrawler_spark import graph

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _rand_edges(spark, seed, n_nodes=40, n_edges=120):
    rng = random.Random(seed)
    rows = set()
    while len(rows) < n_edges:
        s, d = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if s != d:
            rows.add((f"h{s}", f"h{d}"))
    return spark.createDataFrame(
        [(s, d, 1 + (hash((s, d)) % 5)) for s, d in sorted(rows)],
        "src string, dst string, weight long")


def test_pagerank_local_equals_distributed(spark):
    edges = graph.host_link_edges(spark, SF_DIR)
    local = graph._power_iterate(edges, graph.PR_ITERS)
    dist = graph._power_iterate(edges, graph.PR_ITERS,
                                force_distributed=True)
    assert _rows(local) == _rows(dist)


def test_trustrank_local_equals_distributed(spark):
    edges = graph.host_link_edges(spark, SF_DIR)
    local = graph._power_iterate(
        edges, graph.PR_ITERS, trusted_pred=graph.trusted_host,
        trusted_py=graph.trusted_host_py)
    dist = graph._power_iterate(
        edges, graph.PR_ITERS, trusted_pred=graph.trusted_host,
        force_distributed=True)
    assert _rows(local) == _rows(dist)


def test_trustrank_column_only_pred_stays_distributed(spark):
    # no Python mirror supplied -> the gate must NOT engage
    edges = graph.host_link_edges(spark, SF_DIR)
    out = graph._power_iterate(edges, 1, trusted_pred=graph.trusted_host)
    # distributed path ends in a localCheckpoint scan, local path in a
    # LocalTableScan of an Arrow batch
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString() \
        or "LocalTableScan" not in out._jdf.queryExecution().toString()


def test_pagerank_random_graphs_local_equals_distributed(spark):
    for seed in (7, 21):
        edges = _rand_edges(spark, seed)
        local = graph.pagerank(edges)
        dist = graph._power_iterate(edges, graph.PR_ITERS,
                                    force_distributed=True)
        assert _rows(local) == _rows(dist)


def test_hits_local_equals_distributed(spark):
    edges = graph.host_link_edges(spark, SF_DIR)
    assert _rows(graph.hits(edges)) == _rows(
        graph.hits(edges, force_distributed=True))
    rnd = _rand_edges(spark, 3)
    assert _rows(graph.hits(rnd)) == _rows(
        graph.hits(rnd, force_distributed=True))


def test_gate_falls_back_above_bound(spark, monkeypatch):
    monkeypatch.setattr(graph, "PR_SMALL_EDGES", 5)
    edges = _rand_edges(spark, 9, n_nodes=20, n_edges=40)
    dist = graph.pagerank(edges)  # gate rejects -> distributed
    monkeypatch.undo()
    local = graph.pagerank(edges)
    assert _rows(local) == _rows(dist)
