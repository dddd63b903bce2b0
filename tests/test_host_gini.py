"""host_gini (graph): Python twin + the Gini identity's boundary
behavior on constructed distributions."""

from supacrawler_spark import graph

SF_DIR = "/root/testdata/sf0.001"


def _gini(xs):
    xs = sorted(xs)
    n, tot = len(xs), sum(xs)
    iwx = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * iwx - (n + 1) * tot) / (n * tot)


def test_host_gini_matches_python_twin(spark):
    ev = graph._events(spark, SF_DIR)
    loads = {}
    for r in ev.select((ev.user_id % 32).alias("h")).collect():
        loads[r["h"]] = loads.get(r["h"], 0) + 1
    row = graph.host_gini(spark, SF_DIR).collect()[0]
    assert row["n_hosts"] == len(loads)
    assert row["total"] == sum(loads.values())
    assert row["gini"] == _gini(list(loads.values()))
    assert 0.0 <= row["gini"] < 1.0


def test_gini_identity_boundaries():
    assert _gini([5, 5, 5, 5]) == 0.0              # perfectly even
    assert _gini([0, 0, 0, 100]) == 0.75           # (n-1)/n concentration
    assert 0.0 < _gini([1, 2, 3, 94]) < 1.0
