"""Spider-trap features: hand-computed expectations over crafted
URLs, brute-force twin on the driver fixture, and the map-only plan
claim (no exchange, no Python UDF)."""

import pandas as pd
from pyspark.sql import functions as F

from supacrawler_spark import scrapeops as S

SF = "/root/testdata/sf0.001"

CASES = [
    # (url, path_depth, max_seg_repeat, n_params, is_trap)
    ("https://h.example.org/", 0, 0, 0, False),
    ("https://h.example.org", 0, 0, 0, False),
    ("https://h.example.org/a/b/c", 3, 1, 0, False),
    ("https://h.example.org/a/a/b", 3, 2, 0, False),
    ("https://h.example.org/a/a/a/b", 4, 3, 0, True),
    ("https://h.example.org/cal/2024/cal/2024/cal/2024", 6, 3, 0, True),
    ("https://h.example.org/1/2/3/4/5/6/7/8", 8, 1, 0, False),
    ("https://h.example.org/1/2/3/4/5/6/7/8/9", 9, 1, 0, True),
    ("https://h.example.org/p?x=1", 1, 1, 1, False),
    ("https://h.example.org/p?x=1&y=2&z=3", 1, 1, 3, False),
    ("http://h/p//q", 2, 1, 0, False),   # empty segment dropped
]


def test_crafted_urls(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    feats = S.url_trap_features(F.col("url"))
    got = df.select("url", *[feats[k].alias(k) for k in
                             ("path_depth", "max_seg_repeat",
                              "n_params", "is_trap")])
    by = {r["url"]: r for r in got.collect()}
    for u, d, m, p, t in CASES:
        r = by[u]
        assert (r["path_depth"], r["max_seg_repeat"],
                r["n_params"], r["is_trap"]) == (d, m, p, t), u


def _brute(url: str):
    rest = url.split("://", 1)[1]
    pathq = rest[rest.find("/"):] if "/" in rest else ""
    path, _, query = pathq.partition("?")
    segs = [s for s in path.split("/") if s]
    max_rep = max((segs.count(s) for s in segs), default=0)
    n_params = len(query.split("&")) if query else 0
    return (len(segs), max_rep, n_params,
            max_rep >= S.TRAP_MAX_REPEAT or len(segs) > S.TRAP_MAX_DEPTH)


def test_fixture_brute_force(spark):
    got = (S.trap_detect(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, r in got.iterrows():
        d, m, p, t = _brute(r["url"])
        assert (r["path_depth"], r["max_seg_repeat"],
                r["n_params"], bool(r["is_trap"])) == (d, m, p, t)
    # fixture straddles the threshold: traps and near-misses both occur
    assert got["is_trap"].any() and (~got["is_trap"]).any()
    assert (got["max_seg_repeat"] == 2).any()  # 2x echo: NOT a trap
    assert (got["n_params"] == 2).any()


def test_map_only_plan(spark):
    plan = S.trap_detect(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
