"""snapshot_diff: crafted four-outcome case + fixture census twin."""

import pandas as pd

from supacrawler_spark import scrapeops as S

SF = "/root/testdata/sf0.001"


def test_crafted_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d2"), ("u3", "d3")],
        "url string, content_md5 string")
    new = spark.createDataFrame(
        [("u1", "d1"), ("u2", "dX"), ("u4", "d4")],
        "url string, content_md5 string")
    got = {r["url"]: r["status"]
           for r in S.snapshot_diff(old, new).collect()}
    assert got == {"u1": "same", "u2": "changed",
                   "u3": "gone", "u4": "added"}


def test_fixture_census(spark):
    got = S.crawl_diff(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ids = docs["doc_id"].astype(int)
    want_gone = int((ids % 17 == 0).sum())
    # changed = rewritten AND still present in run B
    want_changed = int(((ids % 11 == 0) & (ids % 17 != 0)).sum())
    want_added = docs["source"].nunique()
    counts = got["status"].value_counts().to_dict()
    assert counts.get("gone", 0) == want_gone
    assert counts.get("changed", 0) == want_changed
    assert counts.get("added", 0) == want_added
    assert counts.get("same", 0) == (len(docs) - want_gone
                                     - want_changed)
    # digests line up with the status semantics
    assert got.loc[got["status"] == "added", "old_digest"].isna().all()
    assert got.loc[got["status"] == "gone", "new_digest"].isna().all()
    ch = got[got["status"] == "changed"]
    assert (ch["old_digest"] != ch["new_digest"]).all()
