"""Sitemap source: native XML parse, index form, optional fields,
and composition into the crawl engine's seeds-DataFrame contract."""

import pandas as pd

from supacrawler_spark.oracle import crawl_oracle
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds, sitemap

SF = "/root/testdata/sf0.001"


def _urlset(entries):
    body = "".join(
        "<url>" + "".join(f"<{k}>{v}</{k}>" for k, v in e.items())
        + "</url>" for e in entries)
    return f'<?xml version="1.0" encoding="UTF-8"?><urlset>{body}</urlset>'


def test_parse_roundtrip_matches_documents(spark):
    out = (sitemap.sitemap_parse(spark, SF).toPandas()
           .sort_values("loc").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(out) == len(docs)
    by_loc = out.set_index("loc")
    for r in docs.itertuples():
        row = by_loc.loc[f"https://{r.source}.example.org/doc/{r.doc_id}"]
        assert row["changefreq"] == sitemap.CHANGEFREQS[r.doc_id % 4]
        assert row["priority_e1"] == r.doc_id % 10


def test_optional_fields_null(spark):
    xml = _urlset([{"loc": "https://a.org/1"},
                   {"loc": "https://a.org/2", "priority": "0.8"}])
    out = (sitemap.parse_sitemap(spark.createDataFrame([(xml,)], "xml string"))
           .toPandas().sort_values("loc").reset_index(drop=True))
    assert list(out["loc"]) == ["https://a.org/1", "https://a.org/2"]
    assert pd.isna(out["lastmod"]).all()
    assert pd.isna(out["priority_e1"][0]) and out["priority_e1"][1] == 8


def test_sitemap_index(spark):
    xml = ('<sitemapindex>'
           '<sitemap><loc>https://a.org/sm1.xml</loc>'
           '<lastmod>2024-02-01</lastmod></sitemap>'
           '<sitemap><loc>https://a.org/sm2.xml</loc></sitemap>'
           '</sitemapindex>')
    out = (sitemap.sitemap_index_locs(
        spark.createDataFrame([(xml,)], "xml string"))
        .toPandas().sort_values("loc").reset_index(drop=True))
    assert list(out["loc"]) == ["https://a.org/sm1.xml",
                                "https://a.org/sm2.xml"]
    assert out["lastmod"][0] == "2024-02-01" and pd.isna(out["lastmod"][1])


def test_seeds_from_sitemap_drive_crawl(spark, web):
    """A crawl seeded from a parsed sitemap (seeds DataFrame → seeds
    dim) is trace-identical to the same seeds passed as a literal
    list, and matches the oracle. Priority DESC defines seed_rank."""
    pages_df, pages_local, n_docs = web
    urls = [u for u, _ in gen_seeds(n_docs, k=3)]
    # priorities 0.9 / 0.5 / 0.1 reverse the natural order
    xml = _urlset([
        {"loc": urls[2], "priority": "0.9"},
        {"loc": urls[1], "priority": "0.5"},
        {"loc": urls[0], "priority": "0.1"},
    ])
    sm = spark.createDataFrame([(xml,)], "xml string")
    seeds_df = sitemap.seeds_from_sitemaps(sm)
    expected = [(urls[2], 0), (urls[1], 1), (urls[0], 2)]
    assert [(r.url, r.seed_rank) for r in
            seeds_df.orderBy("seed_rank").collect()] == expected

    params = CrawlParams(depth=2, link_limit=25)
    via_sitemap = run_crawl(spark, pages_df, seeds_df, params)
    via_list = run_crawl(spark, pages_df, expected, params)

    def trace(run):
        return [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code)
                for r in run.trace.collect()]

    assert trace(via_sitemap) == trace(via_list)
    assert trace(via_sitemap) == crawl_oracle(
        pages_local, expected, params).trace
