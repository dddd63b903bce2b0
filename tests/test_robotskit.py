"""robots.txt parser (robotskit): RFC-9309 group selection, rule
extraction, and the parse -> broadcast-dim -> crawl-enforcement loop."""

from supacrawler_spark import robotskit as R


def test_star_group_only():
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
    got = R.parse_robots_txt(txt)
    assert got == {"allow": ["/private/ok"], "disallow": ["/private/"],
                   "crawl_delay_ms": None}


def test_specific_group_shades_star():
    txt = ("User-agent: *\nDisallow: /a/\n\n"
           "User-agent: SupacrawlerBot\nDisallow: /b/\nCrawl-delay: 2.5\n")
    got = R.parse_robots_txt(txt)
    assert got["disallow"] == ["/b/"]
    assert got["allow"] == []
    assert got["crawl_delay_ms"] == 2500
    # a different agent falls back to '*'
    other = R.parse_robots_txt(txt, agent="googlebot")
    assert other["disallow"] == ["/a/"]
    assert other["crawl_delay_ms"] is None


def test_longest_token_wins_and_merge_equal():
    txt = ("User-agent: supa\nDisallow: /short/\n\n"
           "User-agent: supacrawler\nDisallow: /long1/\n\n"
           "User-agent: supacrawler\nDisallow: /long2/\n")
    got = R.parse_robots_txt(txt, agent="supacrawlerbot")
    # the two equally-specific groups merge in file order
    assert got["disallow"] == ["/long1/", "/long2/"]


def test_multi_agent_header_and_case_and_comments():
    txt = ("# banner\nSitemap: https://x/s.xml\n"
           "USER-AGENT: FooBot\nuser-agent: BarBot\n"
           "DISALLOW: /x/   # trailing comment\n"
           "Disallow:\n")          # empty value = no rule
    got = R.parse_robots_txt(txt, agent="barbot/2.0")
    assert got["disallow"] == ["/x/"]


def test_rules_before_any_group_ignored():
    assert R.parse_robots_txt("Disallow: /x/\n") == {
        "allow": [], "disallow": [], "crawl_delay_ms": None}


def test_rule_line_splits_groups():
    # a User-agent line AFTER rules starts a NEW group (RFC 9309)
    txt = ("User-agent: a\nDisallow: /1/\n"
           "User-agent: b\nDisallow: /2/\n")
    assert R.parse_robots_txt(txt, agent="a")["disallow"] == ["/1/"]
    assert R.parse_robots_txt(txt, agent="b")["disallow"] == ["/2/"]


def test_fixture_pattern_matches_apriori_rule():
    for hid in range(12):
        got = R.parse_robots_txt(R.synth_robots_txt(hid))
        if hid % 2 == 0:
            assert got == {"allow": [], "disallow": ["/news/"],
                           "crawl_delay_ms": (1 + hid % 5) * 1000}
        else:
            assert got == {"allow": ["/product/open"],
                           "disallow": ["/product/"],
                           "crawl_delay_ms": None}


def test_robots_df_from_texts_feeds_the_crawl(spark, web):
    """End to end: raw robots.txt text -> parsed broadcast dim ->
    run_crawl enforcement equals the hand-built robots_df path."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_robots_df, gen_seeds
    from supacrawler_spark.sources.synth import host_name, n_hosts

    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=30)

    # robots.txt equivalent of gen_robots_df(disallow /product/ on
    # every host, no agent-specific group)
    rows = [(host_name(h), "User-agent: *\nDisallow: /product/\n")
            for h in range(n_hosts())]
    texts = spark.createDataFrame(rows, "host string, robots_txt string")
    parsed = R.robots_df_from_texts(texts)
    assert {r.host: (list(r.allow_prefixes), list(r.disallow_prefixes))
            for r in parsed.collect()} == {
        host_name(h): ([], ["/product/"]) for h in range(n_hosts())}

    run_parsed = run_crawl(spark, pages_df, seeds, params,
                           robots_df=parsed)
    run_direct = run_crawl(spark, pages_df, seeds, params,
                           robots_df=gen_robots_df(spark))
    assert [tuple(r) for r in run_parsed.trace.collect()] == \
           [tuple(r) for r in run_direct.trace.collect()]


def test_robots_sitemaps_extraction(spark):
    """Sitemap directives: case-insensitive, any position, in-file
    order preserved; hosts without a directive yield no rows."""
    rows = [
        ("a.org", "Sitemap: https://a.org/s1.xml\nUser-agent: *\n"
                  "Disallow: /x\nsitemap: https://a.org/s2.xml"),
        ("b.org", "SITEMAP:https://b.org/all.xml"),
        ("c.org", "User-agent: *\nDisallow: /"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = [(r.host, r.pos, r.sitemap_url)
           for r in R.robots_sitemaps(df)
           .orderBy("host", "pos").collect()]
    assert got == [
        ("a.org", 0, "https://a.org/s1.xml"),
        ("a.org", 1, "https://a.org/s2.xml"),
        ("b.org", 0, "https://b.org/all.xml"),
    ]


def test_robots_to_sitemap_to_seeds_composition(spark):
    """The discovery loop: robots.txt -> sitemap URL -> (fetched)
    urlset body -> seeds DataFrame in run_crawl's contract."""
    from supacrawler_spark.sources import sitemap as SM

    robots = spark.createDataFrame(
        [("a.org", "Sitemap: https://a.org/sm.xml\nUser-agent: *")],
        "host string, robots_txt string")
    locs = R.robots_sitemaps(robots)
    assert [r.sitemap_url for r in locs.collect()] == \
        ["https://a.org/sm.xml"]
    # a fetch of that URL yields the body; join body by url and parse
    bodies = spark.createDataFrame(
        [("https://a.org/sm.xml",
          "<urlset><url><loc>https://a.org/p1</loc>"
          "<priority>0.9</priority></url>"
          "<url><loc>https://a.org/p2</loc></url></urlset>")],
        "sitemap_url string, xml string")
    fetched = locs.join(bodies, "sitemap_url")
    seeds = SM.seeds_from_sitemaps(fetched)
    assert [(r.url, r.seed_rank)
            for r in seeds.orderBy("seed_rank").collect()] == \
        [("https://a.org/p1", 0), ("https://a.org/p2", 1)]
