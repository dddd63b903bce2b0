"""Crawl-delay enforcement (VERDICT r3 #3): robots Crawl-delay and the
politeness dim's delay_ms fold into the per-wave budget as
B_eff(host) = min(max_parallel, ceil(wave_window_ms / delay)),
mirrored exactly by the oracle."""

from supacrawler_spark import robotskit as R
from supacrawler_spark.oracle import crawl_oracle
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.sources import gen_seeds
from supacrawler_spark.sources.synth import host_name, n_hosts


def _trace(run):
    return [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code)
            for r in run.trace.collect()]


def _robots_delay_df(spark, delay_ms):
    from supacrawler_spark.schemas import ROBOTS_SCHEMA
    rows = [(host_name(h), [], [], delay_ms) for h in range(n_hosts())]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def test_robots_crawl_delay_defers(spark, web):
    """A 5000ms Crawl-delay at the default 10000ms window caps every
    host at ceil(10000/5000)=2 slots/wave — URLs that max_parallel=10
    alone would schedule defer to later waves; trace == oracle."""
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=25)
    rob_df = _robots_delay_df(spark, 5000)
    rob_rules = {host_name(h): {"allow": [], "disallow": [],
                                "crawl_delay_ms": 5000}
                 for h in range(n_hosts())}
    orc = crawl_oracle(pages_local, seeds, params, robots_rules=rob_rules)
    run = run_crawl(spark, pages_df, seeds, params, robots_df=rob_df)
    assert _trace(run) == orc.trace
    # the same crawl without the delay finishes in fewer waves
    base = run_crawl(spark, pages_df, seeds, params)
    assert run.stats["waves"] > base.stats["waves"]
    # and wave 0 schedules at most 2 per host
    wave0 = [t for t in orc.trace if t[1] == 0]
    from collections import Counter
    from supacrawler_spark import urlkit as U
    per_host = Counter(U.extract_host(t[3]) for t in wave0)
    assert max(per_host.values()) <= 2


def test_politeness_delay_ms_binds(spark, web):
    """delay_ms in the politeness dim binds the same way:
    ceil(10000/4000)=3 slots/wave, below max_parallel=10."""
    from supacrawler_spark.sources import gen_politeness_df
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=25)
    pol_df = gen_politeness_df(spark, max_parallel=10, delay_ms=4000)
    orc = crawl_oracle(
        pages_local, seeds, params,
        politeness={host_name(h): 10 for h in range(n_hosts())},
        politeness_delay={host_name(h): 4000 for h in range(n_hosts())})
    run = run_crawl(spark, pages_df, seeds, params, politeness_df=pol_df)
    assert _trace(run) == orc.trace


def test_delay_never_starves(spark, web):
    """delay > window still grants 1 slot per wave (ceil >= 1): the
    crawl slows but terminates with the full result set."""
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=1)
    params = CrawlParams(depth=1, link_limit=8)
    rob_df = _robots_delay_df(spark, 60_000)
    rob_rules = {host_name(h): {"allow": [], "disallow": [],
                                "crawl_delay_ms": 60_000}
                 for h in range(n_hosts())}
    orc = crawl_oracle(pages_local, seeds, params, robots_rules=rob_rules)
    run = run_crawl(spark, pages_df, seeds, params, robots_df=rob_df)
    assert _trace(run) == orc.trace
    assert orc.stats["successful_pages"] > 0
    wave0 = [t for t in orc.trace if t[1] == 0]
    assert len(wave0) == 1  # one slot per host per wave


def test_parse_robots_to_crawl_with_delay(spark, web):
    """Composition: raw robots.txt text (with Crawl-delay directives)
    -> robotskit dim -> run_crawl enforcement == oracle given the same
    a-priori rules. Uses the synth fixture: even hids carry the
    supacrawlerbot group (Disallow /news/, Crawl-delay 1+hid%5 s)."""
    pages_df, pages_local, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=30,
                         wave_window_ms=4000)  # delays 1-5s bind
    rows = [(host_name(h), R.synth_robots_txt(h)) for h in range(n_hosts())]
    texts = spark.createDataFrame(rows, "host string, robots_txt string")
    rob_df = R.robots_df_from_texts(texts)
    rob_rules = {}
    for h in range(n_hosts()):
        if h % 2 == 0:
            rob_rules[host_name(h)] = {
                "allow": [], "disallow": ["/news/"],
                "crawl_delay_ms": (1 + h % 5) * 1000}
        else:
            rob_rules[host_name(h)] = {
                "allow": ["/product/open"], "disallow": ["/product/"]}
    orc = crawl_oracle(pages_local, seeds, params, robots_rules=rob_rules)
    run = run_crawl(spark, pages_df, seeds, params, robots_df=rob_df)
    assert _trace(run) == orc.trace
    assert {r.url for r in run.seen.collect()} == orc.seen


def test_delay_only_host_kept_in_dim(spark):
    """ADVICE r3: a robots.txt whose matched group has ONLY a
    Crawl-delay directive must still yield a dim row carrying the
    delay (the host list derives from all rule kinds)."""
    texts = spark.createDataFrame(
        [("only-delay.example.org", "User-agent: *\nCrawl-delay: 10\n"),
         ("both.example.org",
          "User-agent: *\nDisallow: /x/\nCrawl-delay: 2\n")],
        "host string, robots_txt string")
    dim = {r.host: r for r in R.robots_df_from_texts(texts).collect()}
    assert set(dim) == {"only-delay.example.org", "both.example.org"}
    od = dim["only-delay.example.org"]
    assert od.crawl_delay_ms == 10_000
    assert list(od.allow_prefixes) == [] and \
           list(od.disallow_prefixes) == []
    assert dim["both.example.org"].crawl_delay_ms == 2000
    assert list(dim["both.example.org"].disallow_prefixes) == ["/x/"]


def test_delay_resume_equals_uninterrupted(spark, web, tmp_path):
    """Crawl-delay x resume composition: a delay-throttled crawl
    interrupted after wave 0 and resumed from checkpoint produces the
    byte-identical trace of the uninterrupted delay-throttled crawl —
    the deferred-by-delay frontier must survive the state round-trip."""
    pages_df, _, n_docs = web
    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=25)
    rob_df = _robots_delay_df(spark, 5000)

    full = run_crawl(spark, pages_df, seeds, params, robots_df=rob_df)
    assert full.stats["waves"] >= 2

    state = str(tmp_path / "state")
    part = run_crawl(spark, pages_df, seeds,
                     CrawlParams(depth=2, link_limit=25, max_waves=1),
                     robots_df=rob_df, state_dir=state)
    assert part.stats["waves"] == 1
    resumed = run_crawl(spark, pages_df, seeds, params,
                        robots_df=rob_df, state_dir=state, resume=True)
    assert _trace(resumed) == _trace(full)
