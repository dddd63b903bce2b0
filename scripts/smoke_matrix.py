import sys, time
sys.path.insert(0, "/root/repo")
from supacrawler_spark.session import get_spark
from supacrawler_spark.sources import gen_pages_df, gen_seeds, gen_robots_df, gen_politeness_df
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.oracle import crawl_oracle
from supacrawler_spark.sources.synth import host_name

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
pages_df, n_docs = gen_pages_df(spark, "/root/testdata/sf0.001")
pages_local = {r["url"]: bytes(r["html"]).decode() for r in pages_df.select("url", "html").collect()}
seeds = gen_seeds(n_docs, k=2)

def robots_rules():
    return {host_name(h): {"allow": [], "disallow": ["/product/"]} for h in range(42)}

cases = [
    ("depth3_unlimited", CrawlParams(depth=3), {}, {}),
    ("patterns", CrawlParams(depth=3, patterns=("/blog/*", "/docs/*")), {}, {}),
    ("subdomains", CrawlParams(depth=2, include_subdomains=True, link_limit=30), {}, {}),
    ("tight_politeness", CrawlParams(depth=2, link_limit=25), {"budget": 2}, {}),
    ("robots", CrawlParams(depth=2, link_limit=30), {}, {"robots": True}),
    ("robots_fresh", CrawlParams(depth=2, link_limit=30, fresh=True), {}, {"robots": True}),
    ("limit1", CrawlParams(depth=2, link_limit=1), {}, {}),
    ("dangling_seed", CrawlParams(depth=2, link_limit=10), {}, {"dangle": True}),
    ("no_bloom", CrawlParams(depth=2, link_limit=40), {}, {"bloom": False}),
]

for name, params, pol, opt in cases:
    t0 = time.time()
    p_budget = pol.get("budget")
    pol_df = gen_politeness_df(spark, max_parallel=p_budget) if p_budget else None
    pol_dict = {host_name(h): p_budget for h in range(42)} if p_budget else None
    rob_df = gen_robots_df(spark) if opt.get("robots") else None
    rob_rules = robots_rules() if opt.get("robots") else None
    sds = gen_seeds(n_docs, k=2, include_dangling=opt.get("dangle", False))
    orc = crawl_oracle(pages_local, sds, params, politeness=pol_dict, robots_rules=rob_rules)
    run = run_crawl(spark, pages_df, sds, params, politeness_df=pol_df,
                    robots_df=rob_df, use_bloom=opt.get("bloom", True))
    etrace = [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code) for r in run.trace.collect()]
    eseen = {r.url for r in run.seen.collect()}
    epages = {r.url: r for r in run.results.collect()}
    trace_ok = etrace == orc.trace
    seen_ok = eseen == orc.seen
    set_ok = set(epages) == set(orc.pages)
    bytes_ok = all(epages[u].markdown == rec["markdown"] and epages[u].text == rec["text"]
                   for u, rec in orc.pages.items()) if set_ok else False
    stats_ok = all(run.stats[k] == orc.stats[k] for k in orc.stats)
    status = "OK " if all([trace_ok, seen_ok, set_ok, bytes_ok, stats_ok]) else "FAIL"
    print(f"{status} {name:18s} trace={trace_ok} seen={seen_ok} set={set_ok} bytes={bytes_ok} stats={stats_ok}"
          f" sched={run.stats['urls_scheduled']} succ={run.stats['successful_pages']} waves={run.stats['waves']} {round(time.time()-t0,1)}s")
    if not trace_ok:
        for i,(a,b) in enumerate(zip(etrace, orc.trace)):
            if a!=b: print("  first diff @",i,"eng",a,"orc",b); break
        print("  len", len(etrace), len(orc.trace))
