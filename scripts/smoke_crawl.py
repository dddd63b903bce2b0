"""Dev smoke: engine vs oracle on a tiny synthetic web."""
import sys, time
sys.path.insert(0, "/root/repo")
from supacrawler_spark.session import get_spark
from supacrawler_spark.sources import gen_pages_df, gen_seeds
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.oracle import crawl_oracle

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
pages_df, n_docs = gen_pages_df(spark, "/root/testdata/sf0.001")
pages_local = {r["url"]: bytes(r["html"]).decode() for r in pages_df.select("url", "html").collect()}
print("pages:", len(pages_local), "gen+collect s:", round(time.time()-t0, 1))

seeds = gen_seeds(n_docs, k=2)
params = CrawlParams(depth=2, link_limit=40)
t0 = time.time()
orc = crawl_oracle(pages_local, seeds, params)
print("oracle:", orc.stats, "waves:", orc.waves, "s:", round(time.time()-t0, 1))

t0 = time.time()
run = run_crawl(spark, pages_df, seeds, params)
print("engine:", run.stats, "s:", round(time.time()-t0, 1))

etrace = [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code) for r in run.trace.collect()]
otrace = orc.trace
print("trace match:", etrace == otrace)
if etrace != otrace:
    for i, (a, b) in enumerate(zip(etrace, otrace)):
        if a != b:
            print("first diff @", i, "engine:", a, "oracle:", b)
            break
    print("len engine", len(etrace), "len oracle", len(otrace))
eseen = {r.url for r in run.seen.collect()}
print("seen match:", eseen == orc.seen, len(eseen), len(orc.seen))
epages = {r.url: r for r in run.results.collect()}
ok = set(epages) == set(orc.pages)
print("result url set match:", ok)
bad = 0
for u, rec in orc.pages.items():
    e = epages.get(u)
    if e is None: continue
    if e.markdown != rec["markdown"] or e.text != rec["text"] or list(e.links or []) != rec["links"]:
        bad += 1
        if bad == 1:
            print("MISMATCH", u)
            print("e.md:", repr((e.markdown or "")[:200]))
            print("o.md:", repr(rec["markdown"][:200]))
print("byte mismatches:", bad)
print("stats match:", run.stats["total_pages"] == orc.stats["total_pages"] and run.stats["successful_pages"] == orc.stats["successful_pages"] and run.stats["failed_pages"] == orc.stats["failed_pages"], run.stats, orc.stats)
