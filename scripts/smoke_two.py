import sys
sys.path.insert(0, "/root/repo")
from supacrawler_spark.session import get_spark
from supacrawler_spark.sources import gen_pages_df, gen_seeds
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.plans import run_crawl
from supacrawler_spark.oracle import crawl_oracle

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
pages_df, n_docs = gen_pages_df(spark, "/root/testdata/sf0.001")
pages_local = {r["url"]: bytes(r["html"]).decode() for r in pages_df.select("url", "html").collect()}

for name, params, dangle in [
    ("subdomains", CrawlParams(depth=2, include_subdomains=True, link_limit=30), False),
    ("dangling_seed", CrawlParams(depth=2, link_limit=10), True),
]:
    sds = gen_seeds(n_docs, k=2, include_dangling=dangle)
    orc = crawl_oracle(pages_local, sds, params)
    run = run_crawl(spark, pages_df, sds, params)
    etrace = [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code) for r in run.trace.collect()]
    ok = etrace == orc.trace
    print(name, "trace:", ok)
    if not ok:
        for i,(a,b) in enumerate(zip(etrace, orc.trace)):
            if a!=b: print("  diff @",i,"eng",a,"orc",b); break
        print("  len", len(etrace), len(orc.trace))
        print("  extra eng:", etrace[len(orc.trace):][:4])
