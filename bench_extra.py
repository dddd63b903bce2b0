#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each analytic query
from bench.py's suite in isolation, with BOTH the suite's `.collect()`
methodology (comparable to bench.py / BENCH_r*.json numbers) and a
noop-sink run (computation only, no driver transfer), repeated R times.

This file is NOT part of the driver contract — bench.py stays frozen.
Output: one JSON line {"queries": {name: {"collect": [...], "noop":
[...]}}, "sf": ..., "cpus": ...}.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPS (default 3),
BENCH_EXTRA_ONLY (comma-separated query subset).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def builders():
    import __spark_entry__ as E
    from supacrawler_spark import scrapeops as _sco
    from supacrawler_spark import simsearch, textops
    from supacrawler_spark.sources import warc as _warc

    return {
        "pricing_summary": E.q_pricing_summary,
        "minhash_lsh_pairs": textops.minhash_lsh_pairs,
        "simhash": textops.simhash,
        "simhash_near_dup": textops.simhash_near_dup,
        "quality_score": textops.quality_score,
        "dup_clusters": textops.dup_clusters,
        "multi_signal_clusters": textops.multi_signal_clusters,
        "dup_span_stats": textops.dup_span_stats,
        "decontam_overlap": textops.decontam_overlap,
        "cosine_topk": simsearch.cosine_topk,
        "pii_redact": textops.pii_redact,
        "paragraph_dedup": textops.paragraph_dedup,
        "pagerank_hosts": E.graph.pagerank_hosts,
        "trustrank_hosts": E.graph.trustrank_hosts,
        "warc_roundtrip": _warc.warc_roundtrip,
        "recrawl_schedule": _sco.recrawl_schedule,
        "stratified_sample": textops.stratified_sample,
        "bm25_topk": textops.bm25_topk,
        "embedding_quantize": simsearch.embedding_quantize,
    }


def main() -> int:
    from supacrawler_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    only = os.environ.get("BENCH_EXTRA_ONLY")
    only = set(only.split(",")) if only else None

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name=f"supacrawler-bench-extra-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.supacrawler.smallScanRepartition", "true")

    qs = builders()
    # one warmup pass (JVM/codegen/python-worker spin-up) on a cheap
    # query so the first measured query is not charged the session cost
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["pii_redact"](spark, sf_dir).collect()

    out: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"collect": [], "noop": []}
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:collect:{i}")
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            rec["collect"].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name}:noop:{i}")
            t0 = time.time()
            (fn(spark, sf_dir).write.format("noop")
             .mode("overwrite").save())
            rec["noop"].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec["rows"] = n
        rec["collect_min"] = min(rec["collect"])
        rec["noop_min"] = min(rec["noop"])
        out[name] = rec
        print(f"{name}: collect={rec['collect']} noop={rec['noop']} "
              f"rows={n}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "per_query_isolation", "queries": out,
                      "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                      "cpus": cpus, "reps": reps}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
