"""Scaling evidence for the ANALYTIC suite (supplement to the crawl
campaign in bench_scaling.py): run the heavy dedup text operators at
local[N] and local[4N] on the same input, interleaved pairs, report
per-pair efficiency eff = (wall_N / wall_4N) / 4 and the
ratio-of-medians.

The input is the sf0.1 documents table replicated REPLICATE times
(default 4, ~20k docs) with every replica's tokens suffixed by the
replica id — replicas share no shingles, so the dedup OUTPUT scale is
unchanged while the WORK is REPLICATE× bigger. Rationale: at the raw
sf0.1 size the suite is fixed-overhead-dominated (measured eff 0.26
at 2→8 — local[2] ran in 59.8s vs local[8] 53.1s, i.e. almost no
parallel work to scale), which says nothing about the operators;
the blow-up makes compute dominate the denominator, the same reason
the crawl campaign uses a 2M-page corpus.

Usage: [SCALE_N=2] [REPLICATE=4] python scripts/bench_suite_scaling.py [pairs=3]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SCALE_N", "2"))
R = int(os.environ.get("REPLICATE", "4"))
CORPUS = f"/tmp/suite_scale_corpus_r{R}"


def build_corpus():
    """Materialize the replicated documents table once (excluded from
    every timed region; cached across pairs and levels)."""
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS_MARK")):
        return
    import duckdb
    os.makedirs(CORPUS, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SF}/documents.parquet'")
    # many small row groups + one file per replica: the scan must be
    # SPLITTABLE, else the explode-heavy scan stage is one task at any
    # core count and the measurement reads pure fixed overhead (the
    # first draft's eff 0.26 was exactly this)
    os.makedirs(os.path.join(CORPUS, "documents.parquet"), exist_ok=True)
    n_src = con.sql("SELECT count(*) FROM src").fetchone()[0]
    for j in range(R):
        rep_text = ("text" if j == 0 else
                    f"array_to_string(list_transform(string_split(text, ' '), "
                    f"w -> w || 'r{j}'), ' ')")
        con.sql(
            f"COPY (SELECT doc_id + {j} * {n_src} AS doc_id, "
            f"{rep_text} AS text, 'en' AS lang, 'src0' AS source, "
            f"length(text) AS n_chars FROM src) TO "
            f"'{CORPUS}/documents.parquet/part-{j:03d}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 512)")
    open(os.path.join(CORPUS, "_SUCCESS_MARK"), "w").write("ok")


def suite_wall(cores: int) -> float:
    from supacrawler_spark import textops
    from supacrawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8),
                      app_name=f"suite-scale-{cores}")
    # split the small corpus files so the scan stage parallelizes
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.sparkContext.setLogLevel("ERROR")
    heavy = [
        textops.minhash_lsh_pairs,
        textops.dup_clusters,
        textops.multi_signal_clusters,
        textops.dup_span_stats,
        textops.decontam_overlap,
        textops.simhash_near_dup,
    ]
    # JVM/Python-worker warmup outside the timed region
    textops.quality_score(spark, CORPUS).count()
    t0 = time.time()
    for q in heavy:
        q(spark, CORPUS).count()
    wall = time.time() - t0
    spark.stop()
    return wall


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    build_corpus()
    results = []
    for p in range(pairs):
        w_small = suite_wall(N)
        w_big = suite_wall(4 * N)
        eff = (w_small / w_big) / 4
        results.append({"pair": p, f"wall_{N}": round(w_small, 2),
                        f"wall_{4 * N}": round(w_big, 2),
                        "eff": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    med = sorted(r[f"wall_{N}"] for r in results)[pairs // 2] / \
        sorted(r[f"wall_{4 * N}"] for r in results)[pairs // 2] / 4
    out = {"metric": "suite_scaling_eff", "value": round(med, 3),
           "levels": [N, 4 * N], "replicate": R, "pairs": results,
           "sf": SF}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
