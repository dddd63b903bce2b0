"""Per-operator 2->8 scaling for the connected-components pair
(dup_clusters, multi_signal_clusters) on the 4x replicated corpus —
the targeted follow-up to the round-4 per-operator decomposition
(BENCH.md "Analytic-suite scaling"), re-measured after the small-edge
clustering path was collapsed to one job + one Arrow batch.

Reuses bench_suite_scaling's corpus builder so the input is identical
to the recorded r4 table (sf0.1 documents x4, replica-suffixed tokens,
splittable layout). Each level gets a fresh session; a quality_score
pass warms the JVM/Python workers outside the timed region.

Usage: [PAIRS=2] python scripts/bench_cc_pair.py
Prints one JSON line with per-pair and per-operator efficiencies.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import bench_suite_scaling as bss  # noqa: E402  (scripts/ sibling)

OPS = ["dup_clusters", "multi_signal_clusters"]


def op_walls(cores: int) -> dict:
    from supacrawler_spark import textops
    from supacrawler_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8),
                      app_name=f"cc-pair-{cores}")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.sparkContext.setLogLevel("ERROR")
    textops.quality_score(spark, bss.CORPUS).count()  # warmup
    walls = {}
    for name in OPS:
        t0 = time.time()
        getattr(textops, name)(spark, bss.CORPUS).count()
        walls[name] = round(time.time() - t0, 2)
    spark.stop()
    return walls


def main() -> int:
    pairs = int(os.environ.get("PAIRS", "2"))
    bss.build_corpus()
    per_pair = []
    for p in range(pairs):
        w2 = op_walls(2)
        w8 = op_walls(8)
        eff = {k: round((w2[k] / w8[k]) / 4, 3) for k in OPS}
        per_pair.append({"pair": p, "wall_2": w2, "wall_8": w8,
                         "eff": eff})
        print(json.dumps(per_pair[-1]), flush=True)
    best = {k: round(max(pp["eff"][k] for pp in per_pair), 3)
            for k in OPS}
    med = {k: round(sorted(pp["eff"][k] for pp in per_pair)[pairs // 2],
                    3) for k in OPS}
    print(json.dumps({"metric": "cc_pair_scaling_eff",
                      "eff_median": med, "eff_best": best,
                      "pairs": per_pair, "replicate": bss.R}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
