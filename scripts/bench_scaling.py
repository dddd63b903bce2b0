"""Two-parallelism-level scaling evidence (BASELINE.md plan).

Runs bench.py as a subprocess at N and 4N cores (default local[4] vs
local[16]) on the same input/seed, interleaved A/B so co-tenant noise
hits both levels symmetrically. This box measurably runs 5-17% CPU
steal with multi-minute throttling episodes (see BENCH.md), so the
script reports BOTH the median and the best (min-wall) pair:
best-of-R is the standard noise rejection on shared hardware — an
external stall can only slow a run down, never speed it up.

eff = (thr_4N / thr_N) / 4  — the sandbox realization of the north
rule's "N vs 4N executors, efficiency >= 0.8".

Usage: python scripts/bench_scaling.py [runs=3] [sf_dir]
Env: SCALE_N (default 4), BENCH_* passed through to bench.py.
Prints one JSON line; does not modify BENCH.md (hand-maintained).
"""

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir, BENCH_SKIP_QUERIES="1",
               BENCH_CRAWL_RUNS="1",  # the campaign interleaves its
               #                        own repetition across levels
               BENCH_RETRY="0")  # and handles contamination at the
    #              pair level (interleaving + per-leg probes), so a
    #              leg must record once, never silently re-run
    env.setdefault("BENCH_BUDGET", "32768")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=5400)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    n_small = int(os.environ.get("SCALE_N", "4"))
    n_big = 4 * n_small
    results = {n_small: [], n_big: []}
    # corpus-cache build + JVM warm-up (discarded)
    run_bench(n_big, sf_dir)
    for i in range(runs):
        for cpus in (n_small, n_big):
            r = run_bench(cpus, sf_dir)
            results[cpus].append(r)
            print(f"run {i} cpus={cpus}: crawl={r['queries']['crawl']}s "
                  f"urls/s={r['urls_per_sec']}", file=sys.stderr, flush=True)

    def agg(fn, cpus, key):
        return round(fn(x[key] for x in results[cpus]), 2)

    # persist every raw leg (incl. bench.py's embedded kernel-probe
    # readings) so a campaign's contamination evidence survives the run
    raw_path = os.environ.get("SCALE_RAW_OUT")
    if raw_path:
        with open(raw_path, "w") as f:
            json.dump({str(k): v for k, v in results.items()}, f)

    def probes(cpus):
        return [x.get("probe_pages_per_sec") for x in results[cpus]]

    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "unit": "ratio",
        # headline value = the DOCUMENTED pass criterion (BASELINE.md):
        # median-of-runs efficiency. Best-of-R (min-wall noise
        # rejection on this shared box) is reported under eff_best.
        "value": round(
            (agg(statistics.median, n_big, "urls_per_sec")
             / agg(statistics.median, n_small, "urls_per_sec")) / 4, 3),
        "eff_best": round(
            (agg(max, n_big, "urls_per_sec")
             / agg(max, n_small, "urls_per_sec")) / 4, 3),
        "urls_per_sec_small": {
            "best": agg(max, n_small, "urls_per_sec"),
            "median": agg(statistics.median, n_small, "urls_per_sec"),
            "all": [x["urls_per_sec"] for x in results[n_small]]},
        "urls_per_sec_big": {
            "best": agg(max, n_big, "urls_per_sec"),
            "median": agg(statistics.median, n_big, "urls_per_sec"),
            "all": [x["urls_per_sec"] for x in results[n_big]]},
        "crawl_sec_small_best": round(
            min(x["queries"]["crawl"] for x in results[n_small]), 2),
        "crawl_sec_big_best": round(
            min(x["queries"]["crawl"] for x in results[n_big]), 2),
        "runs": runs,
        "sf_dir": sf_dir,
        "urls": results[n_big][-1]["urls_scheduled"],
        "pages": results[n_big][-1]["pages"],
        "n_small": n_small, "n_big": n_big,
        # per-leg co-tenancy evidence (bench.py kernel probe, start/end)
        "probes_small": probes(n_small),
        "probes_big": probes(n_big),
        "contaminated_legs": sum(
            1 for c in (n_small, n_big) for x in results[c]
            if x.get("contaminated")),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
