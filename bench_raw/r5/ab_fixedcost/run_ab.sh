#!/bin/bash
cd /root/repo
export BENCH_SKIP_QUERIES=1 BENCH_CRAWL_RUNS=1 BENCH_RETRY=0
for pair in 1 2 3; do
  for leg in old new; do
    cp /tmp/ab_r5/crawl_${leg}.py supacrawler_spark/plans/crawl.py
    echo "=== pair $pair leg $leg ==="
    python bench.py 2>/tmp/ab_r5/p${pair}_${leg}.err | tail -1 | tee /tmp/ab_r5/p${pair}_${leg}.json
  done
done
cp /tmp/ab_r5/crawl_new.py supacrawler_spark/plans/crawl.py
