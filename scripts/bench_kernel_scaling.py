#!/usr/bin/env python
"""Spark-free parallel-scaling ceiling of the extraction kernel.

The crawl's dominant parallel work W is the pure-Python per-page
extraction (parse + markdown + text + links + title + metadata). This
script runs EXACTLY that kernel over K OS processes — no Spark, no
shuffle, no driver, no scheduler — so the measured K->4K ratio is the
*hardware* ceiling of this box (shared memory bandwidth / L3 / turbo
headroom), not an engine property. Any end-to-end Spark scaling number
on the same box must be read against this ceiling: a multi-executor
cluster gives each executor its own memory system, a single box does
not.

Usage: python scripts/bench_kernel_scaling.py [n_pages=16000]
Prints one JSON line: pages/sec at K in {1,2,4,8,16} plus the
2->8 and 4->16 hardware efficiencies.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pages(n):
    from supacrawler_spark.sources.synth import synth_html
    return [synth_html(i, f"synthetic corpus text payload {i} "
                          f"with words {i % 97} {i % 31}", n, weight=2)
            .encode() for i in range(n)]


def work(htmls):
    from supacrawler_spark import htmlkit as H
    for hb in htmls:
        html = bytes(hb).decode("utf-8", "replace")
        root = H.parse_html(html)
        md = H.crawl_markdown(html, root=root)
        if len(md.strip()) >= 10:
            H.extract_text(root=root)
            H.extract_links(html, "https://hot.example.org/x")
            H.extract_title(html)
            H.extract_metadata(html, "https://hot.example.org/x", 200)
            list(H.extract_hrefs(root=root))
    return len(htmls)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    htmls = _pages(n)
    out = {"metric": "kernel_pages_per_sec", "n_pages": n, "levels": {}}
    for k in (1, 2, 4, 8, 16):
        chunks = [htmls[i::k] for i in range(k)]
        with mp.Pool(k) as p:
            p.map(work, [c[:200] for c in chunks])  # warm imports
            t = time.time()
            p.map(work, chunks)
            dt = time.time() - t
        out["levels"][k] = round(n / dt, 1)
        print(f"k={k:2d}: {n / dt:8.1f} pages/s ({dt:.1f}s)",
              file=sys.stderr, flush=True)
    lv = out["levels"]
    out["hw_eff_2_to_8"] = round(lv[8] / lv[2] / 4, 3)
    out["hw_eff_4_to_16"] = round(lv[16] / lv[4] / 4, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
