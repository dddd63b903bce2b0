"""Generate golden parquet oracles for the non-SQL driver queries.

The crawl loop and single-page scrape are not SQL-expressible, but
their EXPECTED outputs are computable a priori by the pure-Python
oracle (supacrawler_spark/oracle.py — an independent transcription of
the reference algorithm, no Spark involved). This script freezes those
expectations to parquet; __spark_entry__.oracle_sql() then exposes
them as plain SELECTs, upgrading crawl_trace / scrape_markdown from
rows-only checks to full row/schema/value-hash driver checks.

Inputs are exactly what the Spark queries use: the driver-provided
documents table at sf0.01 and the deterministic synthetic web
(sources/synth.py). Regenerate (and commit) whenever the fixture
generator, the oracle, or the query parameters change:

    python scripts/make_goldens.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from supacrawler_spark import htmlkit as H  # noqa: E402
from supacrawler_spark.oracle import crawl_oracle  # noqa: E402
from supacrawler_spark.params import CrawlParams  # noqa: E402
from supacrawler_spark.sources.synth import (  # noqa: E402
    gen_seeds,
    page_url,
    synth_html,
)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens")


def _texts(limit: int) -> dict:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id < {limit} ORDER BY doc_id").fetchall()
    return {int(i): t for i, t in rows}


def _pages(limit: int) -> dict:
    texts = _texts(limit)
    n = len(texts)
    return {page_url(i): synth_html(i, texts[i], n) for i in sorted(texts)}


def golden_crawl_trace():
    """Mirror of __spark_entry__.q_crawl_trace (sf0.01, limit=150,
    seeds k=2, depth=2, link_limit=25)."""
    pages = _pages(150)
    orc = crawl_oracle(pages, gen_seeds(len(pages), k=2),
                       CrawlParams(depth=2, link_limit=25))
    cols = list(zip(*orc.trace)) or [[]] * 5
    t = pa.table({
        "crawl_ord": pa.array(cols[0], pa.int64()),
        "iter": pa.array(cols[1], pa.int32()),
        "depth": pa.array(cols[2], pa.int32()),
        "url": pa.array(cols[3], pa.string()),
        "status_code": pa.array(cols[4], pa.int32()),
    })
    pq.write_table(t, os.path.join(OUT, "crawl_trace_sf001.parquet"))
    print(f"crawl_trace golden: {t.num_rows} rows")


def golden_scrape_markdown():
    """Mirror of __spark_entry__.q_scrape_markdown (sf0.01, limit=50,
    scrape of page_url(0)): url, status_code, success, title,
    discovered."""
    pages = _pages(50)
    url = page_url(0)
    html = pages[url]
    markdown = H.crawl_markdown(html)
    success = len(markdown.strip()) >= 10
    links = H.extract_links(html, url) if success else None
    t = pa.table({
        "url": pa.array([url], pa.string()),
        "status_code": pa.array([200], pa.int32()),
        "success": pa.array([success], pa.bool_()),
        "title": pa.array([H.extract_title(html) if success else None],
                          pa.string()),
        "discovered": pa.array([len(links) if links is not None else None],
                               pa.int32()),
    })
    pq.write_table(t, os.path.join(OUT, "scrape_markdown_sf001.parquet"))
    print(f"scrape_markdown golden: success={success}")


def golden_scrape_cache_hits():
    """Mirror of __spark_entry__.q_scrape_cache_hits (sf0.01,
    limit=150): TWO independent oracle runs — A (seeds k=2, L=25)
    populates the cache, B (seeds k=3, L=40) consumes it. Extraction
    is a pure function of html (ScrapeWithCache, scrape/service.go:
    46-69 caches only valid results), so B's pages are the fresh-run
    oracle pages and the hit set is exactly B ∩ successes(A)."""
    pages = _pages(150)
    a = crawl_oracle(pages, gen_seeds(len(pages), k=2),
                     CrawlParams(depth=2, link_limit=25))
    b = crawl_oracle(pages, gen_seeds(len(pages), k=3),
                     CrawlParams(depth=2, link_limit=40))
    rows = sorted(b.pages.values(), key=lambda r: r["crawl_ord"])
    hits = [r["url"] in a.pages for r in rows]
    assert any(hits) and not all(hits), \
        "fixture must produce both cache hits and misses"
    t = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "crawl_ord": pa.array([r["crawl_ord"] for r in rows], pa.int64()),
        "status_code": pa.array([200] * len(rows), pa.int32()),
        "title": pa.array(
            [("CACHE:" + r["title"]) if h else r["title"]
             for r, h in zip(rows, hits)], pa.string()),
        "cache_hit": pa.array(hits, pa.bool_()),
    })
    pq.write_table(t, os.path.join(OUT, "scrape_cache_hits_sf001.parquet"))
    print(f"scrape_cache_hits golden: {t.num_rows} rows, "
          f"{sum(hits)} hits / {len(hits) - sum(hits)} misses")


def golden_content_signature():
    """Mirror of __spark_entry__.q_content_signature (sf0.01,
    limit=60) — INDEPENDENT oracle: expectations derive from the
    synthetic template's a-priori ground truth
    (sources/synth.expected_signature — document-order text-node
    concatenation + tag counting rules, no html parsing), NOT from the
    signature kernel the Spark UDF wraps. A parser/walker/counter bug
    in scrapeops.signature_of_html fails this golden."""
    from supacrawler_spark.sources.synth import expected_signature

    texts = _texts(60)
    n = len(texts)
    by_url = {page_url(i): expected_signature(i, texts[i], n)
              for i in sorted(texts)}
    urls = sorted(by_url)
    cols = list(zip(*(by_url[u] for u in urls)))
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "text_length": pa.array(cols[0], pa.int32()),
        "element_count": pa.array(cols[1], pa.int32()),
        "link_count": pa.array(cols[2], pa.int32()),
        "async_load_indicators": pa.array(cols[3], pa.int32()),
        "content_hash": pa.array(cols[4], pa.string()),
    })
    pq.write_table(t, os.path.join(OUT, "content_signature_sf001.parquet"))
    print(f"content_signature golden: {t.num_rows} rows")


def _bmp_independent(url: str) -> bytes:
    """Independent re-derivation of the stand-in screenshot SPEC (an
    8x8 24-bit BITMAPINFOHEADER BMP whose pixel bytes cycle md5(url)),
    byte-built here without struct.pack or any screenshots.py code —
    a packing/layout bug in render_screenshot fails this golden."""
    import hashlib

    seed = hashlib.md5(url.encode("utf-8")).digest()
    px = bytes(seed[i % 16] for i in range(8 * 8 * 3))
    le4 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    le2 = lambda v: int(v).to_bytes(2, "little")  # noqa: E731
    head = b"BM" + le4(54 + len(px)) + le2(0) + le2(0) + le4(54)
    dib = (le4(40) + le4(8) + le4(8) + le2(1) + le2(24) + le4(0)
           + le4(len(px)) + le4(2835) + le4(2835) + le4(0) + le4(0))
    return head + dib + px


def _name_independent(url: str, ts: str) -> str:
    """Independent artifact-name rule (service.go:575, 694-701):
    translate ``: / ? & = #`` -> ``-``, delete ``%``, cap 64."""
    s = url.translate(str.maketrans(":/?&=#", "------", "%"))
    return f"{ts}_{s[:64]}.bmp"


def golden_screenshot_artifacts():
    """Mirror of __spark_entry__.q_screenshot_artifacts (sf0.01,
    limit=60, desktop) — INDEPENDENT oracle: payload bytes, names and
    viewport constants re-derived from the documented artifact spec
    (_bmp_independent/_name_independent + service.go:155-196 desktop
    1920x1080), not by calling the screenshots.py kernel."""
    import hashlib

    urls = sorted(_pages(60))
    payloads = [_bmp_independent(u) for u in urls]
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "device": pa.array(["desktop"] * len(urls), pa.string()),
        "viewport_w": pa.array([1920] * len(urls), pa.int32()),
        "viewport_h": pa.array([1080] * len(urls), pa.int32()),
        "format": pa.array(["bmp"] * len(urls), pa.string()),
        "name": pa.array([_name_independent(u, "19700101_000000")
                          for u in urls], pa.string()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int32()),
        "digest": pa.array([hashlib.md5(p).hexdigest() for p in payloads],
                           pa.string()),
    })
    pq.write_table(t,
                   os.path.join(OUT, "screenshot_artifacts_sf001.parquet"))
    print(f"screenshot_artifacts golden: {t.num_rows} rows")


def _absolutize_independent(link: str, base_url: str) -> str:
    """Independent transcription of the scrape service's crude
    absolutization rules (scrape/service.go:345-371) for the golden —
    NOT imported from htmlkit, so a regression there mismatches here."""
    if link.startswith("http://") or link.startswith("https://"):
        return link
    if link.startswith("//"):
        scheme = "https:" if base_url.startswith("https://") else "http:"
        return scheme + link
    if link.startswith("/"):
        i = base_url.find("://")
        host_end = base_url.find("/", i + 3)
        root = base_url if host_end == -1 else base_url[:host_end]
        return root + link
    if link.startswith(("#", "javascript:", "mailto:")):
        return link
    sep = "" if base_url.endswith("/") else "/"
    return base_url + sep + link


def template_anchor_pairs(doc_id: int, n_docs: int, seed: int = 42):
    """A-priori (target_url, anchor_text) list for a synthetic page,
    enumerated from the TEMPLATE rules (synth_html: nav sections, then
    anchors[:4] as link{i}, then anchors[4:] as item{i}) — no html is
    parsed, so extraction bugs in htmlkit show up as golden mismatch."""
    from supacrawler_spark.sources.synth import SECTIONS, _link_specs

    raw = [(f"/{s}/index", s) for s in SECTIONS[: 1 + doc_id % 3]]
    anchors = _link_specs(doc_id, n_docs, seed)
    raw += [(a, f"link{i}") for i, a in enumerate(anchors[:4])]
    raw += [(a, f"item{i}") for i, a in enumerate(anchors[4:])]
    base = page_url(doc_id, seed)
    out = []
    for href, text in raw:
        href = href.strip()
        if not href:
            continue
        url = _absolutize_independent(href, base)
        if url.startswith("http://") or url.startswith("https://"):
            out.append((url, text))
    return out


def golden_anchor_text():
    """Mirror of graph.anchor_text (sf0.01, limit=ANCHOR_PAGES):
    per-target n_refs / n_sources / n_texts / top_text / top_count,
    ties on top_count broken to the lexicographically greatest text
    (same max(struct(n, text)) rule as the Spark fold)."""
    from collections import Counter, defaultdict

    from supacrawler_spark.graph import ANCHOR_PAGES

    n = ANCHOR_PAGES
    texts = Counter()            # (target, text) -> occurrences
    sources = defaultdict(set)   # target -> {src pages}
    for doc_id in range(n):
        src = page_url(doc_id)
        for url, text in template_anchor_pairs(doc_id, n):
            texts[(url, text)] += 1
            sources[url].add(src)
    per_target = defaultdict(list)
    for (url, text), c in texts.items():
        per_target[url].append((c, text))
    urls = sorted(per_target)
    rows = {"target_url": [], "n_refs": [], "n_sources": [],
            "n_texts": [], "top_text": [], "top_count": []}
    for url in urls:
        variants = per_target[url]
        top_c, top_t = max(variants)
        rows["target_url"].append(url)
        rows["n_refs"].append(sum(c for c, _ in variants))
        rows["n_sources"].append(len(sources[url]))
        rows["n_texts"].append(len(variants))
        rows["top_text"].append(top_t)
        rows["top_count"].append(top_c)
    t = pa.table({
        "target_url": pa.array(rows["target_url"], pa.string()),
        "n_refs": pa.array(rows["n_refs"], pa.int64()),
        "n_sources": pa.array(rows["n_sources"], pa.int64()),
        "n_texts": pa.array(rows["n_texts"], pa.int64()),
        "top_text": pa.array(rows["top_text"], pa.string()),
        "top_count": pa.array(rows["top_count"], pa.int64()),
    })
    pq.write_table(t, os.path.join(OUT, "anchor_text_sf001.parquet"))
    print(f"anchor_text golden: {t.num_rows} targets")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    golden_crawl_trace()
    golden_scrape_markdown()
    golden_scrape_cache_hits()
    golden_content_signature()
    golden_screenshot_artifacts()
    golden_anchor_text()
