"""Anchor-text corpus (graph.anchor_pairs_df / anchor_text_agg):
extraction-kernel unit coverage + a Python brute-force aggregation twin
over the synthetic web (independent of both the Spark fold and the
template-enumerated driver golden)."""

from collections import Counter, defaultdict

from supacrawler_spark import htmlkit as H
from supacrawler_spark.graph import anchor_pairs_df, anchor_text_agg


def test_extract_anchor_pairs_units():
    base = "https://h1.example.org/docs/p1"
    html = (
        '<html><body>'
        '<a href="/a/index">Docs</a>'
        '<a href="https://other.org/x">ext</a>'
        '<a href="//h1.example.org/pp">proto-rel</a>'
        '<a href="rel7">relative</a>'
        '<a href="#top">frag</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="/img"><img src="i.png"></a>'
        '<a href="/multi"><b>Bold</b>  and\n spaced</a>'
        '<a href="/dup">one</a><a href="/dup">one</a>'
        '</body></html>')
    pairs = H.extract_anchor_pairs(html, base)
    assert pairs == [
        ("https://h1.example.org/a/index", "Docs"),
        ("https://other.org/x", "ext"),
        ("https://h1.example.org/pp", "proto-rel"),
        ("https://h1.example.org/docs/p1/rel7", "relative"),
        ("https://h1.example.org/img", ""),          # image link: empty text
        ("https://h1.example.org/multi", "Bold and spaced"),
        ("https://h1.example.org/dup", "one"),       # occurrences kept
        ("https://h1.example.org/dup", "one"),
    ]


def _py_agg(pairs):
    """Brute-force per-target profile with the same tie rule
    (max count, then lexicographically greatest text)."""
    by_text = Counter()
    srcs = defaultdict(set)
    for tgt, txt, src in pairs:
        by_text[(tgt, txt)] += 1
        srcs[tgt].add(src)
    rows = {}
    per = defaultdict(list)
    for (tgt, txt), c in by_text.items():
        per[tgt].append((c, txt))
    for tgt, variants in per.items():
        top_c, top_t = max(variants)
        rows[tgt] = (sum(c for c, _ in variants), len(srcs[tgt]),
                     len(variants), top_t, top_c)
    return rows


def test_anchor_agg_matches_python_twin(spark, web):
    pages_df, local, _ = web
    want = _py_agg([(t, x, src)
                    for src, html in local.items()
                    for t, x in H.extract_anchor_pairs(html, src)])
    got = {r["target_url"]: (r["n_refs"], r["n_sources"], r["n_texts"],
                             r["top_text"], r["top_count"])
           for r in anchor_text_agg(anchor_pairs_df(pages_df)).collect()}
    assert got == want
    assert len(got) > 10
    # sanity of the fixture: at least one target has competing texts
    assert any(v[2] > 1 for v in got.values())


def test_anchor_pairs_survive_non_utf8_page(spark):
    """One latin-1 page in a binary corpus must not kill the stage:
    the 0xE9 byte decodes to U+FFFD and extraction proceeds."""
    html = ('<html><body><a href="/café-menu">Café</a>'
            "</body></html>").encode("latin-1")
    pages = spark.createDataFrame(
        [("https://h1.example.org/p", bytearray(html))],
        "url string, html binary")
    rows = anchor_pairs_df(pages).collect()
    assert len(rows) == 1
    assert rows[0]["anchor_text"] == "Caf�"
