"""F8 Cloudflare detection + A4 content signature / change detection
(scrape/service.go:917-1107)."""

import pyspark.sql.functions as F
import pytest

from supacrawler_spark import scrapeops as S


# ---------------------------------------------------------------------------
# JS string hash (scrape/service.go:972-978)
# ---------------------------------------------------------------------------

def test_js_hash_vectors():
    # 'abc': 97 -> 31*97+98=3105 -> 31*3105+99=96354 (hand-computed)
    assert S._js_string_hash("") == "0"
    assert S._js_string_hash("abc") == "96354"
    # int32 wraparound: result must stay in signed-int32 range
    assert -2**31 <= int(S._js_string_hash("z" * 200)) < 2**31


def test_js_hash_utf16_code_units():
    # charCodeAt iterates UTF-16 code units: U+1F600 = D83D DE00
    # h = 31*0xD83D + 0xDE00 = 1772899
    assert S._js_string_hash("\U0001F600") == "1772899"


# ---------------------------------------------------------------------------
# Signature kernel (getContentSignature, scrape/service.go:917-1015)
# ---------------------------------------------------------------------------

_HTML = (
    "<html><head><title>T</title><meta charset='utf-8'>"
    "<link rel='x' href='y'><style>p{}</style></head>"
    "<body><div class='loading'>w</div>"
    "<span data-lazy='1'>s</span><b aria-busy='true'>b</b>"
    "<script>var x = 'invisible';</script>"
    "<noscript>also invisible</noscript>"
    "<p>hello</p><a href='/1'>one</a><a href='/2'>two</a><a>noref</a>"
    "</body></html>"
)


def test_signature_counts():
    text_len, elems, links, loaders, h = S.signature_of_html(_HTML)
    # visible text: w s b hello one two noref (script/noscript excluded,
    # raw concatenation, no collapsing)
    assert text_len == len("w") + len("s") + len("b") + len("hello") + \
        len("one") + len("two") + len("noref")
    # elements: html head body div span b p a a a  (title/meta/link/
    # style excluded; script/noscript ARE excluded by the filter list)
    assert elems == 10 - 2 + 2  # html,head,body,div,span,b,p,a,a,a = 10
    assert links == 2           # a[href] only
    assert loaders == 3         # .loading, [data-lazy], [aria-busy=true]
    assert h == S._js_string_hash("wsbhelloonetwonoref")


def test_signature_none_html():
    assert S.signature_of_html(None) == (0, 0, 0, 0, "0")


def test_signature_kernel_vs_template_oracle():
    """The content_signature golden derives from the synth TEMPLATE's
    a-priori rules (sources/synth.expected_signature), not from this
    kernel — this test is the cross-validation: parser + walker +
    counters vs independent document-order template math, across every
    template branch (%3 nav widths, %5 sizes, %7 patho, %11 dates,
    %13 sidebar, hot/cold hosts)."""
    import duckdb

    from supacrawler_spark.sources.synth import (
        expected_signature,
        synth_html,
    )
    from tests.conftest import SF_DIR

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 120").fetchall()
    n = len(rows)
    for i, t in rows:
        got = S.signature_of_html(synth_html(int(i), t, n))
        want = expected_signature(int(i), t, n)
        assert got == want, f"doc {i}: kernel {got} != template {want}"


def test_screenshot_kernel_vs_independent_spec():
    """screenshots.render_screenshot / artifact_name vs the golden
    script's independent byte-level re-derivation of the BMP layout
    and naming rule."""
    from scripts.make_goldens import _bmp_independent, _name_independent
    from supacrawler_spark.screenshots import artifact_name, render_screenshot

    for u in ("https://hot.example.org/blog/p0",
              "https://h7.example.org/docs/p91?x=1&y=2#frag",
              "https://h1.example.org/" + "long" * 40 + "%20end"):
        assert render_screenshot(u) == _bmp_independent(u)
        assert artifact_name(u, "19700101_000000") == \
            _name_independent(u, "19700101_000000")


def test_signature_text_length_utf16_units():
    # JS visibleText.length counts UTF-16 code units: an astral char
    # (U+1F600, surrogate pair) counts 2 — consistent with the hash's
    # charCodeAt iteration.
    text_len, _, _, _, h = S.signature_of_html(
        "<html><body><p>a\U0001F600</p></body></html>")
    assert text_len == 3
    assert h == S._js_string_hash("a\U0001F600")


# ---------------------------------------------------------------------------
# Cloudflare predicate (isCloudflareBlocked, scrape/service.go:1077-1107)
# ---------------------------------------------------------------------------

CF_CASES = [
    # (status, title, content, blocked)
    (403, "Just a moment...", "x", True),
    (403, "Checking your browser before access", "x", True),
    (403, "Attention Required! | Cloudflare", "x", True),
    (403, "t", "Waiting for example.org to respond", True),
    (403, "t", "Cloudflare Ray ID: 8c1", True),
    (403, "t", "Cloudflare mentioned, no ray", False),   # needs both
    (403, "t", "Waiting for nothing", False),            # needs both
    (200, "Just a moment...", "Cloudflare Ray ID", False),  # not 403
    (403, None, None, False),
    # nil StatusCode must yield FALSE, not NULL (null-propagating ==
    # would poison a negated use): reference zero-value semantics
    (None, "Just a moment...", "Cloudflare Ray ID: 8c1", False),
]


def test_cloudflare_blocked(spark):
    df = spark.createDataFrame(
        [(i, s, t, c) for i, (s, t, c, _) in enumerate(CF_CASES)],
        "id int, status int, title string, content string")
    got = {
        r["id"]: r["b"] for r in df.select(
            "id", S.cloudflare_blocked(
                F.col("status"), F.col("title"), F.col("content")
            ).alias("b")).collect()
    }
    for i, (_, _, _, want) in enumerate(CF_CASES):
        assert got[i] is want, (i, CF_CASES[i])


# ---------------------------------------------------------------------------
# Change heuristics (hasSignificantContentChange,
# scrape/service.go:1017-1074) — exact threshold boundaries
# ---------------------------------------------------------------------------

BASE = dict(i_text=1000, i_elem=10, i_link=3, i_async=0, i_hash="h",
            f_text=1000, f_elem=10, f_link=3, f_async=0, f_hash="h")

CHANGE_CASES = [
    (dict(), False),
    # 1. text growth: > 30% strictly
    (dict(f_text=1300), False),
    (dict(f_text=1301), True),
    # empty-page branch: final > 200 strictly
    (dict(i_text=0, f_text=200), False),
    (dict(i_text=0, f_text=201), True),
    # 2. element growth: > 50 strictly
    (dict(f_elem=60), False),
    (dict(f_elem=61), True),
    # 3. loading indicators resolved: any reduction
    (dict(i_async=1, f_async=1), False),
    (dict(i_async=1, f_async=0), True),
    # 4. link growth: > 5 strictly
    (dict(f_link=8), False),
    (dict(f_link=9), True),
    # 5. hash change needs > 100 extra text
    (dict(f_hash="g", f_text=1100), False),
    (dict(f_hash="g", f_text=1101), True),
]


@pytest.mark.parametrize("delta,want", CHANGE_CASES)
def test_significant_change(spark, delta, want):
    row = dict(BASE, **delta)
    df = spark.createDataFrame([row])
    got = df.select(S.significant_change(
        F.col("i_text"), F.col("i_elem"), F.col("i_link"),
        F.col("i_async"), F.col("i_hash"), F.col("f_text"),
        F.col("f_elem"), F.col("f_link"), F.col("f_async"),
        F.col("f_hash")).alias("c")).first()["c"]
    assert got is want, (delta, want)
