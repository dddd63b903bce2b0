"""Scrape-service page diagnostics (SURVEY.md §2.2 F8, §2.4 A4).

Batch re-expression of the reference's live-browser page checks:

- ``cloudflare_blocked``: the Cloudflare-challenge detector
  (isCloudflareBlocked, internal/core/scrape/service.go:1077-1107) as
  a native Spark column expression — pure ``contains`` algebra over
  (status_code, title, content), JVM-side, codegen-friendly.
- ``signature_of_html`` / ``content_signature``: the page content
  signature (getContentSignature, scrape/service.go:917-1015) —
  visible-text length, element/link/loading-indicator counts and the
  JS 32-bit rolling content hash — computed from static html by the
  shared htmlkit DOM in one Arrow-batched pass.
- ``significant_change``: the JS-rendering change heuristics
  (hasSignificantContentChange, scrape/service.go:1017-1074) as a
  native boolean column over an (initial, final) signature pair.

Static-parse divergence (documented): the browser evaluates computed
CSS (display:none / visibility:hidden) when collecting visible text
and element counts; a batch engine over raw html bytes cannot, so
hidden-by-stylesheet elements count as visible here. Inline
``script/style/noscript`` exclusion — the part that matters for
content pages — matches the reference exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from supacrawler_spark import htmlkit as H

# querySelectorAll('*') filter list, scrape/service.go:955-961
_NON_CONTENT_TAGS = frozenset(
    ("script", "style", "noscript", "meta", "link", "title"))
# treewalker reject list, scrape/service.go:936-939
_TEXT_SKIP_TAGS = frozenset(("script", "style", "noscript"))
# loading-indicator selector, scrape/service.go:966-969
_LOADING_CLASSES = frozenset(
    ("loading", "spinner", "skeleton", "placeholder", "loader", "shimmer"))

SIGNATURE_SCHEMA = StructType([
    StructField("text_length", IntegerType()),
    StructField("element_count", IntegerType()),
    StructField("link_count", IntegerType()),
    StructField("async_load_indicators", IntegerType()),
    StructField("content_hash", StringType()),
])


def _js_string_hash(text: str) -> str:
    """The page's own change-detection hash (scrape/service.go:972-978):
    ``h = ((h << 5) - h + charCodeAt(i)) | 0`` over UTF-16 code units,
    rendered via JS Number.toString. 31*h with int32 wraparound."""
    h = 0
    # charCodeAt iterates UTF-16 code units, not code points
    for b0, b1 in zip(*[iter(text.encode("utf-16-le"))] * 2):
        c = b0 | (b1 << 8)
        h = (31 * h + c) & 0xFFFFFFFF
    if h >= 0x80000000:  # JS `hash & hash` coerces to signed int32
        h -= 0x100000000
    return str(h)


def signature_of_html(html: "str | None") -> tuple:
    """Pure kernel: (text_length, element_count, link_count,
    async_load_indicators, content_hash) of one page."""
    if html is None:
        return 0, 0, 0, 0, "0"
    root = H.parse_html(html)

    # visible text: raw textContent concatenation (no collapsing —
    # the treewalker appends node.textContent verbatim) of body text
    # nodes outside script/style/noscript subtrees
    body = H._find_body(root)
    parts: list[str] = []

    def walk_text(n):
        for c in n.children:
            if c.tag is None:
                parts.append(c.text)
            elif c.tag not in _TEXT_SKIP_TAGS:
                walk_text(c)

    walk_text(body)
    visible_text = "".join(parts)

    elements = links = loaders = 0
    for n in H._walk(root):
        if n.tag is None:
            continue
        if n.tag not in _NON_CONTENT_TAGS:
            elements += 1
        if n.tag == "a" and "href" in n.attrs:
            links += 1
        classes = n.attrs.get("class", "")
        if (
            (classes and _LOADING_CLASSES & set(classes.lower().split()))
            or "data-loading" in n.attrs
            or "data-lazy" in n.attrs
            or n.attrs.get("aria-busy") == "true"
        ):
            loaders += 1
    # text_length mirrors JS `visibleText.length` = UTF-16 code units
    # (astral chars count 2), consistent with _js_string_hash's
    # charCodeAt iteration — NOT Python code points.
    return (len(visible_text.encode("utf-16-le")) // 2, elements, links,
            loaders, _js_string_hash(visible_text))


@pandas_udf(SIGNATURE_SCHEMA)
def _signature_udf(html: pd.Series) -> pd.DataFrame:
    rows = [signature_of_html(
        bytes(h).decode("utf-8", "replace") if h is not None else None)
        for h in html]
    return pd.DataFrame(rows, columns=[f.name for f in SIGNATURE_SCHEMA])


def content_signature(df: DataFrame, html_col: str = "html",
                      out_col: str = "signature") -> DataFrame:
    """A4: add the content-signature struct column (one Arrow batch
    pass; the html column is pruned immediately after, so fat bytes
    never shuffle onward)."""
    return df.withColumn(out_col, _signature_udf(F.col(html_col)))


def cloudflare_blocked(status_code: Column, title: Column,
                       content: Column) -> Column:
    """F8 (isCloudflareBlocked, scrape/service.go:1077-1107): a 403
    whose title or content carries a Cloudflare challenge marker.
    Pure JVM-side ``contains`` algebra — no UDF in this predicate."""
    t = F.coalesce(title, F.lit(""))
    c = F.coalesce(content, F.lit(""))
    # eqNullSafe: a nil StatusCode is FALSE (not NULL) like the Go
    # `result.StatusCode == 403` on a zero value — a negated use of
    # this predicate must not drop null-status rows.
    return status_code.eqNullSafe(F.lit(403)) & (
        t.contains("Just a moment")
        | t.contains("Checking your browser")
        | t.contains("Attention Required")
        | (c.contains("Waiting for") & c.contains("to respond"))
        | (c.contains("Cloudflare") & c.contains("Ray ID"))
    )


def significant_change(
    i_text: Column, i_elem: Column, i_link: Column, i_async: Column,
    i_hash: Column, f_text: Column, f_elem: Column, f_link: Column,
    f_async: Column, f_hash: Column,
) -> Column:
    """A4 (hasSignificantContentChange, scrape/service.go:1017-1074):
    OR of the five change heuristics over an (initial, final)
    signature pair. The 30% text-growth test is expressed in exact
    integer arithmetic (10*(f-i) > 3*i) — deterministic across
    engines, no float-division hash drift."""
    text_grew = F.when(
        i_text > 0, (f_text - i_text) * 10 > i_text * 3
    ).otherwise(f_text > 200)
    return (
        text_grew
        | ((f_elem - i_elem) > 50)
        | ((i_async - f_async) > 0)
        | ((f_link - i_link) > 5)
        | ((i_hash != f_hash) & (f_text > i_text + 100))
    )


# ---------------------------------------------------------------------------
# Recrawl scheduling from observation history
# ---------------------------------------------------------------------------

US_PER_DAY = 86_400_000_000
RATE_SCALE = 1_000          # changes/day reported on an exact e3 grid


def recrawl_schedule(spark_or_df, sf_dir: str = None) -> "DataFrame":
    """Change-frequency recrawl scheduler — the batch generalization
    of the reference's per-page change detection (significant_change /
    hasSignificantContentChange, scrape/service.go:1017-1074): given a
    page's OBSERVATION HISTORY (fetch timestamp + observed state), a
    100-TB crawler must decide which URLs to refetch first. Estimate =
    observed state transitions per day; refetch hottest first.

    Input contract: an observations table (page key, ts, tiebreak id,
    observed state). The driver fixture reads `events` as that shape
    (user_id = page key, event_type = observed state — the
    content-signature proxy; ts ordering broken deterministically by
    event_id so equal timestamps cannot desync engines).

    Exact arithmetic: changes/day is reported as
    ``n_changes * US_PER_DAY * RATE_SCALE DIV span_us`` (BIGINT
    integer division — no float-division hash drift); single-
    observation pages get a NULL rate and sort to the back of the
    schedule, newest-first.

    Scale shape: the transition count is a lag window and the per-page
    rollup a groupBy on the SAME key, so both ride ONE hash exchange
    on the page key (pinned by tests/test_recrawl.py plan assertion);
    the final schedule ranking runs over the page-bounded rollup
    (|pages| rows, not |observations|), the same bounded-global-rank
    shape as top_terms/frontier_rank."""
    from pyspark.sql import Window

    ev = (spark_or_df.read.parquet(f"{sf_dir}/events.parquet")
          if sf_dir is not None else spark_or_df)
    obs = ev.select(F.col("user_id").alias("page_id"), "ts",
                    "event_id", F.col("event_type").alias("state"))

    w = Window.partitionBy("page_id").orderBy("ts", "event_id")
    tagged = obs.withColumn("prev_state", F.lag("state").over(w))
    per = tagged.groupBy("page_id").agg(
        F.count("*").alias("n_obs"),
        F.sum(F.when(F.col("prev_state").isNotNull()
                     & (F.col("prev_state") != F.col("state")), 1)
              .otherwise(0)).cast("bigint").alias("n_changes"),
        (F.unix_micros(F.max("ts").cast("timestamp"))
         - F.unix_micros(F.min("ts").cast("timestamp")))
        .alias("span_us"),
        F.max("ts").alias("last_seen"))

    rate = F.when(
        F.col("span_us") > 0,
        F.expr(f"CAST((n_changes * {US_PER_DAY * RATE_SCALE}) "
               "DIV span_us AS BIGINT)"))
    ranked = per.withColumn("changes_per_day_e3", rate)
    order = Window.orderBy(F.col("changes_per_day_e3").desc_nulls_last(),
                           F.col("last_seen").desc(),
                           F.col("page_id").asc())
    return ranked.select(
        "page_id", "n_obs", "n_changes", "span_us",
        "changes_per_day_e3",
        F.row_number().over(order).cast("int").alias("fetch_order"))


def recrawl_schedule_oracle_sql() -> str:
    return (
        "WITH o AS (SELECT user_id AS page_id, ts, event_id, "
        "event_type AS state, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev_state FROM events), "
        "p AS (SELECT page_id, count(*) AS n_obs, "
        "CAST(sum(CASE WHEN prev_state IS NOT NULL "
        "AND prev_state <> state THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_changes, "
        "CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) "
        "AS span_us, max(ts) AS last_seen FROM o GROUP BY page_id), "
        "r AS (SELECT *, CASE WHEN span_us > 0 THEN "
        f"CAST((n_changes * {US_PER_DAY * RATE_SCALE}) // span_us "
        "AS BIGINT) END AS changes_per_day_e3 FROM p) "
        "SELECT page_id, n_obs, n_changes, span_us, "
        "changes_per_day_e3, CAST(row_number() OVER ("
        "ORDER BY changes_per_day_e3 DESC NULLS LAST, "
        "last_seen DESC, page_id ASC) AS INT) AS fetch_order FROM r")
