"""robots.txt parsing -> the engine's broadcast rule dim (F5/J4).

The reference's robots service is an allow-all STUB
(internal/platform/robots/robots.go:7) — the engine already enforces
rules through ``urlkit.robots_allowed`` (longest-prefix-wins) over a
``robots_df(host, allow_prefixes, disallow_prefixes, crawl_delay_ms)``
dim. This module closes the loop from raw crawled ``/robots.txt``
BYTES to that dim, per the public REP spec (RFC 9309):

- groups = one or more consecutive ``User-agent`` lines followed by
  rules; a rule line after rules ends the group on the next
  ``User-agent``;
- group selection: the group whose agent token is the LONGEST
  case-insensitive substring of our product token wins; ``*`` is the
  fallback; groups with the same specificity merge in file order;
  a matched specific group SHADES the ``*`` group (no merge across
  specificities);
- ``Allow``/``Disallow`` values are path prefixes (empty value = no
  rule); ``Crawl-delay`` seconds -> ms; ``#`` comments stripped;
  field names case-insensitive.

Parsing runs as one mapInPandas pass over (host, robots_txt) rows —
the same batch shape as the extraction kernel; output is the slim
rule dim that ``run_crawl(robots_df=...)`` broadcasts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_AGENT = "supacrawlerbot"   # the reference's published bot UA


def parse_robots_txt(text: str, agent: str = DEFAULT_AGENT) -> dict:
    """Parse one robots.txt into
    ``{"allow": [...], "disallow": [...], "crawl_delay_ms": int|None}``
    for ``agent``. Rules keep file order."""
    agent = agent.lower()
    groups = []            # (tokens, allow, disallow, delay_ms)
    cur = None
    in_header = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not in_header:
                cur = {"tokens": [], "allow": [], "disallow": [],
                       "delay_ms": None}
                groups.append(cur)
            cur["tokens"].append(value.lower())
            in_header = True
        elif field in ("allow", "disallow", "crawl-delay"):
            if cur is None:
                continue          # rules before any user-agent: ignored
            in_header = False
            if field == "crawl-delay":
                try:
                    cur["delay_ms"] = int(float(value) * 1000)
                except ValueError:
                    pass
            elif value:           # empty path = no rule
                cur[field].append(value)
        else:
            # unknown field (sitemap, host, ...): ends a header run but
            # does not end the group
            in_header = False

    # group selection: longest matching token wins; '*' fallback
    def specificity(g):
        best = -1
        for t in g["tokens"]:
            if t == "*":
                best = max(best, 0)
            elif t and t in agent:
                best = max(best, len(t))
        return best

    best = max((specificity(g) for g in groups), default=-1)
    out = {"allow": [], "disallow": [], "crawl_delay_ms": None}
    if best < 0:
        return out
    for g in groups:                      # merge equals, file order
        if specificity(g) == best:
            out["allow"] += g["allow"]
            out["disallow"] += g["disallow"]
            if g["delay_ms"] is not None:
                out["crawl_delay_ms"] = g["delay_ms"]
    return out


ROBOTS_RULE_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("pos", T.IntegerType()),
    T.StructField("value", T.StringType()),
])


def parse_robots_rules(df: DataFrame, agent: str = DEFAULT_AGENT,
                       host_col: str = "host",
                       text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> exploded scalar rule rows
    (host, kind ∈ {allow, disallow, crawl_delay_ms}, pos, value) via
    one mapInPandas pass. The flat shape is driver-oracle-friendly;
    ``robots_df_from_texts`` folds it into the broadcast dim."""

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                parsed = parse_robots_txt(getattr(r, text_col), agent)
                h = getattr(r, host_col)
                for kind in ("allow", "disallow"):
                    for i, p in enumerate(parsed[kind]):
                        rows.append({"host": h, "kind": kind,
                                     "pos": i, "value": p})
                if parsed["crawl_delay_ms"] is not None:
                    rows.append({"host": h, "kind": "crawl_delay_ms",
                                 "pos": 0,
                                 "value": str(parsed["crawl_delay_ms"])})
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROBOTS_RULE_SCHEMA])

    return df.mapInPandas(work, ROBOTS_RULE_SCHEMA)


def robots_df_from_texts(df: DataFrame, agent: str = DEFAULT_AGENT,
                         host_col: str = "host",
                         text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> the engine's broadcast robots dim
    (host, allow_prefixes, disallow_prefixes, crawl_delay_ms), ready
    for ``run_crawl(robots_df=...)``."""
    from pyspark.sql import functions as F

    rules = parse_robots_rules(df, agent, host_col, text_col)
    # The host list comes from ALL rule rows (including crawl_delay_ms):
    # a robots.txt whose matched group carries only a Crawl-delay
    # directive still yields a dim row, keeping its delay enforceable.
    hosts = rules.select("host").distinct()
    arr = (rules.filter(F.col("kind").isin("allow", "disallow"))
           .groupBy("host").pivot("kind", ["allow", "disallow"])
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("pos", "value"))),
               lambda s: s["value"])))
    delay = (rules.filter(F.col("kind") == "crawl_delay_ms")
             .select("host", F.col("value").cast("int")
                     .alias("crawl_delay_ms")))
    empty = F.array().cast("array<string>")
    return (hosts.join(arr, "host", "left").join(delay, "host", "left")
            .select("host",
                    F.coalesce("allow", empty).alias("allow_prefixes"),
                    F.coalesce("disallow", empty)
                    .alias("disallow_prefixes"),
                    "crawl_delay_ms"))


def synth_robots_txt(hid: int) -> str:
    """Deterministic robots.txt fixture for host ``hid`` — exercises
    comments, blank lines, mixed case, multi-agent headers, shadowing:
    every host has a ``*`` group (Disallow /product/, Allow
    /product/open); even hids add a more specific supacrawlerbot group
    (Disallow /news/, Crawl-delay 1+hid%5) that SHADES the ``*``
    group. The a-priori expectation is mirrored by the SQL oracle."""
    lines = [
        "# synthetic robots fixture",
        "Sitemap: https://example.org/sitemap.xml",
        "",
        "User-Agent: *",
        "Disallow: /product/",
        "Allow: /product/open",
    ]
    if hid % 3 == 0:
        lines.append("Disallow:")          # empty = no rule
    if hid % 2 == 0:
        lines += [
            "",
            "user-agent: SupacrawlerBot   # specific group",
            "USER-AGENT: irrelevantbot",
            f"Crawl-Delay: {1 + hid % 5}",
            "Disallow: /news/",
        ]
    if hid % 4 == 1:
        # a second Sitemap line AFTER the groups (RFC 9309 allows the
        # field anywhere), lowercase to exercise case-insensitivity
        lines += ["", "sitemap: https://example.org/sitemap-news.xml"]
    return "\n".join(lines)


# Sitemap field: case-insensitive, anywhere in the file, outside any
# group (RFC 9309 §2.3 "other records"). The rule parser above treats
# it as an unknown field (ends a header run, robotskit.py:70); this
# extractor is the discovery path that feeds sitemap.parse_sitemap →
# seeds_from_sitemaps, closing the robots → sitemap → seeds loop.
_SITEMAP_LINE_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"


def robots_sitemaps(df: DataFrame, host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """Extract Sitemap directives from raw robots.txt bodies —
    native regexp over the text column (map-only, codegen, no UDF);
    posexplode keeps in-file order as ``pos``."""
    from pyspark.sql import functions as F
    return df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.regexp_extract_all(
            F.col(txt_col), F.lit(_SITEMAP_LINE_RE), F.lit(1)))
        .alias("pos", "sitemap_url"))
