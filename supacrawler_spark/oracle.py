"""Deterministic single-threaded crawl oracle.

A pure-Python, no-Spark transcription of the reference crawl algorithm
(SURVEY.md §5.2.1) under the engine's *batch-wave determinization* of
the reference's racy worker interleaving (SURVEY.md §2.10). The Spark
engine (plans/crawl.py) must match this EXACTLY — ordered trace, seen
set, per-url markdown/text bytes, statistics.

Spec (each rule cites the reference behavior it determinizes):

- Waves: iteration i fetches a politeness+budget-capped prefix of the
  frontier in the total order K = (depth, parent_ord, link_pos, url);
  seeds are wave-0 rows with (depth=0, parent_ord=-1,
  link_pos=seed_rank). This is BFS with per-page document link order —
  the deterministic semantics of colly's BFS (mapper/service.go:41,
  108-212) + the 2-worker fetch pool (crawl/service.go:515-517).
- Politeness: at most B(host) fetches per host per wave (colly
  LimitRule Parallelism, mapper/service.go:93); the rest defer to the
  next wave keeping their K.
- Global budget: with link_limit L > 0, at most (L - successes so far)
  URLs are scheduled per wave (accept() gate, crawl/service.go:522-544;
  failures release budget 564-571); final results are the first L
  successes in crawl order (HandleCrawlTask truncation 373-386,
  determinized per SURVEY §2.6 L2).
- Seen: every scheduled URL becomes seen permanently (processed map,
  crawl/service.go:501-503, 522-544; the reference deletes failures
  for a retry that its own discovery dedup makes unreachable — we keep
  them, documented divergence, SURVEY §2.2 F9).
- Discovery (the mapper): a fetched page is *visited* (expanded) iff
  html exists, robots allows the page URL (OnRequest,
  mapper/service.go:175-195), and page depth < max(1, depth_param)
  (MaxDepth; child-visit rule mapper/service.go:87-89, 154). Each
  <a href> in document order is absolutized RFC-style + normalized
  (colly AbsoluteURL + normalize 127-129), then filtered: domain scope
  vs the row's seed host (includeSubdomains, 136-137), robots (138),
  patterns (141-144), first-seen dedup on the global discovered set
  (146-152). Accepted links enter the next frontier. A global
  discovery cap ML = max(1, L) (if L > 0) mirrors the mapper
  link-limit: the link that reaches the cap is still emitted, then all
  further discovery stops forever (limitReached, 153-160, 179-189).
- Seed handling: the seed is always scheduled and always becomes seen;
  it is *fetched* only if it matches patterns (streamCrawl 470-503) —
  a pattern-rejected seed produces no result/error row but is still
  expanded (the mapper visits it regardless).
- Fetch: corpus join. A URL present in pages -> status 200 + extraction
  (htmlkit kernels); success iff len(markdown.strip()) >= 10, else
  error "filtered out low-quality content" (isValidResult,
  scrape/service.go:648-668 + ScrapeWithCache 46-48). A URL absent ->
  same error with status 404. With fresh=True, robots is also checked
  at fetch (ScrapeURL scrape/service.go:71-75) -> error "disallowed by
  robots.txt"; non-fresh crawls use ScrapeWithCache which does not
  robots-check (crawl/service.go:637-663).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from supacrawler_spark import htmlkit as H
from supacrawler_spark import urlkit as U
from supacrawler_spark.params import CrawlParams  # noqa: F401 (shared spec)

ERR_LOW_QUALITY = "filtered out low-quality content"
ERR_ROBOTS = "disallowed by robots.txt"
DEFAULT_HOST_BUDGET = 10  # colly LimitRule Parallelism (mapper/service.go:93)


@dataclass
class OracleResult:
    trace: list = field(default_factory=list)     # (crawl_ord, iter, depth, url, status)
    pages: dict = field(default_factory=dict)     # url -> page record (successes, truncated)
    errors: dict = field(default_factory=dict)    # url -> error string
    seen: set = field(default_factory=set)
    stats: dict = field(default_factory=dict)
    waves: list = field(default_factory=list)     # per-wave scheduled counts


def _robots_fn(robots_rules):
    if not robots_rules:
        return lambda url: True

    def allowed(url):
        host = U.extract_host(url)
        rule = robots_rules.get(host)
        if rule is None:
            return True
        try:
            path = U.urlsplit(url).path
        except ValueError:
            return False
        return U.robots_allowed(path, rule.get("disallow"), rule.get("allow"))

    return allowed


def crawl_oracle(
    pages: "dict[str, str]",
    seeds: "list[tuple[str, int]]",
    params: CrawlParams,
    politeness: "dict[str, int] | None" = None,
    robots_rules: "dict | None" = None,
    politeness_delay: "dict[str, int] | None" = None,
) -> OracleResult:
    """Run the deterministic crawl over an in-memory corpus.

    ``pages``: canonical url -> html string. ``seeds``: (url,
    seed_rank). ``politeness``: host -> per-wave budget (default 10).
    ``robots_rules``: host -> {"allow": [...], "disallow": [...],
    "crawl_delay_ms": int (optional)}. ``politeness_delay``: host ->
    delay_ms (the politeness dim's delay column).

    Per-host delays fold into the budget exactly as the engine does:
    effective delay d = max(politeness_delay, robots crawl_delay_ms);
    B_eff(host) = min(budget, ceil(wave_window_ms / d)) with integer
    ceil (W + d - 1) // d. A host with d > W still gets 1 slot/wave.
    """
    politeness = politeness or {}
    politeness_delay = politeness_delay or {}
    robots_ok = _robots_fn(robots_rules)
    W = params.wave_window_ms

    def _budget(host):
        b = politeness.get(host, DEFAULT_HOST_BUDGET)
        delays = [politeness_delay.get(host),
                  (robots_rules or {}).get(host, {}).get("crawl_delay_ms")]
        d = max([x for x in delays if x], default=None)
        if d and d > 0:
            b = min(b, (W + d - 1) // d)
        return b
    res = OracleResult()
    D = params.max_depth
    ML = params.discovery_cap
    L = params.link_limit

    frontier = []
    seed_set = set()
    for raw_url, rank in sorted(seeds, key=lambda s: s[1]):
        cu = U.canonical_url(raw_url)
        if cu in seed_set:
            continue  # duplicate seeds collapse: min seed_rank wins
        seed_set.add(cu)  # (a url is crawled once — processed map)
        frontier.append(dict(url=cu, host=U.extract_host(cu), depth=0,
                             parent_ord=-1, link_pos=rank, seed_rank=rank,
                             seed_host=U.extract_host(cu)))

    discovered = set()
    discovered_cnt = 0
    limit_reached = False
    next_ord = 0
    successes = 0
    all_pages = {}   # url -> record (pre-truncation, in crawl order)
    wave = 0

    while frontier and wave < params.max_waves:
        if L > 0 and successes >= L:
            break
        frontier.sort(key=lambda r: (r["depth"], r["parent_ord"],
                                     r["link_pos"], r["url"]))
        # politeness selection
        per_host = defaultdict(int)
        selected, deferred = [], []
        for row in frontier:
            budget = _budget(row["host"])
            if per_host[row["host"]] < budget:
                per_host[row["host"]] += 1
                selected.append(row)
            else:
                deferred.append(row)
        # global budget
        if L > 0:
            rem = L - successes
            deferred = selected[rem:] + deferred
            selected = selected[:rem]
        if not selected:
            break
        res.waves.append(len(selected))

        new_candidates = []
        retry_rows = []
        for row in selected:
            ord_ = next_ord
            next_ord += 1
            url = row["url"]
            res.seen.add(url)
            html = pages.get(url)
            status = 200 if html is not None else 404
            is_seed = row["parent_ord"] == -1
            pattern_ok = (not is_seed) or U.matches_pattern(url, params.patterns)
            fetch_robots_ok = (not params.fresh) or robots_ok(url)

            failed = False
            if pattern_ok:
                if not fetch_robots_ok:
                    res.errors[url] = ERR_ROBOTS
                    status = 403
                    failed = True
                elif html is None:
                    res.errors[url] = ERR_LOW_QUALITY
                    failed = True
                else:
                    markdown = H.crawl_markdown(html)
                    if len(markdown.strip()) < 10:
                        res.errors[url] = ERR_LOW_QUALITY
                        failed = True
                    else:
                        links = H.extract_links(html, url)
                        rec = dict(
                            url=url, markdown=markdown,
                            text=H.extract_text(html), links=links,
                            discovered=len(links),
                            title=H.extract_title(html),
                            metadata=H.extract_metadata(html, url, 200),
                            crawl_ord=ord_,
                        )
                        if params.include_html:
                            rec["html"] = html
                        all_pages[url] = rec
                        successes += 1
            res.trace.append((ord_, wave, row["depth"], url, status))

            # F9 retry: a failed fetch releases its slot and re-enters
            # the frontier with its original crawl-order key, up to
            # max_retries total attempts (crawl/service.go:564-571;
            # TASK_MAX_RETRIES config.go:90). Bypasses the discovery
            # dedup — processed map and links map are separate states.
            if (params.retry_failures and failed
                    and row.get("attempt", 0) < params.max_retries - 1):
                retry_rows.append(
                    {**row, "attempt": row.get("attempt", 0) + 1})

            # discovery/expansion (the mapper)
            if (html is not None and row["depth"] < D
                    and robots_ok(url) and not limit_reached):
                for pos, href in enumerate(H.extract_hrefs(html)):
                    link = U.discover_link(url, href)
                    if not link:
                        continue
                    lhost = U.extract_host(link)
                    if not U.domains_match(lhost, row["seed_host"],
                                           params.include_subdomains):
                        continue
                    if not robots_ok(link):
                        continue
                    if not U.matches_pattern(link, params.patterns):
                        continue
                    if link in discovered:
                        continue
                    discovered.add(link)
                    discovered_cnt += 1
                    new_candidates.append(dict(
                        url=link, host=lhost, depth=row["depth"] + 1,
                        parent_ord=ord_, link_pos=pos,
                        seed_rank=row["seed_rank"],
                        seed_host=row["seed_host"]))
                    if ML is not None and discovered_cnt >= ML:
                        # mapper limitReached: the cap-hitting link is
                        # emitted, then discovery stops forever while
                        # remaining scheduled fetches continue
                        limit_reached = True
                        break

        # next frontier: deferred + new, minus seen, dedup keep min K
        merged = {}
        for row in deferred + new_candidates:
            if row["url"] in res.seen:
                continue
            k = (row["depth"], row["parent_ord"], row["link_pos"], row["url"])
            cur = merged.get(row["url"])
            if cur is None or k < (cur["depth"], cur["parent_ord"],
                                   cur["link_pos"], cur["url"]):
                merged[row["url"]] = row
        # retry rows re-enter regardless of the seen set
        frontier = list(merged.values()) + retry_rows
        wave += 1

    # truncation (crawl/service.go:373-386, determinized by crawl_ord)
    ordered = sorted(all_pages.values(), key=lambda r: r["crawl_ord"])
    if L > 0:
        ordered = ordered[:L]
    res.pages = {r["url"]: r for r in ordered}
    res.stats = dict(
        total_pages=len(res.pages) + len(res.errors),
        successful_pages=len(res.pages),
        failed_pages=len(res.errors),
    )
    return res
