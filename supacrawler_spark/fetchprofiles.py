"""Retry-ladder fetch strategies + header profiles (SURVEY.md §2.1 S3).

The reference retries a failed/Cloudflare-blocked fetch through three
header strategies in preference order (scrapeWithRetriesPlaywright,
internal/core/scrape/service.go:91-119; GetAllStrategies
headers.go:170-176) and picks a random header profile within the
strategy (GetHeaderProfile headers.go:152-168). The batch engine's F9
retry loop carries an ``attempt`` column (plans/crawl.py); this module
maps it onto the same ladder:

- attempt 0 -> modern_browser, 1 -> mobile_device, 2 -> bot_friendly
  (attempts beyond the ladder stay on the last strategy, like the
  reference's exhausted-ladder failure);
- profile choice within a strategy is determinized as
  ``doc/url key % len(profiles)`` — the batch analog of rand.Intn
  (same distribution over a hashed key, reproducible across engines).

The profile constants are the spec being matched (headers.go:29-150)
— they are data, not code.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STRATEGIES = ("modern_browser", "mobile_device", "bot_friendly")

# headers.go:29-70 (modern), 72-121 (mobile), 123-150 (bot): the
# fields the batch engine exposes per profile. Full header sets live
# in the reference; user_agent + mobile flag + platform identify a
# profile uniquely.
PROFILES = {
    "modern_browser": [
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
         "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/131.0.0.0 "
         "Safari/537.36", "?0", '"macOS"'),
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
         "(KHTML, like Gecko) Chrome/131.0.0.0 Safari/537.36",
         "?0", '"Windows"'),
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.2 "
         "Safari/605.1.15", "", ""),
    ],
    "mobile_device": [
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 18_2 like Mac OS X) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.2 "
         "Mobile/15E148 Safari/604.1", "?1", '"iOS"'),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_7 like Mac OS X) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.7 "
         "Mobile/15E148 Safari/604.1", "?1", '"iOS"'),
        ("Mozilla/5.0 (iPad; CPU OS 18_2 like Mac OS X) "
         "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.2 "
         "Mobile/15E148 Safari/604.1", "?1", '"iOS"'),
        ("Mozilla/5.0 (Linux; Android 14; Pixel 8 Pro) "
         "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/131.0.0.0 "
         "Mobile Safari/537.36", "?1", '"Android"'),
    ],
    "bot_friendly": [
        ("SupacrawlerBot/1.0 (+https://supacrawler.com/bot)", "", ""),
        ("Mozilla/5.0 (compatible; SupacrawlerBot/1.0; "
         "+https://supacrawler.com/bot)", "", ""),
    ],
}

# Inter-attempt jitter bounds (service.go:113: 2000 + rand.Intn(2000)).
# Semantic input only — a batch wave has no sleeps; the politeness
# budget is the batch realization of pacing.
RETRY_JITTER_MS = (2000, 4000)


def strategy_name(attempt: int) -> str:
    """Python mirror of ``strategy_for_attempt`` (used row-wise inside
    the transport_fetch Arrow batch)."""
    return STRATEGIES[min(int(attempt), len(STRATEGIES) - 1)]


def profile_name_tuple(strategy: str, key: int) -> tuple:
    """Python mirror of ``profile_for``: (user_agent, sec_ch_ua_mobile,
    sec_ch_ua_platform) for a strategy and an integer key (pmod
    semantics: Python % on the int64 key is already non-negative)."""
    profiles = PROFILES[strategy]
    return profiles[int(key) % len(profiles)]


def strategy_for_attempt(attempt: Column) -> Column:
    """Ladder position for an attempt counter (0-based). Attempts past
    the ladder clamp to the last strategy."""
    i = F.least(attempt, F.lit(len(STRATEGIES) - 1))
    expr = F.lit(STRATEGIES[-1])
    for k in range(len(STRATEGIES) - 2, -1, -1):
        expr = F.when(i == k, F.lit(STRATEGIES[k])).otherwise(expr)
    return expr


def profile_for(strategy: Column, key: Column) -> Column:
    """Deterministic profile struct (user_agent, sec_ch_ua_mobile,
    sec_ch_ua_platform) for a strategy and an integer key — the batch
    determinization of GetHeaderProfile's rand.Intn (headers.go:
    152-168). Pure literal CASE algebra: JVM-side, codegen-friendly,
    reproducible in any SQL engine."""
    out = None
    for name, profiles in PROFILES.items():
        idx = F.pmod(key, F.lit(len(profiles)))
        sel = None
        for j in range(len(profiles) - 1, -1, -1):
            ua, mob, plat = profiles[j]
            s = F.struct(F.lit(ua).alias("user_agent"),
                         F.lit(mob).alias("sec_ch_ua_mobile"),
                         F.lit(plat).alias("sec_ch_ua_platform"))
            sel = s if sel is None else F.when(idx == j, s).otherwise(sel)
        out = sel if out is None else (
            F.when(strategy == name, sel).otherwise(out))
    return out


def profile_sql(strategy_expr: str, key_expr: str) -> str:
    """The user-agent arm of ``profile_for`` as engine-neutral SQL,
    generated from the same PROFILES constants (single source of
    truth for the DuckDB oracle twin)."""
    arms = []
    for name, profiles in PROFILES.items():
        # user agents contain no quotes; safe as SQL literals
        inner = "CASE " + " ".join(
            f"WHEN ({key_expr}) % {len(profiles)} = {j} "
            f"THEN '{profiles[j][0]}'"
            for j in range(len(profiles))
        ) + " END"
        arms.append(f"WHEN ({strategy_expr}) = '{name}' THEN {inner}")
    return "CASE " + " ".join(arms) + " END"
