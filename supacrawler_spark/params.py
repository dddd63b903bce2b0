"""Crawl request parameters (mirrors CrawlCreateRequest,
openapi/engine.yaml:400-467; defaults per streamCrawl,
crawl/service.go:426-467)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlParams:
    depth: int = 1                      # colly MaxDepth = max(1, depth)
    link_limit: int = 0                 # 0 = unlimited
    include_subdomains: bool = False
    include_html: bool = False
    fresh: bool = False                 # fresh=True adds the fetch-stage
    #                                     robots check (ScrapeURL path)
    patterns: tuple = field(default_factory=tuple)
    max_waves: int = 1000               # driver-loop safety cap
    max_seconds: "float | None" = None  # L6: crawl wall-clock cap (the
    #                                     reference's 120s deadline,
    #                                     crawl/service.go:323-331;
    #                                     inherently nondeterministic,
    #                                     so excluded from trace tests)
    retry_failures: bool = False        # F9: a failed fetch releases its
    #                                     budget slot and the URL is
    #                                     re-enqueued (delete(processed,u)
    #                                     + releaseSlot, crawl/service.go:
    #                                     564-571), up to max_retries
    #                                     total attempts
    max_retries: int = 3                # TASK_MAX_RETRIES (config.go:90)
    wave_window_ms: int = 10_000        # batch determinization window
    #                                     for per-host delays: a host
    #                                     with effective delay d gets
    #                                     B_eff = min(max_parallel,
    #                                     ceil(wave_window_ms / d))
    #                                     slots per wave. Folds robots
    #                                     Crawl-delay and the dim's
    #                                     delay_ms into the politeness
    #                                     budget (colly RandomDelay
    #                                     <=500ms, mapper/service.go:93,
    #                                     122: at the default window a
    #                                     500ms delay gives 20 >= the
    #                                     reference Parallelism 10, so
    #                                     the default never binds).

    def __post_init__(self):
        self.patterns = tuple(self.patterns or ())

    @property
    def max_depth(self) -> int:
        return max(1, self.depth)

    @property
    def discovery_cap(self) -> "int | None":
        """Mapper link-limit ML = max(1, link_limit)
        (mapper/service.go:46-60, 153-160)."""
        return max(1, self.link_limit) if self.link_limit > 0 else None
