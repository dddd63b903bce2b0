"""Injectable live-fetch transport — the S2/S3 seam (SURVEY.md §2.1).

The engine's fetch is normally the corpus join (the pages table plays
the web, operators/fetch.fetch_join). A real deployment swaps in a
LIVE transport; this module defines that seam:

- ``FetchTransport.fetch`` receives one Arrow batch of scheduled rows
  as a pandas frame with columns ``url, attempt, strategy,
  user_agent`` — the S3 retry ladder (scrapeWithRetriesPlaywright,
  internal/core/scrape/service.go:91-119) already resolved per row
  from the F9 ``attempt`` counter: attempt 0 fetches as
  modern_browser, 1 as mobile_device, 2+ as bot_friendly, with the
  deterministic header profile (fetchprofiles.profile_name_tuple)
  chosen by url_hash — and returns one ``bytes | None`` per row
  (None = miss -> the engine's 404/low-quality error path, which
  under params.retry_failures re-enqueues the URL with attempt+1,
  closing the ladder loop).
- The object must be picklable (it ships to executors inside a
  mapInPandas stage, operators/fetch.transport_fetch). A real
  implementation would hold connection config, not sockets.

No network implementation ships in this sandbox. ``MockTransport``
serves a static url->bytes mapping and is the CI stand-in; a mock
serving the corpus produces a crawl byte-identical to the corpus join
(tests/test_transport.py), so the only difference between batch and
live mode is where the bytes come from.
"""

from __future__ import annotations


class FetchTransport:
    """Protocol for injectable fetch transports."""

    def fetch(self, batch) -> "list[bytes | None]":
        """``batch``: pandas frame with columns url, attempt, strategy,
        user_agent (one row per scheduled fetch). Return one
        ``bytes | None`` per row, in order."""
        raise NotImplementedError


class MockTransport(FetchTransport):
    """Static url->bytes web. The CI stand-in for a live fetcher.

    ``require_strategy``: optional url->strategy map — listed urls are
    served ONLY when fetched under that ladder strategy (the chaos
    knob that exercises the F9-retry x S3-ladder loop end to end:
    such a url fails on other attempts and succeeds once the ladder
    reaches the required strategy)."""

    def __init__(self, pages: "dict[str, bytes | str]",
                 require_strategy: "dict[str, str] | None" = None):
        self.pages = {
            u: (h.encode("utf-8") if isinstance(h, str) else bytes(h))
            for u, h in pages.items()
        }
        self.require_strategy = dict(require_strategy or {})

    def fetch(self, batch):
        out = []
        for u, strat in zip(batch["url"], batch["strategy"]):
            body = self.pages.get(u)
            need = self.require_strategy.get(u)
            if need is not None and strat != need:
                body = None
            out.append(body)
        return out
