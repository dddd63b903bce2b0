"""Webhook sink + HMAC signing (SURVEY.md §2.1 S9, §2.8 X12).

Driver-side post-run callback matching the reference's completion
webhook (crawl/service.go:819-885): a JSON payload
``{job_id, type, status, data}`` POSTed with the reference's header
set, authenticated by HMAC-SHA256 over ``timestamp + body``
(generateHMACSignature, crawl/service.go:887-897).

This is control-plane work — one tiny driver-side HTTP call per
completed crawl, never per row — so it is deliberately NOT a Spark
job. The transport is stdlib urllib behind ``post=``-injection so
tests run with a fixed vector and no network.
"""

from __future__ import annotations

import hashlib
import hmac
import json


def hmac_signature(secret: str, timestamp: str, body: bytes) -> str:
    """HMAC-SHA256 hex over ``timestamp + body`` — byte-compatible with
    generateHMACSignature (crawl/service.go:887-897)."""
    mac = hmac.new(secret.encode("utf-8"),
                   timestamp.encode("utf-8") + body, hashlib.sha256)
    return mac.hexdigest()


def build_payload(job_id: str, status: str, data: dict) -> bytes:
    """The webhook body (crawl/service.go:823-835). Key order matches
    Go's json.Marshal of the map (alphabetical: data, job_id, status,
    type); separators are compact like Go's encoder."""
    payload = {"data": data, "job_id": job_id, "status": status,
               "type": "crawl"}
    return json.dumps(payload, separators=(",", ":"),
                      sort_keys=True).encode("utf-8")


def build_headers(job_id: str, timestamp: str, body: bytes,
                  secret: "str | None" = None,
                  extra: "dict | None" = None) -> dict:
    """Default header set (crawl/service.go:844-868)."""
    h = {
        "Content-Type": "application/json",
        "User-Agent": "Supacrawler-Engine/1.0",
        "X-Supacrawler-Event": "crawl.completed",
        "X-Supacrawler-Job-ID": job_id,
    }
    if secret:
        h["X-System-Timestamp"] = timestamp
        h["X-System-Signature"] = hmac_signature(secret, timestamp, body)
    if extra:
        h.update(extra)
    return h


def notify_webhook(url: str, job_id: str, status: str, data: dict,
                   timestamp: str, secret: "str | None" = None,
                   headers: "dict | None" = None, post=None,
                   timeout: float = 10.0):
    """Send the completion webhook. ``data`` is typically
    ``CrawlRun.stats``. ``post(url, body, headers)`` is injectable for
    tests; the default uses stdlib urllib (10s timeout, matching the
    reference's http.Client)."""
    body = build_payload(job_id, status, data)
    hdrs = build_headers(job_id, timestamp, body, secret, headers)
    if post is None:
        from urllib.request import Request, urlopen

        def post(u, b, hd):
            req = Request(u, data=b, headers=hd, method="POST")
            with urlopen(req, timeout=timeout) as resp:
                return resp.status
    return post(url, body, hdrs)
