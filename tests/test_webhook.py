"""Webhook payload + HMAC signing vectors (crawl/service.go:819-897)."""

import hashlib
import hmac as hmac_mod

from supacrawler_spark import webhook as W


def test_hmac_fixed_vector():
    # independently computed: HMAC-SHA256("s3cret", "1700000000" + body)
    body = b'{"a":1}'
    expect = hmac_mod.new(
        b"s3cret", b"1700000000" + body, hashlib.sha256).hexdigest()
    assert W.hmac_signature("s3cret", "1700000000", body) == expect
    # pinned literal so a refactor can't silently change both sides
    assert W.hmac_signature("secret", "123", b"body") == (
        "446df07c407777abc046a91bb93faa72a8cd57a95b46a5d41ee49e39b65ebcc2")


def test_payload_and_headers():
    data = {"successful_pages": 3, "failed_pages": 1}
    body = W.build_payload("job-1", "completed", data)
    assert body.startswith(b'{"data":')
    hdrs = W.build_headers("job-1", "1700000000", body, secret="k")
    assert hdrs["X-Supacrawler-Event"] == "crawl.completed"
    assert hdrs["X-Supacrawler-Job-ID"] == "job-1"
    assert hdrs["X-System-Signature"] == W.hmac_signature(
        "k", "1700000000", body)


def test_notify_uses_injected_post():
    calls = []

    def fake_post(url, body, headers):
        calls.append((url, body, headers))
        return 200

    status = W.notify_webhook(
        "https://example.org/hook", "j1", "completed", {"n": 1},
        timestamp="42", secret="k", headers={"X-Custom": "v"},
        post=fake_post)
    assert status == 200
    (url, body, headers), = calls
    assert url == "https://example.org/hook"
    assert headers["X-Custom"] == "v"
    assert headers["X-System-Timestamp"] == "42"
    assert headers["X-System-Signature"] == W.hmac_signature("k", "42", body)
