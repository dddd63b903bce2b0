"""Pure-Python URL kernel.

One semantics definition shared by (a) the engine's vectorized pandas
UDFs (see ``supacrawler_spark.functions``) and (b) the deterministic
oracle (``supacrawler_spark.oracle``), so the engine and its test
oracle cannot drift apart.

Every function reimplements a cited behavior of the reference engine
(/root/reference, Go):

- ``clean_url``        mapper/service.go:214-218 (scheme defaulting)
- ``canonicalize``     mapper/service.go:229-239 (fragment drop, "/"->"")
- ``extract_host``     mapper/service.go:221-227 (url.Parse().Hostname())
- ``domains_match``    mapper/service.go:241-254 (www-strip + subdomain)
- ``glob_match``       Go filepath.Match semantics ('*' does not cross '/')
- ``matches_pattern``  crawl/service.go:780-817 (glob + trailing-'*' prefix)
- ``robots_allowed``   robots prefix rules (reference stub is allow-all,
                       internal/platform/robots/robots.go:7; we implement
                       real longest-prefix-wins rules with allow-all default)
- ``url_hash64``       stable 64-bit URL hash for the Bloom seen-filter
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from urllib.parse import urljoin, urlsplit, urlunsplit

__all__ = [
    "clean_url",
    "canonicalize",
    "canonical_url",
    "extract_host",
    "strip_www",
    "domains_match",
    "glob_match",
    "matches_pattern",
    "robots_allowed",
    "url_hash64",
]


def clean_url(u: str) -> str:
    """Prefix ``https://`` when the URL does not start with ``http``.

    Exact port of cleanURL (mapper/service.go:214-218): the check is a
    literal ``strings.HasPrefix(u, "http")`` — no scheme parsing.
    """
    if not u.startswith("http"):
        return "https://" + u
    return u


def canonicalize(u: str) -> str:
    """Drop the fragment; rewrite a bare-root path ``/`` to empty.

    Port of normalize (mapper/service.go:229-239): Go ``url.Parse``,
    ``Fragment = ""``, ``Path == "/" -> ""``, re-serialize.
    """
    try:
        sp = urlsplit(u)
    except ValueError:
        return u
    path = sp.path
    if path == "/":
        path = ""
    return urlunsplit((sp.scheme, sp.netloc, path, sp.query, ""))


def canonical_url(u: str) -> str:
    """Full canonicalization applied to every discovered URL:
    scheme defaulting (F2) then normalize (F1). The engine keys the
    seen-set and the fetch join on this value."""
    return canonicalize(clean_url(u.strip()))


def extract_host(u: str) -> str:
    """Hostname without port/userinfo (mapper/service.go:221-227).

    Case is preserved (Go's url.Parse does not lower-case the host;
    Python's ``.hostname`` would — so we parse the netloc by hand).
    """
    try:
        netloc = urlsplit(u).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if netloc.startswith("["):  # IPv6 literal
        end = netloc.find("]")
        return netloc[1:end] if end != -1 else netloc[1:]
    return netloc.split(":", 1)[0]


def strip_www(host: str) -> str:
    """Single leading ``www.`` strip (Go strings.TrimPrefix)."""
    return host[4:] if host.startswith("www.") else host


def domains_match(a: str, b: str, include_subdomains: bool) -> bool:
    """Port of domainsMatch (mapper/service.go:241-254)."""
    if a == b:
        return True
    a = strip_www(a)
    b = strip_www(b)
    if a == b:
        return True
    if include_subdomains and (a.endswith("." + b) or b.endswith("." + a)):
        return True
    return False


@lru_cache(maxsize=4096)
def _glob_to_regex(pattern: str) -> "re.Pattern | None":
    """Translate a Go filepath.Match pattern to an anchored Python regex.

    Go semantics (filepath.Match, path separator '/'):
      '*'  any sequence of non-'/' characters (may be empty)
      '?'  any single non-'/' character
      '[...]' char class, '^' negates, '-' ranges, '\\' escapes inside
      '\\x' escapes x outside classes
    Malformed patterns (unterminated class / trailing backslash) are an
    error in Go -> we return None and the caller treats it as no-match,
    mirroring ``if err == nil && matched`` (crawl/service.go:797-800).
    """
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "\\":
            if i + 1 >= n:
                return None
            i += 1
            out.append(re.escape(pattern[i]))
        elif c == "[":
            j = i + 1
            neg = False
            if j < n and pattern[j] == "^":
                neg = True
                j += 1
            body = []
            first = True
            while j < n and (pattern[j] != "]" or first):
                if pattern[j] == "\\":
                    if j + 1 >= n:
                        return None
                    j += 1
                    body.append(re.escape(pattern[j]))
                elif pattern[j] == "-" and not first and j + 1 < n and pattern[j + 1] != "]":
                    body.append("-")
                else:
                    body.append(re.escape(pattern[j]) if pattern[j] not in "-" else "-")
                first = False
                j += 1
            if j >= n or not body:
                return None  # unterminated or empty class
            cls = "".join(body)
            out.append("[" + ("^" if neg else "") + cls + "]")
            i = j
        else:
            out.append(re.escape(c))
        i += 1
    try:
        return re.compile("(?s)\\A" + "".join(out) + "\\Z")
    except re.error:
        return None


def glob_match(pattern: str, path: str) -> bool:
    """Go filepath.Match('/'-separated) on ``path``; False on bad pattern."""
    rx = _glob_to_regex(pattern)
    return bool(rx and rx.match(path))


def matches_pattern(u: str, patterns: "list[str] | tuple[str, ...] | None") -> bool:
    """Port of matchesPattern (crawl/service.go:780-817).

    Empty/None pattern list allows everything. The URL's *path* is
    matched (empty path treated as "/"). Each pattern is tried as a
    glob; additionally a trailing-'*' pattern acts as a prefix rule:
    '/blog/*' matches '/blog' (exact, slash-trimmed) and any path with
    prefix '/blog/'.
    """
    if not patterns:
        return True
    try:
        path = urlsplit(u).path
    except ValueError:
        return False
    if path == "":
        path = "/"
    for pattern in patterns:
        if glob_match(pattern, path):
            return True
        if pattern.endswith("*"):
            prefix = pattern[:-1]
            trimmed = prefix[:-1] if prefix.endswith("/") else prefix
            if path == trimmed:
                return True
            if path.startswith(prefix):
                return True
    return False


def robots_allowed(
    path: str,
    disallow_prefixes: "list[str] | None",
    allow_prefixes: "list[str] | None" = None,
) -> bool:
    """robots.txt-style longest-prefix-wins path rule.

    The reference's robots service is an allow-all stub
    (internal/platform/robots/robots.go:7, call sites
    mapper/service.go:55,70,138,197) — so the engine default (no rules)
    is allow-all for trace parity; non-trivial rules implement the
    standard longest-match semantics: the longest matching prefix among
    all allow/disallow rules decides; ties go to allow; no match ->
    allowed.
    """
    if path == "":
        path = "/"
    best_len = -1
    allowed = True
    for p in allow_prefixes or []:
        if p and path.startswith(p) and len(p) > best_len:
            best_len = len(p)
            allowed = True
    for p in disallow_prefixes or []:
        if p and path.startswith(p) and len(p) > best_len:
            best_len = len(p)
            allowed = False
        elif p and path.startswith(p) and len(p) == best_len:
            pass  # tie -> allow wins (already set)
    return allowed


def discover_link(page_url: str, href: str) -> str:
    """Discovery-path absolutization + normalization for one anchor:
    colly ``e.Request.AbsoluteURL(href)`` (RFC 3986 resolution, net/url
    ResolveReference == urljoin) followed by ``normalize``
    (mapper/service.go:128-129). Returns "" for empty/unresolvable
    hrefs (colly returns "" and the mapper skips them)."""
    href = href.strip()
    if not href:
        return ""
    try:
        link = urljoin(page_url, href)
    except ValueError:
        return ""
    return canonicalize(link)


def url_hash64(u: str) -> int:
    """Stable signed 64-bit hash of a canonical URL.

    Used as the Bloom seen-filter key and the ``url_hash`` column. The
    north star calls for canonicalized + hashed URLs as vectorized UDFs
    (BASELINE.json); exactness of the seen-set never depends on this
    hash — membership is confirmed by an exact anti-join on
    ``url_canon`` (Bloom false positives are re-checked, false
    negatives impossible). blake2b is used for a stable, seedable,
    dependency-free 64-bit digest.
    """
    d = hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest()
    v = int.from_bytes(d, "big", signed=False)
    return v - (1 << 64) if v >= (1 << 63) else v
