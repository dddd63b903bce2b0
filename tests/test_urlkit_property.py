"""Hypothesis property battery for the URL kernel: canonicalization
idempotence/fragment-free invariants and hash stability — the
foundation every seen-set and frontier key rests on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from supacrawler_spark import urlkit

_path_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._~/%", max_size=30)
_host = st.sampled_from(
    ["h1.example.org", "hot.example.org", "sub.h2.example.org",
     "xn--bcher-kva.example", "h9.example.org:8080"])
_frag = st.text(alphabet="abcdef#?=&", max_size=10)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(_host)
    path = draw(_path_chars)
    if path and not path.startswith("/"):
        path = "/" + path
    q = draw(st.sampled_from(["", "?a=1", "?a=1&b=2", "?"]))
    frag = draw(st.sampled_from(["", "#top", "#"])) or \
        ("#" + draw(_frag) if draw(st.booleans()) else "")
    return f"{scheme}://{host}{path}{q}{frag}"


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_canonicalize_idempotent(u):
    c = urlkit.canonicalize(u)
    assert urlkit.canonicalize(c) == c


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_canonicalize_drops_fragment_keeps_scheme_host(u):
    c = urlkit.canonicalize(u)
    assert "#" not in c
    assert c.startswith(("http://", "https://"))
    # bare root collapses; nothing else loses its path
    if u.split("#")[0].split("?")[0].rstrip("/").count("/") > 2:
        assert c.split("?")[0] != ""


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_url_hash_keyed_by_canonical_form(u):
    """Equal canonical forms must hash equal (the seen-set key
    contract); the fragment can never split a URL's identity."""
    c = urlkit.canonicalize(u)
    assert urlkit.url_hash64(c) == urlkit.url_hash64(urlkit.canonicalize(c))
    assert urlkit.url_hash64(urlkit.canonicalize(u + "#late")) == \
        urlkit.url_hash64(c)
