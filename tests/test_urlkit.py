"""Unit tests for the URL kernel (SURVEY.md §2.2 F1-F5, §2.8 X10/X13)."""

from supacrawler_spark import urlkit as U


class TestCleanURL:
    def test_adds_https(self):
        assert U.clean_url("example.com/a") == "https://example.com/a"

    def test_keeps_http(self):
        assert U.clean_url("http://example.com") == "http://example.com"
        assert U.clean_url("https://example.com") == "https://example.com"

    def test_literal_http_prefix_rule(self):
        # Go checks strings.HasPrefix(u, "http") literally
        # (mapper/service.go:215) — "httpfoo" is NOT prefixed.
        assert U.clean_url("httpfoo.com") == "httpfoo.com"


class TestCanonicalize:
    def test_drops_fragment(self):
        assert U.canonicalize("https://a.com/x#frag") == "https://a.com/x"

    def test_root_slash_removed(self):
        assert U.canonicalize("https://a.com/") == "https://a.com"

    def test_non_root_slash_kept(self):
        assert U.canonicalize("https://a.com/x/") == "https://a.com/x/"

    def test_query_kept(self):
        assert U.canonicalize("https://a.com/x?q=1#f") == "https://a.com/x?q=1"

    def test_canonical_url_combines(self):
        assert U.canonical_url(" a.com/ ") == "https://a.com"


class TestHost:
    def test_basic(self):
        assert U.extract_host("https://www.Example.com/p") == "www.Example.com"

    def test_port_stripped(self):
        assert U.extract_host("http://a.com:8080/x") == "a.com"

    def test_userinfo_stripped(self):
        assert U.extract_host("http://u:p@a.com/x") == "a.com"


class TestDomainsMatch:
    def test_exact(self):
        assert U.domains_match("a.com", "a.com", False)

    def test_www_stripped_both_sides(self):
        assert U.domains_match("www.a.com", "a.com", False)
        assert U.domains_match("a.com", "www.a.com", False)

    def test_subdomain_needs_flag(self):
        assert not U.domains_match("sub.a.com", "a.com", False)
        assert U.domains_match("sub.a.com", "a.com", True)
        assert U.domains_match("a.com", "sub.a.com", True)

    def test_unrelated(self):
        assert not U.domains_match("b.com", "a.com", True)
        # suffix must be on a dot boundary
        assert not U.domains_match("nota.com", "a.com", True)


class TestGlobMatch:
    def test_star_not_crossing_slash(self):
        # Go filepath.Match: '*' stops at '/'
        assert U.glob_match("/blog/*", "/blog/post")
        assert not U.glob_match("/blog/*", "/blog/post/deep")

    def test_question(self):
        assert U.glob_match("/p?", "/pa")
        assert not U.glob_match("/p?", "/p/")

    def test_class(self):
        assert U.glob_match("/p[abc]", "/pa")
        assert not U.glob_match("/p[abc]", "/pd")
        assert U.glob_match("/p[^abc]", "/pd")
        assert U.glob_match("/p[a-c]", "/pb")

    def test_malformed_pattern_no_match(self):
        assert not U.glob_match("/p[", "/pa")
        assert not U.glob_match("x\\", "x")


class TestMatchesPattern:
    """crawl/service.go:780-817 semantics."""

    def test_empty_allows_all(self):
        assert U.matches_pattern("https://a.com/x", [])
        assert U.matches_pattern("https://a.com/x", None)

    def test_trailing_star_prefix(self):
        pats = ["/blog/*"]
        assert U.matches_pattern("https://a.com/blog/post", pats)
        assert U.matches_pattern("https://a.com/blog/post/deep", pats)  # prefix rule
        assert U.matches_pattern("https://a.com/blog", pats)  # exact slash-trimmed
        assert not U.matches_pattern("https://a.com/blogs", pats)
        assert not U.matches_pattern("https://a.com/docs/x", pats)

    def test_bare_star_suffix(self):
        pats = ["/docs*"]
        assert U.matches_pattern("https://a.com/docs", pats)
        assert U.matches_pattern("https://a.com/docsify", pats)  # prefix "/docs"
        assert U.matches_pattern("https://a.com/docs/a/b", pats)

    def test_empty_path_is_root(self):
        assert U.matches_pattern("https://a.com", ["/"])

    def test_exact_pattern(self):
        assert U.matches_pattern("https://a.com/about", ["/about"])
        assert not U.matches_pattern("https://a.com/about/team", ["/about"])

    def test_multiple_patterns_or(self):
        pats = ["/blog/*", "/docs/*"]
        assert U.matches_pattern("https://a.com/docs/x", pats)


class TestRobots:
    def test_default_allow_all(self):
        assert U.robots_allowed("/anything", None, None)
        assert U.robots_allowed("/x", [], [])

    def test_disallow_prefix(self):
        assert not U.robots_allowed("/private/x", ["/private"], [])
        assert U.robots_allowed("/public/x", ["/private"], [])

    def test_allow_overrides_longer(self):
        assert U.robots_allowed("/private/ok/x", ["/private"], ["/private/ok"])
        assert not U.robots_allowed("/private/no", ["/private"], ["/private/ok"])


class TestHash:
    def test_stable(self):
        assert U.url_hash64("https://a.com") == U.url_hash64("https://a.com")

    def test_signed_64(self):
        v = U.url_hash64("https://a.com")
        assert -(1 << 63) <= v < (1 << 63)

    def test_distinct(self):
        urls = ["https://h%d.com/p%d" % (i % 37, i) for i in range(10000)]
        assert len({U.url_hash64(u) for u in urls}) == 10000
