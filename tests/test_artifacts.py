"""S3 retry ladder, A5 token accounting, S8 screenshot artifacts."""

import hashlib
import os

import pyspark.sql.functions as F

from supacrawler_spark import fetchprofiles as FP
from supacrawler_spark import multimodal
from supacrawler_spark import screenshots as SC
from supacrawler_spark.parseops import token_usage


# ---------------------------------------------------------------------------
# S3 retry ladder (scrape/service.go:91-119; headers.go)
# ---------------------------------------------------------------------------

def test_strategy_ladder_order_and_clamp(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "attempt int")
    got = [r["s"] for r in df.select(
        FP.strategy_for_attempt(F.col("attempt")).alias("s")
    ).orderBy("attempt").collect()]
    # GetAllStrategies order, clamped past the ladder
    assert got == ["modern_browser", "mobile_device", "bot_friendly",
                   "bot_friendly", "bot_friendly", "bot_friendly"]


def test_profile_selection_deterministic(spark):
    df = spark.createDataFrame(
        [(k,) for k in range(8)], "key long").withColumn(
        "strategy", F.lit("mobile_device"))
    rows = df.select(
        "key", FP.profile_for(F.col("strategy"), F.col("key"))
        .alias("p")).collect()
    for r in rows:
        want_ua = FP.PROFILES["mobile_device"][r["key"] % 4][0]
        assert r["p"]["user_agent"] == want_ua


def test_profile_sql_matches_python():
    # the generated SQL is evaluated by DuckDB over the same keys
    import duckdb
    sql = FP.profile_sql("'bot_friendly'", "k")
    rows = duckdb.sql(
        f"SELECT k, {sql} AS ua FROM range(4) t(k)").fetchall()
    for k, ua in rows:
        assert ua == FP.PROFILES["bot_friendly"][k % 2][0]


# ---------------------------------------------------------------------------
# A5 token accounting (parse/service.go:567-607, 698)
# ---------------------------------------------------------------------------

def test_token_usage_ceil_div(spark):
    df = spark.createDataFrame(
        [(1, "a" * 7), (1, "b" * 2), (2, "c" * 4)],
        "job_id int, content string")
    got = {r["job_id"]: r for r in token_usage(df).collect()}
    assert got[1]["pages_processed"] == 2
    assert got[1]["input_tokens"] == (7 + 2 + 3) // 4  # ceil(9/4)=3
    assert got[2]["input_tokens"] == 1
    assert got[1]["output_budget"] == 2000
    assert got[1]["total_budget"] == 2003


# ---------------------------------------------------------------------------
# S8 screenshot artifacts (screenshot/service.go:110-633)
# ---------------------------------------------------------------------------

def test_sanitize_matches_go_replacer():
    # service.go:694-701
    assert SC.sanitize("https://a.b/c?x=1&y=2#z") == "https---a.b-c-x-1-y-2-z"
    assert SC.sanitize("100%url") == "100url"
    assert len(SC.sanitize("x" * 200)) == 64


def test_render_roundtrips_through_decoder():
    payload = SC.render_screenshot("https://h1.example.org/")
    meta = multimodal.decode_image(payload)
    assert meta["format"] == "bmp"
    assert (meta["width"], meta["height"]) == (SC._THUMB, SC._THUMB)
    # deterministic: same url -> same bytes
    assert payload == SC.render_screenshot("https://h1.example.org/")
    assert payload != SC.render_screenshot("https://h2.example.org/")


def test_screenshot_pipeline_and_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://h1.example.org/",), ("https://h2.example.org/a?b=1",)],
        "url string")
    shots = SC.screenshots(df, device="mobile", ts="20260101_120000")
    rows = {r["url"]: r for r in shots.collect()}
    assert rows["https://h1.example.org/"]["viewport_w"] == 375
    assert rows["https://h1.example.org/"]["viewport_h"] == 667
    assert rows["https://h2.example.org/a?b=1"]["name"] == (
        "20260101_120000_https---h2.example.org-a-b-1.bmp")

    manifest = {r["url"]: r for r in
                SC.save_screenshots(shots, str(tmp_path)).collect()}
    for url, m in manifest.items():
        assert os.path.exists(m["path"])
        with open(m["path"], "rb") as f:
            data = f.read()
        assert data == SC.render_screenshot(url)
        assert m["n_bytes"] == len(data)
        assert m["served_url"].startswith("/files/screenshots/")
        assert hashlib.md5(data).hexdigest() == hashlib.md5(
            SC.render_screenshot(url)).hexdigest()


def test_parse_cap_bytes_mode(spark):
    """capped_content_bytes must reproduce Go's byte-slice cap EXACTLY
    (parse/service.go:537-540), including a codepoint split mid-
    sequence; the char mode diverges precisely there (pinned)."""
    from supacrawler_spark.parseops import (
        TRUNCATION_MARK,
        capped_content,
        capped_content_bytes,
    )

    cap = 11
    cases = [
        "short",                 # under cap in both modes
        "a" * 11,                # exactly at cap (no truncation)
        "a" * 12,                # ASCII over-cap: modes agree
        "a" + "€" * 5,      # 16 bytes, 6 chars: byte 11 cuts the
        #                     4th euro after its first byte (1 + 3*3)
    ]
    df = spark.createDataFrame([(c,) for c in cases], "content string")
    got = df.select(
        capped_content_bytes(F.col("content"), cap).alias("b"),
        capped_content(F.col("content"), cap).alias("c")).collect()

    def go_cap(s: str) -> bytes:  # the reference rule, verbatim
        raw = s.encode("utf-8")
        if len(raw) > cap:
            raw = raw[:cap] + TRUNCATION_MARK.encode()
        return raw

    for case, row in zip(cases, got):
        assert bytes(row.b) == go_cap(case), case

    # ASCII: modes agree byte-for-byte
    assert bytes(got[2].b) == got[2].c.encode()
    # multi-byte: byte mode carries the split euro's partial byte
    # (b'\xe2'), char mode does not truncate at all (6 chars < 11)
    assert bytes(got[3].b).endswith(
        b"\xac\xe2" + TRUNCATION_MARK.encode())
    assert got[3].c == cases[3]
