"""Published training-data quality rule-sets: Gopher (Rae et al. 2021,
App. A1.1 subset) and C4 (Raffel et al. 2020 §2.2). The sf corpus is
single-line word soup, so the driver oracle only exercises the
word-level signals — these fixtures exercise every line-level rule
(bullets, ellipses, terminal punctuation, javascript, lorem, brace)."""

import pytest

from supacrawler_spark.textops import c4_line_stats_df, gopher_quality_df


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps. it runs far and fast today."),
            (1, "- one two three\n- four five six\nplain line here"),
            (2, "hello there...\nworld …\nok fine"),
            (3, ("word " * 60).strip()),
            (4, ""),
        ],
        "doc_id long, text string")
    rows = _by_id(gopher_quality_df(docs))

    r0 = rows[0]
    assert r0["n_words"] == 11 and r0["n_lines"] == 1
    assert r0["mean_word_len"] == pytest.approx(44 / 11)
    assert r0["alpha_ratio"] == 1.0 and r0["symbol_ratio"] == 0.0
    assert r0["gopher_pass"] == 0          # n_words < 50

    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert r1["bullet_ratio"] == pytest.approx(2 / 3)
    assert r1["gopher_pass"] == 0

    r2 = rows[2]
    assert r2["n_words"] == 6
    assert r2["ellipsis_ratio"] == pytest.approx(2 / 3)   # '...' and '…'
    assert r2["symbol_ratio"] == pytest.approx(2 / 6)
    assert r2["alpha_ratio"] == pytest.approx(5 / 6)      # '…' has no letter
    assert r2["gopher_pass"] == 0          # ellipsis_ratio > 0.3

    r3 = rows[3]
    assert r3["n_words"] == 60 and r3["mean_word_len"] == 4.0
    assert r3["gopher_pass"] == 1

    r4 = rows[4]                           # empty text: no words, 1 line
    assert r4["n_words"] == 0
    assert r4["mean_word_len"] is None and r4["alpha_ratio"] is None
    assert r4["gopher_pass"] == 0          # null rules coalesce to fail


def test_c4_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "This is a good long sentence here.\nshort one.\n"
                "too few words\nAnother good long sentence is here!\n"
                "A third good long sentence right here?"),
            (1, "Lorem Ipsum dolor sit amet makes this page invalid here."),
            (2, "A perfectly fine long sentence { with a brace inside it."),
            (3, "Enable JavaScript to view this nice long content line.\n"
                "A good long clean sentence number one stands here.\n"
                "A good long clean sentence number two stands here.\n"
                "A good long clean sentence number three stands here."),
        ],
        "doc_id long, text string")
    rows = _by_id(c4_line_stats_df(docs))

    r0 = rows[0]
    assert r0["n_lines"] == 5 and r0["kept_lines"] == 3
    assert r0["kept_ratio"] == pytest.approx(3 / 5)
    assert (r0["has_lorem"], r0["has_brace"], r0["c4_pass"]) == (0, 0, 1)

    r1 = rows[1]                            # lorem ipsum page drop
    assert r1["kept_lines"] == 1
    assert (r1["has_lorem"], r1["c4_pass"]) == (1, 0)

    r2 = rows[2]                            # curly-brace page drop
    assert (r2["has_brace"], r2["c4_pass"]) == (1, 0)

    r3 = rows[3]                            # javascript line dropped,
    assert r3["kept_lines"] == 3            # 3 clean lines still pass
    assert r3["c4_pass"] == 1
