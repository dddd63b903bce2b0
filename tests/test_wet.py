"""WET conversion records: re-parse roundtrip (a built WET shard is
itself valid WARC), closed-form length, and refers-to linkage."""

import hashlib

import pandas as pd

from supacrawler_spark.sources.warc import (
    WET_CONST_OVERHEAD,
    build_wet_record,
    parse_warc_bytes,
    parse_wet_bytes,
    wet_extract,
)

SF = "/root/testdata/sf0.001"


def test_wet_record_reparses():
    recs = [build_wet_record(f"https://h/d{i}",
                             "2024-01-01T00:00:00Z",
                             f"text {i}".encode()) for i in range(5)]
    shard = b"".join(recs)
    parsed = list(parse_wet_bytes(shard))
    assert [p["url"] for p in parsed] == [f"https://h/d{i}"
                                          for i in range(5)]
    assert [p["body"] for p in parsed] == [f"text {i}".encode()
                                           for i in range(5)]
    # and the response parser correctly IGNORES conversion records
    # (type discipline: a mixed shard never double-counts)
    assert list(parse_warc_bytes(shard)) == []


def test_closed_form_length_property():
    for url, body in (("https://a/b", b""),
                      ("https://x" * 30, b"z" * 12345)):
        rec = build_wet_record(url, "2024-01-01T00:00:00Z", body)
        assert len(rec) == (WET_CONST_OVERHEAD + len(url)
                            + len(str(len(body))) + len(body))


def test_fixture_linkage(spark):
    got = wet_extract(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert len(got) == len(docs)
    # refers_to matches the response record's urn:md5 of the url
    for _, r in got.head(20).iterrows():
        rid = hashlib.md5(r["url"].encode()).hexdigest()
        assert r["refers_to"] == f"<urn:md5:{rid}>"
        assert r["record_len"] == (WET_CONST_OVERHEAD + len(r["url"])
                                   + len(str(r["conv_len"]))
                                   + r["conv_len"])
