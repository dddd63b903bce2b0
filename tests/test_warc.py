"""WARC container source: assembly/parse round-trip, resilience to
corrupt shard regions, and the real binaryFile scan path."""

import hashlib

import pandas as pd
import pytest

from supacrawler_spark.sources import warc

DOCS = [
    (0, "src0", "hello é world"),
    (1, "src1", "x" * 100),
    # payload embedding the version string + header separators must
    # not desync the Content-Length-jumping parser
    (7, "src2", "body with WARC/1.0 inside\r\n\r\n tricky"),
    (9, "src0", ""),  # empty body
]


def test_roundtrip_pure():
    buf = warc.build_warc_bytes(DOCS)
    recs = list(warc.parse_warc_bytes(buf))
    assert len(recs) == len(DOCS)
    for (d, s, t), r in zip(sorted(DOCS), recs):
        body = t.encode("utf-8")
        assert r["url"] == warc.doc_url(d, s)
        assert r["http_status"] == 200
        assert r["content_len"] == len(body)
        assert r["body_md5"] == hashlib.md5(body).hexdigest()
        assert r["warc_date"] == warc._warc_date(d)


def test_truncated_final_record_dropped():
    buf = warc.build_warc_bytes(DOCS)
    recs = list(warc.parse_warc_bytes(buf[:-30]))
    assert len(recs) == len(DOCS) - 1


def test_resync_after_garbage_and_bad_length():
    buf = warc.build_warc_bytes(DOCS)
    assert len(list(warc.parse_warc_bytes(b"garbage\r\n\r\n" + buf))) \
        == len(DOCS)
    bad = buf.replace(b"Content-Length: 100", b"Content-Length: zz", 1)
    # the record with the unparseable length is skipped, rest survive
    assert len(list(warc.parse_warc_bytes(bad))) == len(DOCS) - 1
    assert list(warc.parse_warc_bytes(b"")) == []
    assert list(warc.parse_warc_bytes(b"WARC/1.0\r\nno-terminator")) == []


def test_non_response_records_skipped():
    rec = warc.build_record(3, "src3", "abc")
    info = rec.replace(b"WARC-Type: response", b"WARC-Type: warcinfo", 1)
    recs = list(warc.parse_warc_bytes(info + rec))
    assert len(recs) == 1 and recs[0]["url"] == warc.doc_url(3, "src3")


def test_binaryfile_scan_path(spark, tmp_path):
    """Shards written to disk as real .warc files, read back via
    spark.read.format('binaryFile') — the production entry path."""
    shard_docs = [DOCS[:2], DOCS[2:]]
    for i, docs in enumerate(shard_docs):
        (tmp_path / f"shard-{i:05d}.warc").write_bytes(
            warc.build_warc_bytes(docs))
    shards = (spark.read.format("binaryFile")
              .load(str(tmp_path) + "/*.warc"))
    out = (warc.warc_scan(shards, payload_col="content")
           .toPandas().sort_values("url").reset_index(drop=True))
    exp = pd.DataFrame(
        sorted(({"url": warc.doc_url(d, s),
                 "content_len": len(t.encode())} for d, s, t in DOCS),
               key=lambda r: r["url"]))
    assert list(out["url"]) == list(exp["url"])
    assert list(out["content_len"]) == list(exp["content_len"])
    assert (out["http_status"] == 200).all()


def test_spark_roundtrip_matches_documents(spark):
    sf = "/root/testdata/sf0.001"
    out = (warc.warc_roundtrip(spark, sf).toPandas()
           .sort_values("url").reset_index(drop=True))
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    assert len(out) == len(docs)
    exp_md5 = {warc.doc_url(int(r.doc_id), r.source):
               hashlib.md5(r.text.encode()).hexdigest()
               for r in docs.itertuples()}
    got = dict(zip(out["url"], out["body_md5"]))
    assert got == exp_md5


def test_crawl_from_warc_shards(spark, web, tmp_path):
    """The input_hint loop closed: pages -> WARC shards on disk ->
    binaryFile -> warc_to_pages -> run_crawl is trace- and
    byte-identical to the same crawl over the parquet corpus."""
    from supacrawler_spark.params import CrawlParams
    from supacrawler_spark.plans import run_crawl
    from supacrawler_spark.sources import gen_seeds

    pages_df, _, n_docs = web
    rows = pages_df.select("url", "warc_ts", "html").collect()
    # two shards, split arbitrarily
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        buf = b"".join(
            warc.build_record_raw(
                r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                bytes(r.html))
            for r in chunk)
        (tmp_path / f"cc-{i:05d}.warc").write_bytes(buf)

    shards = (spark.read.format("binaryFile")
              .load(str(tmp_path) + "/*.warc"))
    warc_pages = warc.warc_to_pages(shards, payload_col="content")
    assert [f.name for f in warc_pages.schema.fields] == \
        ["url", "warc_ts", "html", "text", "lang"]

    seeds = gen_seeds(n_docs, k=2)
    params = CrawlParams(depth=2, link_limit=40)
    via_warc = run_crawl(spark, warc_pages, seeds, params)
    via_parquet = run_crawl(spark, pages_df, seeds, params)

    def trace(run):
        return [(r.crawl_ord, r.iter, r.depth, r.url, r.status_code)
                for r in run.trace.collect()]

    def bodies(run):
        return sorted((r.url, r.markdown, r.text)
                      for r in run.results.collect())

    assert trace(via_warc) == trace(via_parquet)
    assert bodies(via_warc) == bodies(via_parquet)


def test_streaming_shard_ingest_exactly_once(spark, tmp_path):
    """New shard files are parsed incrementally and exactly once:
    drain, drop a new shard, drain again -> only the new records;
    a third drain with nothing new -> zero records."""
    from supacrawler_spark.streaming import stream_warc_shards

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "records")

    def drain():
        q = (stream_warc_shards(spark, str(shard_dir)).writeStream
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted(r.url for r in
                      spark.read.parquet(out_dir).collect())

    (shard_dir / "s0.warc").write_bytes(warc.build_warc_bytes(DOCS[:2]))
    assert drain() == sorted(warc.doc_url(d, s) for d, s, _ in DOCS[:2])

    # a new shard drop: only its records are appended (shard s0 is
    # tracked in the checkpoint and never re-parsed)
    (shard_dir / "s1.warc").write_bytes(warc.build_warc_bytes(DOCS[2:]))
    all_urls = sorted(warc.doc_url(d, s) for d, s, _ in DOCS)
    assert drain() == all_urls

    # nothing new: drain is a no-op (exactly-once, no duplicates)
    assert drain() == all_urls


def test_cdx_offsets_enable_random_access():
    """Slicing a shard at (offset, record_len) re-parses to exactly
    the indexed record — the CDX ranged-read contract."""
    buf = warc.build_warc_bytes(DOCS)
    recs = list(warc.parse_warc_bytes(buf))
    assert recs[0]["offset"] == 0
    for r in recs:
        sliced = buf[r["offset"]:r["offset"] + r["record_len"]]
        again = list(warc.parse_warc_bytes(sliced))
        assert len(again) == 1
        assert {k: again[0][k] for k in ("url", "body_md5")} == \
            {k: r[k] for k in ("url", "body_md5")}
    # offsets tile the shard exactly: no gaps, no overlaps
    assert sorted(r["offset"] for r in recs) == \
        [0] + sorted(r["offset"] + r["record_len"] for r in recs)[:-1]
    assert max(r["offset"] + r["record_len"] for r in recs) == len(buf)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["a", "b"]),
                  st.text(max_size=200)),
        min_size=0, max_size=6),
    cut=st.integers(0, 100),
    flip_at=st.integers(0, 10**6),
    flip_to=st.integers(0, 255),
)
def test_parser_never_raises_and_stays_consistent(docs, cut, flip_at,
                                                  flip_to):
    """Fuzz: under truncation + a byte flip anywhere, the parser (a)
    never raises, (b) every yielded record is internally consistent
    (content_len == len(body), md5 matches), and (c) offsets point at
    a version line. Dedup doc_ids first (duplicate ids are legal WARC
    but break the sorted-unique zip below)."""
    seen, uniq = set(), []
    for d, s, t in docs:
        if d not in seen:
            seen.add(d)
            uniq.append((d, s, t))
    buf = bytearray(warc.build_warc_bytes(uniq))
    if buf and cut:
        buf = buf[:-min(cut, len(buf))]
    if buf:
        buf[flip_at % len(buf)] = flip_to
    recs = list(warc.parse_warc_bytes(bytes(buf), with_body=True))
    for r in recs:
        assert r["content_len"] == len(r["body"])
        assert r["body_md5"] == hashlib.md5(r["body"]).hexdigest()
        assert bytes(buf[r["offset"]:r["offset"] + 8]) == b"WARC/1.0"
        assert r["offset"] + r["record_len"] <= len(buf)
