"""Partitioned Bloom filter properties (SURVEY.md §5.2.3):
no false negatives ever (a negative must be provably unseen)."""

import shutil
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from supacrawler_spark.bloom import BloomState


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="bloom_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=500, unique=True))
@settings(max_examples=30, deadline=None)
def test_no_false_negatives_numpy_core(keys):
    d = tempfile.mkdtemp(prefix="bloom_prop_")
    try:
        b = BloomState(d, n_buckets=4, bits_per_bucket=1 << 12)
        arr = np.array(keys, dtype=np.int64)
        buckets = (arr % 4 + 4) % 4
        for bk in np.unique(buckets):
            b._set_bits(int(bk), arr[buckets == bk])
        for bk in np.unique(buckets):
            assert b._test_bits(int(bk), arr[buckets == bk]).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dataframe_add_and_flag(spark, tmpdir):
    b = BloomState(tmpdir, n_buckets=8, bits_per_bucket=1 << 14)
    df = spark.range(1000).selectExpr("xxhash64(id) as url_hash",
                                      "cast(id as string) as url")
    b.add(df)
    flagged = b.flag(df)
    # every added key must flag as maybe-seen
    assert flagged.filter("not _maybe_seen").count() == 0
    other = spark.range(1000, 2000).selectExpr(
        "xxhash64(id) as url_hash", "cast(id as string) as url")
    fp = b.flag(other).filter("_maybe_seen").count()
    # false positives allowed but should be rare at this fill ratio
    assert fp < 200


def test_idempotent_add(spark, tmpdir):
    b = BloomState(tmpdir, n_buckets=4, bits_per_bucket=1 << 14)
    df = spark.range(100).selectExpr("xxhash64(id) as url_hash")
    b.add(df)
    b.add(df)  # resume replay
    assert b.flag(df.selectExpr("url_hash", "'x' as url")).filter(
        "not _maybe_seen").count() == 0
