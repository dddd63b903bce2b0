"""Partitioned cuckoo filter properties (SURVEY.md §5.2.3 applied to
the north rule's "Bloom/cuckoo URL-seen"): no false negatives ever,
idempotent re-add, working deletion, deterministic rebuilds, and the
stash catching kick-budget overflow."""

import shutil
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from supacrawler_spark.cuckoo import CuckooState


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cuckoo_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _bucketed(keys):
    arr = np.array(keys, dtype=np.int64)
    return arr, (arr % 4 + 4) % 4


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=500, unique=True))
@settings(max_examples=30, deadline=None)
def test_no_false_negatives_numpy_core(keys):
    d = tempfile.mkdtemp(prefix="cuckoo_prop_")
    try:
        c = CuckooState(d, n_buckets=4, log2_slots=9)
        arr, buckets = _bucketed(keys)
        for bk in np.unique(buckets):
            c._insert_core(int(bk), arr[buckets == bk])
        for bk in np.unique(buckets):
            sub = arr[buckets == bk]
            table, stash = c._load(int(bk))
            fp, i1, i2 = c._derive(sub)
            assert c._contains_core(table, stash, fp, i1, i2).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stash_catches_overflow(tmpdir):
    # 8 slots x 4 = 32 resident fingerprints; 300 keys MUST overflow
    # into the stash, and every key must still probe positive
    c = CuckooState(tmpdir, n_buckets=1, log2_slots=3, max_kicks=20)
    arr = np.arange(300, dtype=np.int64) * 7919 + 13
    c._insert_core(0, arr)
    table, stash = c._load(0)
    assert stash.size > 0
    fp, i1, i2 = c._derive(arr)
    assert c._contains_core(table, stash, fp, i1, i2).all()


def test_deterministic_rebuild(tmpdir):
    # same insertion order => byte-identical bucket state (resume
    # replays are reproducible; deterministic eviction)
    arr = np.arange(2000, dtype=np.int64) * 104729 + 7
    c1 = CuckooState(tmpdir + "/a", n_buckets=1, log2_slots=8)
    c2 = CuckooState(tmpdir + "/b", n_buckets=1, log2_slots=8)
    for half in (arr[:1000], arr[1000:]):
        c1._insert_core(0, half)
        c2._insert_core(0, half)
    t1, s1 = c1._load(0)
    t2, s2 = c2._load(0)
    assert (t1 == t2).all() and (s1 == s2).all()


def test_delete_core(tmpdir):
    c = CuckooState(tmpdir, n_buckets=1, log2_slots=10)
    arr = np.arange(400, dtype=np.int64) * 6151 + 3
    # guard against true (bucket, fp) collisions, the documented
    # cuckoo caveat, so the assertion below is exact
    fp, i1, _ = c._derive(arr)
    packed = c._pack(i1, fp)
    assert len(np.unique(packed)) == len(arr), "fixture collision"
    c._insert_core(0, arr)
    gone, kept = arr[:200], arr[200:]
    c._delete_core(0, gone)
    table, stash = c._load(0)
    kfp, ki1, ki2 = c._derive(kept)
    assert c._contains_core(table, stash, kfp, ki1, ki2).all()
    gfp, gi1, gi2 = c._derive(gone)
    # deleted keys are really gone (no (bucket,fp) collisions above)
    assert not c._contains_core(table, stash, gfp, gi1, gi2).any()
    # deleting a never-inserted key is a contract violation
    with pytest.raises(KeyError):
        c._delete_core(0, np.array([999_999_999_999], dtype=np.int64))


def test_dataframe_add_flag_remove(spark, tmpdir):
    c = CuckooState(tmpdir, n_buckets=8, log2_slots=12)
    df = spark.range(1000).selectExpr("xxhash64(id) as url_hash",
                                      "cast(id as string) as url")
    c.add(df)
    assert c.flag(df).filter("not _maybe_seen").count() == 0
    other = spark.range(1000, 2000).selectExpr(
        "xxhash64(id) as url_hash", "cast(id as string) as url")
    # 16-bit fingerprints: false positives rare at this fill ratio
    assert c.flag(other).filter("_maybe_seen").count() < 20
    c.remove(df.filter("id < 500"))
    kept = df.filter("id >= 500")
    assert c.flag(kept).filter("not _maybe_seen").count() == 0


def test_idempotent_add(spark, tmpdir):
    c = CuckooState(tmpdir, n_buckets=4, log2_slots=10)
    df = spark.range(100).selectExpr("xxhash64(id) as url_hash")
    c.add(df)
    t_before = [c._load(b)[0].copy() for b in range(4)]
    c.add(df)  # resume replay
    for b in range(4):
        table, stash = c._load(b)
        assert (table == t_before[b]).all() and stash.size == 0
    assert c.flag(df.selectExpr("url_hash", "'x' as url")).filter(
        "not _maybe_seen").count() == 0
