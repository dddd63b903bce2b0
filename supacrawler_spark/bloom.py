"""Partitioned Bloom URL-seen filter (north_rule; SURVEY.md §4.1).

The seen/discovered set at 10^10-URL design scale cannot be a single
driver-broadcast bitmap (~12 GB at 10 bits/key). Instead the key space
is hash-partitioned into buckets; each bucket owns an independent bit
array persisted in the crawl state directory. Build and probe are
`applyInPandas` per bucket — an executor task touches exactly one
bucket file, so memory per task is bits_per_bucket/8 bytes regardless
of total set size, and bucket count scales the filter horizontally.

Correctness never depends on the filter: a positive ("maybe seen") is
re-checked by the exact anti-join; a negative is provably unseen (no
false negatives — property-tested in tests/test_bloom.py). The filter
only prunes anti-join probe volume (SURVEY.md J2).

State files live on the shared filesystem (local[*] here; a real
cluster would point state_dir at HDFS/S3 — the numpy arrays are
written atomically via tmp+rename for resume safety).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x + _SPLITMIX_GAMMA
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class BloomState:
    """File-backed, bucket-partitioned Bloom filter over int64 keys."""

    def __init__(self, path: str, n_buckets: int = 32,
                 bits_per_bucket: int = 1 << 22, n_hashes: int = 4):
        self.path = path
        self.n_buckets = n_buckets
        self.bits = bits_per_bucket
        self.k = n_hashes
        os.makedirs(path, exist_ok=True)

    def _file(self, bucket: int) -> str:
        return os.path.join(self.path, f"bloom_{bucket:04d}.npy")

    # -- numpy core (runs inside executor tasks) --------------------------

    def _positions(self, hashes: np.ndarray) -> "list[np.ndarray]":
        h = hashes.astype(np.int64).view(np.uint64)
        out = []
        for _ in range(self.k):
            h = _splitmix(h)
            out.append((h % np.uint64(self.bits)).astype(np.int64))
        return out

    def _load(self, bucket: int) -> np.ndarray:
        f = self._file(bucket)
        if os.path.exists(f):
            return np.load(f)
        return np.zeros(self.bits // 64, dtype=np.uint64)

    def _store(self, bucket: int, arr: np.ndarray) -> None:
        tmp = self._file(bucket) + ".tmp.npy"  # ends in .npy: np.save keeps it
        np.save(tmp, arr)
        os.replace(tmp, self._file(bucket))

    def _set_bits(self, bucket: int, hashes: np.ndarray) -> None:
        arr = self._load(bucket)
        with np.errstate(over="ignore"):
            for pos in self._positions(hashes):
                np.bitwise_or.at(arr, pos >> 6,
                                 np.uint64(1) << (pos & 63).astype(np.uint64))
        self._store(bucket, arr)

    def _test_bits(self, bucket: int, hashes: np.ndarray) -> np.ndarray:
        arr = self._load(bucket)
        with np.errstate(over="ignore"):
            hit = np.ones(len(hashes), dtype=bool)
            for pos in self._positions(hashes):
                bits = (arr[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
                hit &= bits.astype(bool)
        return hit

    # -- DataFrame API ------------------------------------------------------

    def _bucket_col(self, hash_col: str):
        return F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int")

    def add(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Distributed build: one task per touched bucket ORs its keys
        into the bucket file. Idempotent (re-adding after a resume only
        re-sets bits)."""
        state = self
        schema = T.StructType([T.StructField("n", T.LongType())])

        def write(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["_bucket"].iloc[0])
            state._set_bits(b, pdf[hash_col].to_numpy(dtype=np.int64))
            return pd.DataFrame({"n": [len(pdf)]})

        keyed = df.select(hash_col).withColumn("_bucket",
                                               self._bucket_col(hash_col))
        keyed.groupBy("_bucket").applyInPandas(write, schema).count()

    def flag(self, df: DataFrame, hash_col: str = "url_hash",
             out_col: str = "_maybe_seen") -> DataFrame:
        """Add a boolean `out_col`: True = maybe in the set (must be
        exact-checked), False = definitely new."""
        state = self
        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(out_col, T.BooleanType())])

        def probe(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["_bucket"].iloc[0])
            pdf = pdf.drop(columns=["_bucket"])
            pdf[out_col] = state._test_bits(
                b, pdf[hash_col].to_numpy(dtype=np.int64))
            return pdf

        keyed = df.withColumn("_bucket", self._bucket_col(hash_col))
        return keyed.groupBy("_bucket").applyInPandas(probe, schema)
