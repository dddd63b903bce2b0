"""Partitioned cuckoo URL-seen filter (north_rule names "Bloom/cuckoo
URL-seen"; this is the cuckoo half — bloom.py is the other).

Same horizontal shape as BloomState: the key space is hash-partitioned
into buckets, each bucket owns an independent cuckoo table persisted
in the crawl state directory, and build/probe run `applyInPandas` per
bucket so one executor task touches exactly one bucket file. What the
cuckoo variant adds over Bloom (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14 — public paper):

- **Deletion.** A fingerprint can be removed, so retry-era semantics
  (a failed fetch re-opening its URL, crawl/service.go:564-571 in the
  reference) can shrink the filter instead of tombstoning around it.
- **Bounded lookup.** A probe reads exactly 2 table rows (+ a stash
  scan), vs k scattered bit reads for Bloom.

Layout per bucket: a `(n_slots, slots_per_bucket)` uint16 table of
fingerprints (0 = empty slot) plus a stash of packed
`(slot_index << 16) | fp` entries for insertions that exhausted the
kick budget — the stash is what makes "no false negatives" an
invariant rather than a load-factor hope. Slot derivation is the
standard partial-key scheme: ``i1 = H(key) mod n_slots``,
``i2 = i1 XOR (H(fp) mod n_slots)`` (involutive, so either residence
recovers the other). Eviction is **deterministic** (victim slot =
kick-count mod slots_per_bucket), so a rebuilt filter over the same
insertion order is byte-identical — resume replays are reproducible.

Correctness never depends on the filter (SURVEY.md J2): a positive
("maybe seen") is re-checked by the exact anti-join; a negative is
provably unseen. Deleting key X can, on a true (bucket, fp) collision,
make a still-present key Y flag negative — the standard cuckoo caveat —
so the crawl only ever deletes keys it previously inserted and whose
exact-state row is deleted in the same commit.

Vectorization: the per-wave hot path is the probe, which is fully
numpy-vectorized (two gathers + compares). Insertion is vectorized for
the common free-slot case (one key per target row per round); only
keys needing eviction chains fall to a per-key loop, which the
bucket partitioning bounds (and which runs once per discovery, not
per probe).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from supacrawler_spark.bloom import _splitmix

_FP_SALT = np.uint64(0xA24BAED4963EE407)


class CuckooState:
    """File-backed, bucket-partitioned cuckoo filter over int64 keys."""

    def __init__(self, path: str, n_buckets: int = 32,
                 log2_slots: int = 16, slots_per_bucket: int = 4,
                 max_kicks: int = 500):
        self.path = path
        self.n_buckets = n_buckets
        self.n_slots = 1 << log2_slots          # power of 2: XOR stays in range
        self.spb = slots_per_bucket
        self.max_kicks = max_kicks
        os.makedirs(path, exist_ok=True)

    def _file(self, bucket: int) -> str:
        return os.path.join(self.path, f"cuckoo_{bucket:04d}.npz")

    # -- numpy core (runs inside executor tasks) --------------------------

    def _derive(self, hashes: np.ndarray):
        """(fp uint16 nonzero, i1 int64, i2 int64) for each key."""
        h = hashes.astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            fp = (_splitmix(h ^ _FP_SALT) % np.uint64(65535)
                  + np.uint64(1)).astype(np.uint16)
            mask = np.uint64(self.n_slots - 1)
            i1 = (_splitmix(h) & mask).astype(np.int64)
            i2 = (i1.view(np.uint64)
                  ^ (_splitmix(fp.astype(np.uint64)) & mask)).astype(np.int64)
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        with np.errstate(over="ignore"):
            off = int(_splitmix(np.uint64(fp)) & np.uint64(self.n_slots - 1))
        return i ^ off

    @staticmethod
    def _pack(idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return ((idx.astype(np.uint64) << np.uint64(16))
                | fp.astype(np.uint64))

    def _load(self, bucket: int):
        f = self._file(bucket)
        if os.path.exists(f):
            with np.load(f) as z:
                return z["table"], z["stash"]
        return (np.zeros((self.n_slots, self.spb), dtype=np.uint16),
                np.zeros(0, dtype=np.uint64))

    def _store(self, bucket: int, table: np.ndarray,
               stash: np.ndarray) -> None:
        tmp = self._file(bucket) + ".tmp.npz"
        np.savez(tmp, table=table, stash=stash)
        os.replace(tmp, self._file(bucket))

    def _contains_core(self, table, stash, fp, i1, i2) -> np.ndarray:
        hit = ((table[i1] == fp[:, None]).any(axis=1)
               | (table[i2] == fp[:, None]).any(axis=1))
        if stash.size:
            hit |= (np.isin(self._pack(i1, fp), stash)
                    | np.isin(self._pack(i2, fp), stash))
        return hit

    def _insert_core(self, bucket: int, hashes: np.ndarray) -> None:
        table, stash = self._load(bucket)
        fp, i1, i2 = self._derive(hashes)
        # idempotency (resume replays re-add): a fingerprint already
        # resident at either slot is skipped. A cross-key (bucket, fp)
        # collision also skips here — that only preserves an existing
        # positive, never creates a negative.
        pending = np.flatnonzero(~self._contains_core(table, stash,
                                                      fp, i1, i2))
        # intra-batch dedup on (i1, fp): same packed identity inserts once
        if pending.size:
            _, first = np.unique(self._pack(i1[pending], fp[pending]),
                                 return_index=True)
            pending = pending[np.sort(first)]
        # vectorized fast rounds: for each target row take one pending
        # key per round and drop it into a free slot
        for _ in range(2 * self.spb):
            if not pending.size:
                break
            rows = i1[pending]
            _, firstpos = np.unique(rows, return_index=True)
            cand = pending[np.sort(firstpos)]
            free = table[i1[cand]] == 0
            has_free = free.any(axis=1)
            slot = free.argmax(axis=1)
            placed = cand[has_free]
            if not placed.size:
                break
            table[i1[placed], slot[has_free]] = fp[placed]
            pending = pending[~np.isin(pending, placed)]
        # slow path: deterministic kick chains for full buckets.
        # Standard insert order: try BOTH candidate buckets for a free
        # slot first; only then evict, starting the chain at i2.
        new_stash = []
        for j in pending:
            f = int(fp[j])
            i_a, i_b = int(i1[j]), int(i2[j])
            free = np.flatnonzero(table[i_a] == 0)
            if free.size:
                table[i_a, free[0]] = f
                continue
            i = i_b
            for kick in range(self.max_kicks):
                row = table[i]
                free = np.flatnonzero(row == 0)
                if free.size:
                    table[i, free[0]] = f
                    break
                s = kick % self.spb          # deterministic victim
                victim = int(table[i, s])
                table[i, s] = f
                f, i = victim, self._alt(i, victim)
            else:
                new_stash.append((i << 16) | f)
        if new_stash:
            stash = np.concatenate(
                [stash, np.array(new_stash, dtype=np.uint64)])
        self._store(bucket, table, stash)

    def _delete_core(self, bucket: int, hashes: np.ndarray) -> None:
        table, stash = self._load(bucket)
        fp, i1, i2 = self._derive(hashes)
        for f, a, b in zip(fp.tolist(), i1.tolist(), i2.tolist()):
            hit = False
            for i in (a, b):
                m = np.flatnonzero(table[i] == f)
                if m.size:
                    table[i, m[0]] = 0
                    hit = True
                    break
            if not hit and stash.size:
                w = np.flatnonzero((stash == ((a << 16) | f))
                                   | (stash == ((b << 16) | f)))
                if w.size:
                    stash = np.delete(stash, w[0])
                    hit = True
            if not hit:
                raise KeyError(
                    "cuckoo delete of a key that was never inserted "
                    "(undefined in a cuckoo filter)")
        self._store(bucket, table, stash)

    # -- DataFrame API ------------------------------------------------------

    def _bucket_col(self, hash_col: str):
        return F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int")

    def _apply(self, df: DataFrame, hash_col: str, core) -> None:
        state = self
        schema = T.StructType([T.StructField("n", T.LongType())])

        def work(pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(pdf["_bucket"].iloc[0])
            core(state, b, pdf[hash_col].to_numpy(dtype=np.int64))
            return pd.DataFrame({"n": [len(pdf)]})

        keyed = df.select(hash_col).withColumn("_bucket",
                                               self._bucket_col(hash_col))
        keyed.groupBy("_bucket").applyInPandas(work, schema).count()

    def add(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Distributed build: one task per touched bucket inserts its
        keys. Idempotent (a resume replay re-adds without growth)."""
        self._apply(df, hash_col, CuckooState._insert_core)

    def remove(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Distributed delete. Only keys previously ``add``-ed (and not
        yet removed) may be deleted — the standard cuckoo contract."""
        self._apply(df, hash_col, CuckooState._delete_core)

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
            table, stash = state._load(b)
            fp, i1, i2 = state._derive(
                pdf[hash_col].to_numpy(dtype=np.int64))
            pdf[out_col] = state._contains_core(table, stash, fp, i1, i2)
            return pdf

        keyed = df.withColumn("_bucket", self._bucket_col(hash_col))
        return keyed.groupBy("_bucket").applyInPandas(probe, schema)
