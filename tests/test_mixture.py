"""mixture_sample (deterministic source-mixing epoch expansion) and
epoch_shuffle (seeded global-shuffle manifest): brute-force Python
twins, rounding invariants, and seed semantics."""

import hashlib

import pandas as pd

from supacrawler_spark import textops
from supacrawler_spark.textops import MIX_SCALE

SF = "/root/testdata/sf0.001"


def _docs_pd(sf=SF) -> pd.DataFrame:
    return pd.read_parquet(f"{sf}/documents.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _brute_mixture(docs: pd.DataFrame) -> pd.DataFrame:
    stats = docs.groupby("source").size().rename("n_docs").reset_index()
    stats["w"] = stats["source"].map(
        lambda s: 1 + int(_md5(s)[:4], 16) % 5)
    tot_w, tot_n = int(stats["w"].sum()), int(stats["n_docs"].sum())
    stats["rate_e6"] = (stats["w"] * tot_n * MIX_SCALE) \
        // (tot_w * stats["n_docs"])
    rate = dict(zip(stats["source"], stats["rate_e6"]))
    copies = docs.apply(
        lambda r: rate[r["source"]] // MIX_SCALE
        + (int(_md5(f"mix|{r['doc_id']}")[:8], 16) % MIX_SCALE
           < rate[r["source"]] % MIX_SCALE), axis=1)
    out = stats[["source", "n_docs", "rate_e6"]].copy()
    out["n_expanded"] = out["source"].map(
        docs.assign(c=copies).groupby("source")["c"].sum())
    return out.sort_values("source").reset_index(drop=True)


def test_mixture_sample_brute_force(spark):
    got = (textops.mixture_sample(spark, SF).toPandas()
           .sort_values("source").reset_index(drop=True))
    want = _brute_mixture(_docs_pd())
    for c in ("n_docs", "rate_e6", "n_expanded"):
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_mixture_rounding_invariants(spark):
    df = textops.mixture_sample(spark, SF).toPandas()
    # stochastic rounding: every doc contributes floor(rate) or
    # floor(rate)+1 copies, so per-source totals are bracketed
    lo = df["n_docs"] * (df["rate_e6"] // MIX_SCALE)
    hi = df["n_docs"] * (df["rate_e6"] // MIX_SCALE
                         + (df["rate_e6"] % MIX_SCALE > 0))
    assert ((df["n_expanded"] >= lo) & (df["n_expanded"] <= hi)).all()
    # the epoch is ~N docs overall (flooring loses < 1 doc/source)
    n = _docs_pd().shape[0]
    assert n - len(df) <= df["n_expanded"].sum() <= n + len(df)


def test_epoch_shuffle_brute_force(spark):
    got = (textops.epoch_shuffle(spark, SF, n_shards=4, seed="s1")
           .toPandas().sort_values("shard_id").reset_index(drop=True))
    docs = _docs_pd()
    docs["perm"] = docs["doc_id"].map(lambda d: _md5(f"s1|{d}"))
    docs["shard_id"] = docs["perm"].map(lambda p: int(p[:4], 16) % 4)
    docs["doc_md5"] = docs["text"].map(_md5)
    want = (docs.sort_values(["perm", "doc_id"]).groupby("shard_id")
            .agg(n_docs=("doc_id", "size"),
                 digest=("doc_md5", lambda s: _md5("".join(s))))
            .reset_index())
    for d in (got, want):
        d["n_docs"] = d["n_docs"].astype("int64")
        d["shard_id"] = d["shard_id"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_epoch_shuffle_seed_semantics(spark):
    a = textops.epoch_shuffle(spark, SF, seed="ep0").toPandas()
    a2 = textops.epoch_shuffle(spark, SF, seed="ep0").toPandas()
    b = textops.epoch_shuffle(spark, SF, seed="ep1").toPandas()
    key = lambda d: d.sort_values("shard_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(a), key(a2))   # same seed: stable
    assert set(a["n_docs"].sum() for a in (a, b)) == \
        {len(_docs_pd())}                            # partition of corpus
    merged = key(a).merge(key(b), on="shard_id", how="inner")
    assert (merged["digest_x"] != merged["digest_y"]).any()  # re-deal
