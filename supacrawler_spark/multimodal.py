"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
struct of typed metadata. The Spark-side plumbing — schema, Arrow batch
shape, mapInPandas signature, partitioning — is real and tested; the
actual codec work is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError, and
``fake_decode_meta`` provides a deterministic stand-in (byte length,
digest, pseudo width/height derived from the digest) so the pipeline
is end-to-end exercisable.

At scale: binary payloads never shuffle — metadata extraction happens
in the scan stage (mapInPandas over the reading partitions), and only
the slim metadata rows move on. Arrow batch size is kept small by the
session default (maxRecordsPerBatch) because payloads are fat.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])


def decode_image(payload: bytes):
    """Real codec entry point — STUB. Plug Pillow/libvips here on a
    real deployment; the container ships no image libraries."""
    raise NotImplementedError(
        "image decoding is stubbed in this environment; "
        "use fake_decode_meta for deterministic pipeline tests")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic decode stand-in: metadata derived purely from the
    bytes (so tests and oracles are stable)."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    return {
        "n_bytes": len(payload),
        "sha": digest.hex(),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "format": "fake/raw",
    }


def media_metadata(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata from a binary media column via
    mapInPandas (Arrow batches; one pass, payload never re-shuffled)."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(getattr(r, payload_col) or b"")
                m = fake_decode_meta(payload)
                m[id_col] = int(getattr(r, id_col))
                rows.append(m)
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.mapInPandas(extract, MEDIA_META_SCHEMA)


def docs_as_media(spark, sf_dir) -> DataFrame:
    """Fixture: treat document text bytes as opaque media payloads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.selectExpr("doc_id", "cast(text as binary) as payload")
