"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
struct of typed metadata, the screenshot-artifact analog of the
reference's binary pipeline (screenshot/service.go:110-633 stores PNG/
JPEG bytes + format/width/height metadata).

``decode_image`` is a real, dependency-free container parser: it reads
width/height/format from PNG (IHDR), GIF (screen descriptor), JPEG
(SOF segment walk) and BMP (DIB header) bytes — no image libraries
needed. Pixel-level work (resize, feature extraction) would plug in
Pillow/libvips on a real deployment and remains out of container
scope; ``fake_decode_meta`` is kept as the deterministic stand-in for
payloads that are not images.

At scale: binary payloads never shuffle — metadata extraction happens
in the scan stage (mapInPandas over the reading partitions), and only
the slim metadata rows move on. Arrow batch size is kept small by the
session default (maxRecordsPerBatch) because payloads are fat.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

MEDIA_DIGEST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("digest", T.StringType()),
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG SOF markers carry dimensions; C4/C8/CC are DHT/JPG/DAC, not SOFs
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_image(payload: bytes) -> dict:
    """Parse (format, width, height) from image container headers.

    Pure-bytes, dependency-free. Raises ValueError for non-image or
    truncated payloads.
    """
    b = bytes(payload or b"")
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"format": "png", "width": w, "height": h}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"format": "gif", "width": w, "height": h}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2          # standalone markers, no length
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(b):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return {"format": "jpeg", "width": w, "height": h}
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF segment found")
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    raise ValueError("unrecognized image container")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic decode stand-in for NON-image payloads: metadata
    derived purely from the bytes (so tests and oracles are stable)."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    return {
        "n_bytes": len(payload),
        "sha": digest.hex(),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "format": "fake/raw",
    }


# ---------------------------------------------------------------------------
# deterministic image synthesis (fixture: real bytes, a-priori metadata)
# ---------------------------------------------------------------------------

def image_dims(doc_id: int) -> "tuple[int, int]":
    """The fixture's dimension rule — mirrored literally by the DuckDB
    oracle, so the header parser must recover it from real bytes."""
    return 16 + doc_id % 48, 16 + (doc_id * 7) % 48


def synth_image(doc_id: int) -> "tuple[bytes, str]":
    """A real minimal image for doc_id: PNG / GIF / JPEG round-robin,
    dimensions from image_dims. The PNG is fully valid (zlib IDAT,
    correct CRCs); GIF and JPEG are header-complete containers with
    minimal body segments — enough for any header parser."""
    w, h = image_dims(doc_id)
    fmt = doc_id % 3
    if fmt == 0:
        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
        row = bytes([doc_id % 251] * w)
        raw = b"".join(b"\x00" + row for _ in range(h))
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6))
                + chunk(b"IEND", b"")), "png"
    if fmt == 1:
        gct = bytes([0, 0, 0, 255, 255, 255])   # 2-color table
        screen = struct.pack("<HH", w, h) + b"\x80\x00\x00"
        img_desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        # minimal LZW stream: min code size 2, one clear+end block
        lzw = b"\x02\x02\x44\x01\x00"
        return b"GIF87a" + screen + gct + img_desc + lzw + b"\x3b", "gif"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app0 + sof0 + sos + b"\x00" + b"\xff\xd9", "jpeg"


def media_metadata(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata from a binary media column via
    mapInPandas (Arrow batches; one pass, payload never re-shuffled).
    Unparseable payloads get format='unknown' and null dimensions."""

    cols = [f.name for f in MEDIA_META_SCHEMA.fields]

    def extract(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(getattr(r, payload_col) or b"")
                try:
                    m = decode_image(payload)
                except ValueError:
                    m = {"format": "unknown", "width": None, "height": None}
                m[id_col] = int(getattr(r, id_col))
                rows.append(m)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(extract, MEDIA_META_SCHEMA)


def media_digest(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Binary-exactness check for the payload plumbing: byte length +
    md5, computed JVM-side (codegen built-ins — the fast path; the
    mapInPandas path is exercised by media_metadata)."""
    from pyspark.sql import functions as F
    return df.select(
        F.col(id_col),
        F.length(payload_col).cast("int").alias("n_bytes"),
        F.md5(payload_col).alias("digest"))


def docs_as_media(spark, sf_dir) -> DataFrame:
    """Fixture: a real image payload per document row, synthesized
    deterministically from doc_id (format/width/height are therefore
    a-priori known to the oracle while the bytes are real containers)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame({
                "doc_id": [int(i) for i in ids],
                "payload": [synth_image(int(i))[0] for i in ids],
            })

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return docs.mapInPandas(gen, schema)


def docs_as_text_media(spark, sf_dir) -> DataFrame:
    """Fixture: document text bytes as opaque payloads (digest path)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.selectExpr("doc_id", "cast(text as binary) as payload")
