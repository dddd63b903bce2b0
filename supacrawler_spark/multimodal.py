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

# Everything a corrupt/truncated payload can raise out of the pure-bytes
# decoders: zlib.error (bad/short IDAT), struct.error (truncated fixed
# headers), IndexError (short inflated data / short pixel rows), plus the
# deliberate ValueError / NotImplementedError signals. Per-row handlers
# catch this tuple so a single bad payload degrades to the documented
# format='unsupported'/null row instead of failing the Spark job.
_ROW_DECODE_ERRORS = (ValueError, NotImplementedError, zlib.error,
                      struct.error, IndexError)

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


# ---------------------------------------------------------------------------
# pixel decode / resize / feature-extract (real for PNG-gray8 + BMP24;
# the codec-library seam raises NotImplementedError for JPEG/GIF)
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(b: bytes) -> "tuple[int, int, bytes]":
    """REAL dependency-free PNG pixel decoder for 8-bit grayscale
    non-interlaced images: chunk walk, zlib inflate, and full
    scanline unfiltering (None/Sub/Up/Average/Paeth). Returns
    (width, height, row-major top-down pixel bytes)."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a png")
    i = 8
    w = h = None
    idat = b""
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i:i + 4], "big")
        tag = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8 or color != 0 or interlace != 0:
                raise NotImplementedError(
                    "pixel decode implemented for 8-bit grayscale "
                    "non-interlaced PNG; plug an image library for more")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("png: no IHDR")
    raw = zlib.decompress(idat)
    out = bytearray()
    prev = bytes(w)
    pos = 0
    for _y in range(h):
        ft = raw[pos]
        pos += 1
        row = bytearray(raw[pos:pos + w])
        pos += w
        if ft == 0:
            pass
        elif ft == 1:    # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ft == 2:    # Up
            for x in range(w):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:    # Average
            for x in range(w):
                a = row[x - 1] if x else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:    # Paeth
            for x in range(w):
                a = row[x - 1] if x else 0
                c = prev[x - 1] if x else 0
                row[x] = (row[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"png: bad filter type {ft}")
        out += row
        prev = row
    return w, h, bytes(out)


def encode_png_gray(w: int, h: int, pix: bytes,
                    filters: "list[int] | None" = None) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filters 0/1/2 per row)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    rows = []
    prev = bytes(w)
    for y in range(h):
        row = pix[y * w:(y + 1) * w]
        ft = filters[y % len(filters)] if filters else 0
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = bytes((row[x] - (row[x - 1] if x else 0)) & 0xFF
                        for x in range(w))
        elif ft == 2:
            enc = bytes((row[x] - prev[x]) & 0xFF for x in range(w))
        else:
            raise ValueError("encoder supports filters 0/1/2")
        rows.append(bytes([ft]) + enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
            + chunk(b"IEND", b""))


def decode_bmp_gray(b: bytes) -> "tuple[int, int, bytes]":
    """REAL 24-bit bottom-up BMP pixel decoder -> integer-luma
    grayscale (r*299+g*587+b*114)//1000, row-major top-down."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a bmp")
    off = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    if bpp != 24 or h <= 0:
        raise NotImplementedError(
            "pixel decode implemented for 24-bit bottom-up BMP")
    stride = (w * 3 + 3) & ~3
    out = bytearray(w * h)
    for y in range(h):
        src = off + (h - 1 - y) * stride    # bottom-up rows
        for x in range(w):
            bb, gg, rr = b[src + 3 * x:src + 3 * x + 3]
            out[y * w + x] = (rr * 299 + gg * 587 + bb * 114) // 1000
    return w, h, bytes(out)


def decode_pixels(payload: bytes) -> dict:
    """Pixel-level decode to grayscale. REAL for PNG-gray8 and BMP24
    (the containers this repo's fixtures emit); raises
    NotImplementedError for JPEG/GIF entropy decoding — the clearly
    marked seam where a real deployment plugs Pillow/libvips."""
    b = bytes(payload or b"")
    if b.startswith(_PNG_SIG):
        w, h, pix = decode_png_gray(b)
        return {"format": "png", "width": w, "height": h, "pix": pix}
    if b[:2] == b"BM":
        w, h, pix = decode_bmp_gray(b)
        return {"format": "bmp", "width": w, "height": h, "pix": pix}
    if b[:2] == b"\xff\xd8" or b[:6] in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "JPEG/GIF pixel decode requires an image codec library")
    raise ValueError("unrecognized image container")


def resize_nn(pix: bytes, w: int, h: int, ow: int, oh: int) -> bytes:
    """Nearest-neighbor grayscale resample (floor mapping
    x_in = x_out*w//ow — mirrored literally by the SQL oracle)."""
    return bytes(pix[(y * h // oh) * w + (x * w // ow)]
                 for y in range(oh) for x in range(ow))


def media_resize(df: DataFrame, out_w: int = 8, out_h: int = 8,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Distributed thumbnail pass: decode -> nearest-neighbor resize
    in one mapInPandas (payload bytes die in the scan task; only slim
    stats move on). Non-decodable payloads -> format='unsupported'."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {id_col: int(getattr(r, id_col)),
                       "format": "unsupported", "width": None,
                       "height": None, "px_min": None, "px_max": None}
                try:
                    d = decode_pixels(getattr(r, payload_col))
                    small = resize_nn(d["pix"], d["width"], d["height"],
                                      out_w, out_h)
                    rec.update(format=d["format"], width=out_w,
                               height=out_h, px_min=min(small),
                               px_max=max(small))
                except _ROW_DECODE_ERRORS:
                    pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(work, schema)


def media_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over decoded pixels (brightness statistics
    in exact integer algebra: n_px, px_sum, px_min, px_max) — one
    mapInPandas pass, same batch shape as media_resize."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {id_col: int(getattr(r, id_col)),
                       "format": "unsupported", "width": None,
                       "height": None, "n_px": None, "px_sum": None,
                       "px_min": None, "px_max": None}
                try:
                    d = decode_pixels(getattr(r, payload_col))
                    pix = d["pix"]
                    rec.update(format=d["format"], width=d["width"],
                               height=d["height"], n_px=len(pix),
                               px_sum=sum(pix), px_min=min(pix),
                               px_max=max(pix))
                except _ROW_DECODE_ERRORS:
                    pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(work, schema)


# ---------------------------------------------------------------------------
# audio: real RIFF/WAVE header parsing over deterministic fixtures
# ---------------------------------------------------------------------------

def audio_params(doc_id: int) -> "tuple[int, int, int, int]":
    """Fixture rule: (channels, sample_rate, bits, n_samples) —
    a-priori, mirrored literally by the SQL oracle."""
    return (1 + doc_id % 2,
            (8000, 16000, 22050, 44100)[doc_id % 4],
            (8, 16)[doc_id % 2],
            256 + (doc_id * 13) % 1024)


def synth_wav(doc_id: int) -> bytes:
    """A real, complete RIFF/WAVE container (PCM fmt chunk + data
    chunk; sample bytes cycle a doc_id-seeded pattern) with dims from
    audio_params."""
    ch, rate, bits, n = audio_params(doc_id)
    block = ch * bits // 8
    data = bytes((doc_id + i) % 251 for i in range(n * block))
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """REAL dependency-free RIFF/WAVE header parser: chunk walk to
    'fmt ' and 'data', returning channels / sample_rate / bits /
    n_samples / duration_ms. Raises ValueError on non-WAV bytes."""
    b = bytes(payload or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    fmt = None
    data_len = None
    while i + 8 <= len(b):
        tag = b[i:i + 4]
        ln = struct.unpack("<I", b[i + 4:i + 8])[0]
        if tag == b"fmt " and ln >= 16:
            fmt = struct.unpack("<HHIIHH", b[i + 8:i + 24])
        elif tag == b"data":
            data_len = ln
        i += 8 + ln + (ln & 1)   # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("wav: missing fmt/data chunk")
    _audio_fmt, ch, rate, _bps, block, bits = fmt
    n_samples = data_len // block if block else 0
    return {"channels": ch, "sample_rate": rate, "bits": bits,
            "n_samples": n_samples,
            "duration_ms": n_samples * 1000 // rate if rate else 0}


def audio_metadata(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Typed audio metadata from binary payloads via mapInPandas
    (same batch shape as media_metadata; payloads never shuffle)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {id_col: int(getattr(r, id_col)),
                       "channels": None, "sample_rate": None,
                       "bits": None, "n_samples": None,
                       "duration_ms": None}
                try:
                    rec.update(decode_wav(getattr(r, payload_col)))
                except _ROW_DECODE_ERRORS:
                    pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(work, schema)


def docs_as_audio(spark, sf_dir) -> DataFrame:
    """Fixture: a real WAV payload per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [synth_wav(i) for i in ids]})

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return docs.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# frame sampling over a deterministic fake video container (the
# container format is a stand-in — no video codec ships here — but the
# byte-offset parsing, sampling arithmetic, schema and batch shape are
# the real Spark plumbing a frame sampler needs)
# ---------------------------------------------------------------------------

_FAKV_MAGIC = b"FAKV"


def video_frames(doc_id: int) -> int:
    """Fixture frame-count rule (a-priori, mirrored by the oracle)."""
    return 4 + doc_id % 7


def synth_video(doc_id: int) -> bytes:
    """Deterministic fake video: 'FAKV' + u32le (n_frames, w, h) +
    n_frames raw grayscale frames; frame f pixel i = (doc_id+f+i)%251
    — every byte position is a-priori computable, so the sampler's
    offset math is genuinely checked end to end."""
    w, h = image_dims(doc_id)
    n = video_frames(doc_id)
    head = _FAKV_MAGIC + struct.pack("<III", n, w, h)
    frames = b"".join(
        bytes((doc_id + f + i) % 251 for i in range(w * h))
        for f in range(n))
    return head + frames


def frame_sample(df: DataFrame, every: int = 2,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Sample every k-th frame of a FAKV payload: one mapInPandas pass
    emitting one slim row per sampled frame (the row expansion happens
    inside the Arrow batch; frame bytes never leave the task).
    px_first/px_last are read from the actual frame bytes — wrong
    offset math shows up immediately."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_first", T.IntegerType()),
        T.StructField("px_last", T.IntegerType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b = bytes(getattr(r, payload_col) or b"")
                if b[:4] != _FAKV_MAGIC or len(b) < 16:
                    continue
                n, w, h = struct.unpack_from("<III", b, 4)
                fsz = w * h
                if fsz <= 0:
                    continue
                for f in range(0, n, every):
                    off = 16 + f * fsz
                    # truncated payload: only frames fully in the buffer
                    if off + fsz > len(b):
                        break
                    rows.append({
                        id_col: int(getattr(r, id_col)),
                        "frame_idx": f, "width": w, "height": h,
                        "px_first": b[off],
                        "px_last": b[off + fsz - 1],
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(work, schema)


def docs_as_gradient_media(spark, sf_dir) -> DataFrame:
    """Fixture: a gradient PNG per document — pixel (x,y) =
    (doc_id + 3x + 5y) % 251, dims from image_dims, scanline filters
    cycling None/Sub/Up so the decoder's unfiltering is genuinely
    exercised. Every pixel is a-priori computable by the SQL oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            payloads = []
            for i in ids:
                w, h = image_dims(i)
                pix = bytes((i + 3 * x + 5 * y) % 251
                            for y in range(h) for x in range(w))
                payloads.append(encode_png_gray(w, h, pix,
                                                filters=[0, 1, 2]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return docs.mapInPandas(gen, schema)


def docs_as_video(spark, sf_dir) -> DataFrame:
    """Fixture: a FAKV fake-video payload per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [synth_video(i) for i in ids]})

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return docs.mapInPandas(gen, schema)


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
