"""Screenshot artifact pipeline (SURVEY.md §2.1 S8;
internal/core/screenshot/service.go:110-633).

The reference renders a page in Playwright and stores the image to
Supabase storage or ``DATA_DIR/screenshots`` behind a ``/files`` route
(service.go:563-633). A batch engine cannot run a browser; what IS
re-expressible — and what this module builds — is the artifact
pipeline around the render:

- device viewport presets (service.go:155-196);
- the artifact naming scheme ``<ts>_<sanitized-url>.<fmt>``
  (service.go:575, sanitize 694-701), with the timestamp passed in
  explicitly (a batch run stamps once per run, not per row);
- a distributed binary render -> metadata -> file-sink pass
  (mapInPandas; payload bytes never shuffle — render and write happen
  in the same task);
- ``RENDER IS A DECLARED STAND-IN``: ``render_screenshot`` emits a
  valid minimal 8x8 24-bit BMP whose pixels derive deterministically
  from md5(url) — a real deployment plugs a browser render here. The
  container is real enough that ``multimodal.decode_image`` parses it
  back (roundtrip-tested).
"""

from __future__ import annotations

import hashlib
import os
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# service.go:155-196 — (viewport_w, viewport_h, device_scale)
DEVICE_VIEWPORTS = {
    "mobile": (375, 667, 2.0),
    "tablet": (768, 1024, 2.0),
    "tablet_landscape": (1024, 768, 2.0),
    "desktop": (1920, 1080, 1.0),
}

_THUMB = 8  # stand-in render grid (8x8 px, 24-bit)


def sanitize(u: str) -> str:
    """service.go:694-701: replace ``: / ? & = #`` with ``-``, strip
    ``%``, cap at 64 chars."""
    for ch in ":/?&=#":
        u = u.replace(ch, "-")
    u = u.replace("%", "")
    return u[:64]


def artifact_name(url: str, ts: str, fmt: str = "bmp") -> str:
    """service.go:575: ``<YYYYMMDD_HHMMSS>_<sanitize(url)>.<fmt>``."""
    return f"{ts}_{sanitize(url)}.{fmt.lower()}"


def render_screenshot(url: str) -> bytes:
    """DETERMINISTIC STAND-IN for the Playwright render: a valid 8x8
    24-bit BMP (BITMAPINFOHEADER) whose pixel bytes cycle md5(url).
    Parseable by multimodal.decode_image; byte-stable across engines
    and runs."""
    seed = hashlib.md5(url.encode("utf-8")).digest()
    row_bytes = _THUMB * 3  # 24 bytes/row, already 4-byte aligned
    pixels = bytes(seed[i % 16] for i in range(row_bytes * _THUMB))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, _THUMB, _THUMB, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0)
    return header + dib + pixels


SHOT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("device", StringType()),
    StructField("viewport_w", IntegerType()),
    StructField("viewport_h", IntegerType()),
    StructField("device_scale", StringType()),
    StructField("format", StringType()),
    StructField("name", StringType()),
    StructField("payload", BinaryType()),
])


def screenshots(df: DataFrame, device: str = "desktop",
                is_landscape: bool = False, ts: str = "19700101_000000",
                url_col: str = "url") -> DataFrame:
    """S8 render pass: one mapInPandas over the url column producing
    the artifact rows. The fat payload is born in the scan task and
    (in save_screenshots) dies in the same task — never shuffled."""
    key = ("tablet_landscape"
           if device == "tablet" and is_landscape else device)
    w, h, scale = DEVICE_VIEWPORTS.get(key, DEVICE_VIEWPORTS["desktop"])
    dev = device if key != "tablet_landscape" else "tablet"

    def render(batches):
        for pdf in batches:
            urls = pdf[url_col].tolist()
            yield pd.DataFrame({
                "url": urls,
                "device": [dev] * len(urls),
                "viewport_w": [w] * len(urls),
                "viewport_h": [h] * len(urls),
                "device_scale": [str(scale)] * len(urls),
                "format": ["bmp"] * len(urls),
                "name": [artifact_name(u, ts) for u in urls],
                "payload": [render_screenshot(u) for u in urls],
            }, columns=[f.name for f in SHOT_SCHEMA])

    return df.select(url_col).mapInPandas(render, SHOT_SCHEMA)


def save_screenshots(shots: DataFrame, data_dir: str) -> DataFrame:
    """The local-disk sink (service.go:626-633): write each payload to
    ``<data_dir>/screenshots/<name>`` inside the executors and return
    the serving manifest (url, path, served_url '/files/screenshots/').
    Executor-side writes in the render task — the driver sees only the
    slim manifest."""
    out_dir = os.path.join(data_dir, "screenshots")
    os.makedirs(out_dir, exist_ok=True)
    manifest_schema = StructType([
        StructField("url", StringType()),
        StructField("name", StringType()),
        StructField("path", StringType()),
        StructField("served_url", StringType()),
        StructField("n_bytes", IntegerType()),
    ])

    def write(batches):
        for pdf in batches:
            rows = {"url": [], "name": [], "path": [], "served_url": [],
                    "n_bytes": []}
            for u, name, payload in zip(
                    pdf["url"], pdf["name"], pdf["payload"]):
                p = os.path.join(out_dir, name)
                data = bytes(payload)
                with open(p, "wb") as f:
                    f.write(data)
                rows["url"].append(u)
                rows["name"].append(name)
                rows["path"].append(p)
                rows["served_url"].append("/files/screenshots/" + name)
                rows["n_bytes"].append(len(data))
            yield pd.DataFrame(rows)

    return shots.mapInPandas(write, manifest_schema)


def screenshot_artifacts(spark, sf_dir, limit: int = 60) -> DataFrame:
    """Driver query: render pass over the synthesized pages; emits the
    slim artifact metadata + payload digest (golden-parquet oracle:
    the same pure renderer run by scripts/make_goldens.py)."""
    from supacrawler_spark.sources import gen_pages_df

    pages_df, _ = gen_pages_df(spark, sf_dir, limit=limit)
    s = screenshots(pages_df, device="desktop")
    return s.select(
        "url", "device", "viewport_w", "viewport_h", "format", "name",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"))
