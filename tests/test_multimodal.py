"""Image header codec + multimodal plumbing (SURVEY.md multimodal ops).

The decode path is real: synth_image produces actual PNG/GIF/JPEG
containers and decode_image must recover the generation parameters
from the bytes alone.
"""

import struct
import zlib

import pytest

from supacrawler_spark import multimodal as M


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 47, 48, 100, 12345])
def test_decode_recovers_synth_dims(doc_id):
    payload, fmt = M.synth_image(doc_id)
    meta = M.decode_image(payload)
    w, h = M.image_dims(doc_id)
    assert meta["format"] == fmt
    assert (meta["width"], meta["height"]) == (w, h)


def test_png_is_fully_valid():
    payload, _ = M.synth_image(0)  # doc 0 -> png
    # chunk walk: every CRC must verify and IEND must terminate
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    i, tags = 8, []
    while i < len(payload):
        (ln,) = struct.unpack(">I", payload[i:i + 4])
        tag = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", payload[i + 8 + ln:i + 12 + ln])
        assert crc == zlib.crc32(tag + data), tag
        tags.append(tag)
        i += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    # IDAT inflates to h rows of (filter byte + w pixels)
    w, h = M.image_dims(0)
    idat = payload[8 + 12 + 13 + 8:]
    raw = zlib.decompress(idat[: len(idat) - 12 - 4])
    assert len(raw) == h * (1 + w)


def test_bmp_and_garbage_paths():
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 33, -7) + b"\x00" * 10
    meta = M.decode_image(bmp)
    assert (meta["format"], meta["width"], meta["height"]) == ("bmp", 33, 7)
    with pytest.raises(ValueError):
        M.decode_image(b"not an image at all")
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xd9")  # jpeg with no SOF


def test_media_metadata_dataframe(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "payload": [M.synth_image(i)[0] for i in range(3)] + [b"junk"],
    })
    df = spark.createDataFrame(pdf)
    rows = {r.doc_id: r for r in M.media_metadata(df).collect()}
    for i in range(3):
        w, h = M.image_dims(i)
        assert (rows[i].width, rows[i].height) == (w, h)
    assert rows[3].format == "unknown" and rows[3].width is None
