"""Corrupt/truncated payload robustness (ADVICE r3): a bad payload
must degrade to the documented 'unsupported'/null row — never fail the
Spark job — across every decode error class (zlib.error on bad IDAT,
struct.error on truncated fixed headers, IndexError on short data)."""

import struct

import pytest

from supacrawler_spark import multimodal as M


def _corrupt_png():
    """Valid container walk, garbage IDAT -> zlib.error inside decode."""
    good = M.encode_png_gray(4, 4, bytes(range(16)))
    i = good.index(b"IDAT")
    ln = struct.unpack(">I", good[i - 4:i])[0]
    body = bytearray(good)
    for j in range(i + 4, i + 4 + ln):
        body[j] ^= 0xFF
    return bytes(body)


def _short_png():
    """IDAT inflates to fewer bytes than h*(w+1) -> IndexError."""
    good = M.encode_png_gray(4, 4, bytes(range(16)))
    # re-encode with a deflate stream of too-little data
    import zlib
    ihdr_end = good.index(b"IDAT") - 4
    head = good[8:ihdr_end]  # IHDR chunk
    short = zlib.compress(b"\x00\x01\x02", 6)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    return (b"\x89PNG\r\n\x1a\n" + head
            + chunk(b"IDAT", short) + chunk(b"IEND", b""))


def test_decode_errors_raise_expected_classes():
    import zlib
    with pytest.raises(zlib.error):
        M.decode_pixels(_corrupt_png())
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF")  # too short to be a container
    with pytest.raises(struct.error):
        struct.unpack("<HHIIHH", b"\x00\x00")  # the class WAV can raise


def _as_payload_df(spark, payloads):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary")


def test_media_resize_and_features_survive_corruption(spark):
    good = M.encode_png_gray(4, 4, bytes(range(16)))
    payloads = [good, _corrupt_png(), _short_png(), b"BM\x00\x01",
                b"", None]
    df = _as_payload_df(spark, payloads)
    rz = {r.doc_id: r for r in M.media_resize(df, 2, 2).collect()}
    assert len(rz) == len(payloads)
    assert rz[0].format == "png" and rz[0].width == 2
    for i in range(1, len(payloads)):
        assert rz[i].format == "unsupported" and rz[i].px_min is None
    ft = {r.doc_id: r for r in M.media_features(df).collect()}
    assert ft[0].format == "png" and ft[0].n_px == 16
    for i in range(1, len(payloads)):
        assert ft[i].format == "unsupported"


def test_audio_metadata_survives_truncation(spark):
    good = M.synth_wav(3)
    payloads = [good, good[:20], good[:9], b"RIFFxxxxWAVEfmt ", None]
    df = _as_payload_df(spark, payloads)
    out = {r.doc_id: r for r in M.audio_metadata(df).collect()}
    assert len(out) == len(payloads)
    ch, rate, bits, n = M.audio_params(3)
    assert (out[0].channels, out[0].sample_rate, out[0].bits,
            out[0].n_samples) == (ch, rate, bits, n)
    for i in range(1, len(payloads)):
        assert out[i].channels is None


def test_frame_sample_truncated_payload(spark):
    good = M.synth_video(5)
    w, h = M.image_dims(5)
    n = M.video_frames(5)
    # cut mid-way through the last frame: it must be skipped, earlier
    # frames still sampled
    cut = good[:16 + (n - 1) * w * h + 3]
    # header claims huge frame size vs tiny body
    lying = M._FAKV_MAGIC + struct.pack("<III", 4, 1000, 1000) + b"\x01"
    zero = M._FAKV_MAGIC + struct.pack("<III", 4, 0, 0)
    df = _as_payload_df(spark, [good, cut, lying, zero, b"FAKV", None])
    rows = M.frame_sample(df, every=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    full = list(range(0, n, 2))
    assert sorted(by_doc[0]) == full
    assert sorted(by_doc[1]) == [f for f in full if f < n - 1]
    assert 2 not in by_doc and 3 not in by_doc and 4 not in by_doc \
        and 5 not in by_doc
