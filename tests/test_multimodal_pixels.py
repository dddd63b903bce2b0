"""Pixel-path multimodal kernels (no Spark): the real PNG-gray8
codec (all five unfilters), BMP24 luma decode, nearest-neighbor
resize, and the FAKV frame container — each checked against a-priori
math, never against itself."""

import struct

import pytest

from supacrawler_spark import multimodal as M


def _gradient(doc_id):
    w, h = M.image_dims(doc_id)
    pix = bytes((doc_id + 3 * x + 5 * y) % 251
                for y in range(h) for x in range(w))
    return w, h, pix


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 55, 123, 499])
def test_png_roundtrip_and_resize_formula(doc_id):
    w, h, pix = _gradient(doc_id)
    png = M.encode_png_gray(w, h, pix, filters=[0, 1, 2])
    assert M.decode_png_gray(png) == (w, h, pix)
    # header parser agrees
    assert M.decode_image(png) == {"format": "png", "width": w,
                                   "height": h}
    # nearest-neighbor mapping == the oracle's floor formula
    small = M.resize_nn(pix, w, h, 8, 8)
    want = bytes((doc_id + 3 * ((x * w) // 8) + 5 * ((y * h) // 8)) % 251
                 for y in range(8) for x in range(8))
    assert small == want


def test_png_all_filter_types_unfilter():
    # encoder emits 0/1/2; build 3 (Average) and 4 (Paeth) rows by
    # hand to pin the remaining unfilter branches
    import zlib

    w, h = 4, 3
    pix = bytes([10, 20, 30, 40, 15, 25, 35, 45, 100, 90, 80, 70])

    def filt_avg(row, prev):
        out = bytearray()
        for x in range(w):
            a = row[x - 1] if x else 0
            out.append((row[x] - ((a + prev[x]) >> 1)) & 0xFF)
        return bytes(out)

    def filt_paeth(row, prev):
        out = bytearray()
        for x in range(w):
            a = row[x - 1] if x else 0
            c = prev[x - 1] if x else 0
            out.append((row[x] - M._paeth(a, prev[x], c)) & 0xFF)
        return bytes(out)

    rows = [pix[0:4], pix[4:8], pix[8:12]]
    raw = (b"\x00" + rows[0]
           + b"\x03" + filt_avg(rows[1], rows[0])
           + b"\x04" + filt_paeth(rows[2], rows[1]))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png = (M._PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert M.decode_png_gray(png) == (w, h, pix)


def test_bmp_luma_decode():
    from supacrawler_spark.screenshots import render_screenshot

    b = render_screenshot("https://hot.example.org/blog/p0")
    w, h, pix = M.decode_bmp_gray(b)
    assert (w, h, len(pix)) == (8, 8, 64)
    # independent luma of the top-left pixel (bottom-up row h-1)
    off = struct.unpack("<I", b[10:14])[0]
    stride = (w * 3 + 3) & ~3
    bb, gg, rr = b[off + (h - 1) * stride:off + (h - 1) * stride + 3]
    assert pix[0] == (rr * 299 + gg * 587 + bb * 114) // 1000


def test_decode_pixels_codec_seam():
    # JPEG/GIF pixel decode is the documented library seam
    jpeg = M.synth_image(2)[0]
    assert M.synth_image(2)[1] == "jpeg"
    with pytest.raises(NotImplementedError):
        M.decode_pixels(jpeg)
    with pytest.raises(ValueError):
        M.decode_pixels(b"not an image at all")


@pytest.mark.parametrize("doc_id", [0, 5, 13, 250])
def test_fakv_container_bytes(doc_id):
    v = M.synth_video(doc_id)
    n, w, h = struct.unpack_from("<III", v, 4)
    assert n == M.video_frames(doc_id)
    assert len(v) == 16 + n * w * h
    for f in range(n):
        off = 16 + f * w * h
        assert v[off] == (doc_id + f) % 251
        assert v[off + w * h - 1] == (doc_id + f + w * h - 1) % 251


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 7, 123])
def test_wav_roundtrip_against_fixture_rule(doc_id):
    ch, rate, bits, n = M.audio_params(doc_id)
    got = M.decode_wav(M.synth_wav(doc_id))
    assert got == {"channels": ch, "sample_rate": rate, "bits": bits,
                   "n_samples": n,
                   "duration_ms": n * 1000 // rate}


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        M.decode_wav(b"OggS not a wav")
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF\x04\x00\x00\x00AVI ")  # RIFF but not WAVE


def test_wav_odd_chunk_alignment():
    # a 3-byte junk chunk before fmt must be skipped with word padding
    import struct

    base = M.synth_wav(5)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # padded to 4
    patched = base[:12] + junk + base[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert M.decode_wav(patched) == M.decode_wav(base)


@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (16, 16), (63, 63),
                                  (80, 70)])
def test_gif_lzw_roundtrip(dims):
    """encode_gif_gray -> decode_gif_gray recovers every pixel exactly.
    63x63 and 80x70 push the LZW code width through 9->10->11->12 bits
    and (80x70=5600 px) across the 12-bit table clear, so the decoder's
    width-growth and clear-reset rules are genuinely exercised."""
    w, h = dims
    pix = bytes((7 + 3 * x + 5 * y) % 251 for y in range(h)
                for x in range(w))
    gw, gh, got = M.decode_gif_gray(M.encode_gif_gray(w, h, pix))
    assert (gw, gh) == (w, h)
    assert got == pix


def test_gif_synth_image_decodes_solid():
    payload, fmt = M.synth_image(1)   # doc 1 -> gif
    assert fmt == "gif"
    w, h = M.image_dims(1)
    d = M.decode_pixels(payload)
    assert (d["format"], d["width"], d["height"]) == ("gif", w, h)
    assert set(d["pix"]) == {1 % 251}


def test_gif_truncated_and_interlaced_raise():
    full = M.encode_gif_gray(8, 8, bytes(range(64)))
    with pytest.raises((ValueError, IndexError)):
        M.decode_gif_gray(full[:30])          # cut inside the GCT
    with pytest.raises((ValueError, IndexError)):
        M.decode_gif_gray(full[:-10])         # cut inside the LZW data
    # flip the interlace bit in the image descriptor (fixed offset:
    # 13-byte header/screen + 768-byte GCT; 0x2c also occurs as a
    # palette byte, so searching for it would hit the GCT)
    idx = 13 + 768
    assert full[idx] == 0x2C
    corrupted = bytearray(full)
    corrupted[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        M.decode_gif_gray(bytes(corrupted))


def test_gif_deferred_clear_stream_decodes():
    """A conforming stream that FILLS the 12-bit table and keeps
    emitting without a clear (deferred clear) must still decode: build
    it by patching our encoder's clear threshold past the cap."""
    pix = bytes((11 * i) % 251 for i in range(6000))
    # literal codes only, but never emit the mid-stream clear
    clear, end = 256, 257
    out = bytearray()
    acc = bits = 0
    width = 9

    def emit(code, w):
        nonlocal acc, bits
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear, width)
    next_code = end + 1
    grew = False
    for b in pix:
        emit(b, width)
        if not grew:
            grew = True
        elif next_code <= 0xFFF:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    assert M._lzw_decode(8, bytes(out)) == pix
