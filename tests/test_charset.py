"""Charset-sniffing ladder: BOM rungs, meta declarations in every
quoting style, codec aliases, the utf-8 default, and proof that the
driver fixture actually discriminates (wrong pick => corrupted text)."""

import pytest

from supacrawler_spark.sources.charset import sniff_charset


def test_bom_rungs():
    assert sniff_charset(b"\xef\xbb\xbfhi") == ("utf-8", "bom", "hi")
    cs, via, txt = sniff_charset(b"\xff\xfe" + "hé".encode("utf-16-le"))
    assert (cs, via, txt) == ("utf-16-le", "bom", "hé")
    cs, via, txt = sniff_charset(b"\xfe\xff" + "hé".encode("utf-16-be"))
    assert (cs, via, txt) == ("utf-16-be", "bom", "hé")


@pytest.mark.parametrize("decl", [
    '<meta charset="iso-8859-1">',
    "<meta charset='iso-8859-1'>",
    "<meta charset=iso-8859-1>",
    '<META CHARSET="ISO-8859-1">',
    '<meta http-equiv="Content-Type" content="text/html; '
    'charset=iso-8859-1">',
])
def test_meta_rung_quoting_styles(decl):
    raw = (decl + " café").encode("latin-1")
    cs, via, txt = sniff_charset(raw)
    assert via == "meta" and cs == "iso-8859-1"
    assert txt == decl + " café"


def test_meta_codec_aliases():
    for label, plant in (("windows-1252", "cp1252"),
                         ("latin-1", "latin-1")):
        raw = (f'<meta charset="{label}"> café').encode(plant)
        cs, via, txt = sniff_charset(raw)
        assert (cs, via) == (label, "meta") and txt.endswith("café")


def test_default_rung():
    cs, via, txt = sniff_charset("naïve".encode("utf-8"))
    assert (cs, via, txt) == ("utf-8", "default", "naïve")


def test_fixture_discriminates():
    # the latin-1 branch's 0xE9 byte is NOT valid utf-8: a ladder
    # that skipped the meta rung could not round-trip this payload
    raw = ('<meta charset="iso-8859-1"> café').encode("latin-1")
    with pytest.raises(UnicodeDecodeError):
        raw.decode("utf-8")
    # and the utf-16 branch is unreadable without the BOM rung
    raw16 = b"\xff\xfe" + "abc".encode("utf-16-le")
    assert raw16[2:].decode("utf-8") != "abc"


def test_meta_beyond_1024_bytes_is_ignored():
    pad = b"x" * 1024
    raw = pad + b'<meta charset="iso-8859-1">'
    cs, via, _ = sniff_charset(raw)
    assert (cs, via) == ("utf-8", "default")


def test_invalid_bytes_never_raise():
    # arbitrary web garbage on every rung: replace, don't kill the task
    cases = [
        b"\xef\xbb\xbf\xff\xfe garbage after utf-8 bom \xc3",   # bad utf-8
        b"\xff\xfeodd",                                          # odd utf-16
        b'<meta charset="utf-8"> caf\xe9 latin-1 byte',          # meta lies
        b'<meta charset="made-up-label"> \xe9\xe9',              # unknown label
        b"\x80\x81\x82 raw high bytes, no bom, no meta",         # default rung
    ]
    for raw in cases:
        cs, via, txt = sniff_charset(raw)
        assert isinstance(txt, str) and via in ("bom", "meta", "default")
    # valid sequences stay byte-exact under errors='replace'
    assert sniff_charset("naïve".encode("utf-8"))[2] == "naïve"
