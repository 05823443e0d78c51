"""Original Type 1 fonts (sources/type1font) and the /FontFile route
through sources/pdffont.

Reference coverage: pdfium's Type 1 rasterization behind io/pdf.py —
the pre-CFF PostScript embedded-font form.
"""

import numpy as np
import pytest

from doctr_ray.sources.pdffont import (
    TrueTypeFont,
    make_glyph_ttf,
    make_truetype_pdf,
    make_type1_pdf,
    rasterize_truetype_pdf,
)
from doctr_ray.sources.type1font import (
    Type1Font,
    _decrypt,
    _encrypt,
    _split_pfb,
    make_glyph_type1,
)


def test_eexec_roundtrip():
    for r in (55665, 4330):
        for payload in (b"", b"x", bytes(range(256)) * 3):
            enc = _encrypt(payload, r, 4)
            assert _decrypt(enc, r, 4) == payload


def test_pfb_segmentation():
    pfb, _ = make_glyph_type1()
    prog = _split_pfb(pfb)
    assert prog.startswith(b"%!PS-AdobeFont")
    assert b"eexec" in prog
    # raw (non-framed) programs pass through untouched
    assert _split_pfb(prog) == prog


def test_glyphs_match_truetype_twin():
    pfb, cmap_t1 = make_glyph_type1()
    ttf_b, cmap_ttf = make_glyph_ttf()
    assert cmap_t1 == cmap_ttf
    f, t = Type1Font(pfb), TrueTypeFont(ttf_b)
    assert f.upem == t.upem
    for code in cmap_t1.values():
        gc = f.glyph_contours(f.cmap[code])
        tc = t.glyph_contours(t.cmap[code])
        assert [[(x, y) for x, y, _ in c] for c in gc] == [
            [(x, y) for x, y, _ in c] for c in tc
        ]
        assert f.glyph_width(f.cmap[code]) == float(t.advances[t.cmap[code]])


def test_curve_and_flex_interpret():
    f = Type1Font(make_glyph_type1()[0])

    def num(v):
        if -107 <= v <= 107:
            return bytes([v + 139])
        if 108 <= v <= 1131:
            v -= 108
            return bytes([(v >> 8) + 247, v & 0xFF])
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])

    # hsbw 2 10; rmoveto 0 0; rrcurveto bulge; closepath; endchar
    cs = (
        num(2) + num(10) + b"\x0d"
        + num(0) + num(0) + b"\x15"
        + num(10) + num(20) + num(10) + num(-20) + num(10) + num(0) + b"\x08"
        + b"\x09\x0e"
    )
    (cont,), width = f._run(cs)
    assert width == 10.0
    assert cont[0][:2] == (2.0, 0.0)  # hsbw side bearing
    assert cont[-1][:2] == (32.0, 0.0)
    # div escape: 20 2 div == 10
    cs = (
        num(0) + num(0) + b"\x0d"
        + num(20) + num(2) + b"\x0c\x0c" + num(0) + b"\x15\x0e"
    )
    (cont2,), _ = f._run(cs)
    assert cont2[0][:2] == (10.0, 0.0)


def test_unknown_forms_raise():
    f = Type1Font(make_glyph_type1()[0])
    with pytest.raises(NotImplementedError, match="seac"):
        f._run(bytes([139, 139, 139, 139, 139]) + b"\x0c\x06")
    with pytest.raises(ValueError, match="eexec"):
        Type1Font(b"%!PS-AdobeFont but no marker")


def test_type1_pdf_bit_identical_to_truetype():
    pages = [["alpha beta gamma", "delta epsilon"], ["zeta eta"]]
    a = rasterize_truetype_pdf(make_truetype_pdf(pages))
    b = rasterize_truetype_pdf(make_type1_pdf(pages))
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_type1_pdf_ocr_exact(tmp_path):
    """/FontFile-embedded PDF -> real media dispatch -> byte-exact OCR."""
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    text = "postscript type one program decrypts and reads back"
    words = text.split()
    lines = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    p = tmp_path / "t1.pdf"
    p.write_bytes(make_type1_pdf([lines]))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == text
    assert conf == 1.0


def test_seac_accent_composition():
    """seac (escape 6): base + accent composed through Standard codes,
    accent shifted by sbx - asb + adx / ady."""
    import numpy as np

    from doctr_ray.sources.type1font import Type1Font, build_type1

    sq = [[(0, 0, True), (40, 0, True), (40, 40, True), (0, 40, True)]]
    dot = [[(10, 50, True), (20, 50, True), (20, 60, True), (10, 60, True)]]
    pfb = build_type1(
        {b".notdef": [], b"A": sq, b"acute": dot, b"comp": sq},
        {65: b"A", 194: b"acute", 99: b"comp"},
        {b"A": 41, b"acute": 41, b"comp": 41},
        upem=64,
    )
    f = Type1Font(pfb)

    def cs_num(v):
        v = int(v)
        if -107 <= v <= 107:
            return bytes([v + 139])
        if 108 <= v <= 1131:
            v -= 108
            return bytes([(v >> 8) + 247, v & 0xFF])
        raise ValueError

    # comp := hsbw 0 41; seac asb=0 adx=15 ady=5 bchar='A' achar=194
    seac_cs = (
        cs_num(0) + cs_num(41) + b"\x0d"
        + cs_num(0) + cs_num(15) + cs_num(5) + cs_num(65) + cs_num(194)
        + b"\x0c\x06"
    )
    f.charstrings[b"comp"] = seac_cs
    gid = f._gid_name.index(b"comp")
    got = f.glyph_contours(gid)
    base = f.glyph_contours(f._gid_name.index(b"A"))
    acc = f.glyph_contours(f._gid_name.index(b"acute"))
    assert got[: len(base)] == base
    shifted = [[(x + 15, y + 5, on) for x, y, on in c] for c in acc]
    assert got[len(base):] == shifted
