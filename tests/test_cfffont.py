"""CFF / Type 2 charstring fonts (sources/cfffont) and the /FontFile3
route through sources/pdffont.

Reference coverage: pdfium's CFF rasterization behind io/pdf.py —
the PostScript-flavoured half of embedded-font PDFs.
"""

import numpy as np
import pytest

from doctr_ray.sources.cfffont import (
    CFFFont,
    _cs_num,
    _dict_real,
    _make_index,
    _parse_dict,
    _read_index,
    build_cff,
    make_glyph_cff,
)
from doctr_ray.sources.pdffont import (
    TrueTypeFont,
    make_glyph_ttf,
    make_truetype_pdf,
    make_type1c_pdf,
    rasterize_truetype_pdf,
)


def test_index_roundtrip():
    items = [b"", b"a", b"hello", bytes(range(256))]
    data = _make_index(items)
    got, end = _read_index(data, 0)
    assert got == items and end == len(data)
    assert _read_index(_make_index([]), 0) == ([], 2)


def test_dict_real_bcd():
    for v in ("0.142857142857", "-12.5", "1000"):
        d = _parse_dict(_dict_real(v) + b"\x00")
        assert d[0] == [float(v)]


def test_cs_num_all_ranges():
    # every encodable integer range round-trips through the interpreter
    f = CFFFont(make_glyph_cff()[0])
    for v in (-32000, -1131, -108, -107, 0, 107, 108, 1131, 5000, 32000):
        code = _cs_num(v) + _cs_num(0) + b"\x15\x0e"  # v 0 rmoveto endchar
        contours, _ = f._run_charstring(code)
        assert contours[0][0][:2] == (float(v), 0.0)


def test_glyphs_match_truetype_twin():
    cff_b, cmap_cff = make_glyph_cff()
    ttf_b, cmap_ttf = make_glyph_ttf()
    assert cmap_cff == cmap_ttf
    f, t = CFFFont(cff_b), TrueTypeFont(ttf_b)
    assert f.upem == t.upem
    for code in cmap_cff.values():
        gc = f.glyph_contours(f.cmap[code])
        tc = t.glyph_contours(t.cmap[code])
        assert [[(x, y) for x, y, _ in c] for c in gc] == [
            [(x, y) for x, y, _ in c] for c in tc
        ]
        assert f.glyph_width(f.cmap[code]) == float(t.advances[t.cmap[code]])


def test_curve_operators_execute():
    """Cubic / subr / hint operators produce sane flattened contours."""
    f = CFFFont(make_glyph_cff()[0])
    # rrcurveto: one cubic from (0,0) bulging to (30,0)
    code = (
        _cs_num(0) + _cs_num(0) + b"\x15"
        + _cs_num(10) + _cs_num(20) + _cs_num(10) + _cs_num(-20)
        + _cs_num(10) + _cs_num(0) + b"\x08\x0e"
    )
    (cont,), _ = f._run_charstring(code)
    assert cont[0][:2] == (0.0, 0.0) and cont[-1][:2] == (30.0, 0.0)
    assert len(cont) == 1 + f.FLATTEN
    # hstem + hintmask with width operand, then hlineto/vlineto chain
    code = (
        _cs_num(99)  # width (odd count before first stem op)
        + _cs_num(0) + _cs_num(10) + b"\x01"  # hstem
        + b"\x13\xff"  # hintmask + 1 data byte
        + _cs_num(2) + _cs_num(3) + b"\x15"  # rmoveto
        + _cs_num(5) + _cs_num(4) + _cs_num(-5) + b"\x06"  # h,v,h lineto
        + b"\x0e"
    )
    (cont,), width = f._run_charstring(code)
    assert width == f.nominal_width + 99
    assert [(x, y) for x, y, _ in cont] == [
        (2.0, 3.0), (7.0, 3.0), (7.0, 7.0), (2.0, 7.0)
    ]


def test_flex1_endpoint_semantics():
    f = CFFFont(make_glyph_cff()[0])
    # |dx| > |dy|: d6 is dx6 and the endpoint returns to the start y
    args = [3, 1, 2, 2, 2, -1, 2, -2, 2, -1]  # dx=11 dominates dy=-1
    code = (
        _cs_num(5) + _cs_num(5) + b"\x15"
        + b"".join(_cs_num(a) for a in args) + _cs_num(4)
        + b"\x0c\x25\x0e"
    )
    (cont,), _ = f._run_charstring(code)
    # second-curve c2 x = 5+3+2+2 + 2+2 = 16, +d6(4) = 20; y back to 5
    assert cont[-1][:2] == (20.0, 5.0)


def test_unsupported_forms_raise():
    f = CFFFont(make_glyph_cff()[0])
    with pytest.raises(NotImplementedError, match="escape"):
        f._run_charstring(b"\x0c\x03\x0e")  # 'and' operator unsupported
    glyphs = [[], [[(0, 0, True), (1, 0, True), (1, 1, True), (0, 1, True)]]]
    data = build_cff(glyphs, {65: 1}, 6, 7)
    assert CFFFont(data).cmap == {65: 1}
    assert CFFFont(data).glyph_width(1) == 6.0


def test_type1c_pdf_bit_identical_to_truetype():
    pages = [["alpha beta gamma", "delta epsilon"], ["zeta eta"]]
    a = rasterize_truetype_pdf(make_truetype_pdf(pages))
    b = rasterize_truetype_pdf(make_type1c_pdf(pages))
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_type1c_pdf_ocr_exact(tmp_path):
    """Type1C-embedded PDF -> real media dispatch -> byte-exact OCR."""
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    text = "postscript compact font format renders and reads back"
    words = text.split()
    lines = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    p = tmp_path / "cff.pdf"
    p.write_bytes(make_type1c_pdf([lines]))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == text
    assert conf == 1.0


def test_cid_keyed_cff_roundtrip():
    """CID-keyed CFF (ROS + FDArray/FDSelect + charset): identity
    charset maps CIDs to gids; contours and per-FD widths match the
    plain-CFF twin glyph for glyph."""
    from doctr_ray.sources.cfffont import make_glyph_cff_cid

    cid_b, cc = make_glyph_cff_cid()
    f = CFFFont(cid_b)
    assert f.cid_keyed and f.upem == 7
    assert f.cid_to_gid == {i: i for i in range(f.num_glyphs)}
    plain = CFFFont(make_glyph_cff()[0])
    for code in cc.values():
        gid = code - 0x20
        a = f.glyph_contours(gid)
        b = plain.glyph_contours(plain.cmap[code])
        assert [[(x, y) for x, y, _ in c] for c in a] == [
            [(x, y) for x, y, _ in c] for c in b
        ]
        assert f.glyph_width(gid) == plain.glyph_width(plain.cmap[code])


def test_cid0_pdf_bit_identical_and_ocr(tmp_path):
    """CIDFontType0C composite PDFs render bit-identical to the
    TrueType twin and OCR byte-exact through the media dispatch."""
    import numpy as np

    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdffont import (
        make_cid0_pdf,
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )

    pages = [["cid keyed compact form", "line two"]]
    a = rasterize_truetype_pdf(make_truetype_pdf(pages))
    b = rasterize_truetype_pdf(make_cid0_pdf(pages))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    text = "cid keyed fonts read back exactly"
    words = text.split()
    lines = [" ".join(words[i : i + 4]) for i in range(0, len(words), 4)]
    p = tmp_path / "cid0.pdf"
    p.write_bytes(make_cid0_pdf([lines]))
    got, _ = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == text


def test_fdselect_format0_and_charset_format0():
    """Alternate FDSelect/charset encodings parse identically."""
    import struct as _s

    from doctr_ray.sources.cfffont import make_glyph_cff_cid

    cid_b, _ = make_glyph_cff_cid()
    f = CFFFont(cid_b)
    n = f.num_glyphs
    # rewrite FDSelect fmt3 -> fmt0 (same routing: all glyphs -> FD 0)
    fmt3 = b"\x03" + _s.pack(">HHB", 1, 0, 0) + _s.pack(">H", n)
    fmt0 = b"\x00" + bytes(n)
    assert fmt3 in cid_b
    # fmt0 is longer; parse it standalone through the private helper
    g = CFFFont(cid_b)
    import numpy as np

    data = cid_b + fmt0  # append and point the parser at it
    g.data = data
    got = g._parse_fdselect(len(cid_b), n)
    assert np.array_equal(got, np.zeros(n, np.int32))
    # charset format 0: explicit per-gid sids
    sids = b"\x00" + b"".join(_s.pack(">H", i) for i in range(1, n))
    g.data = cid_b + sids
    cs = g._parse_charset(len(cid_b), n)
    assert cs == {i: i for i in range(n)}


def test_standard_encoding_default():
    """A CFF WITHOUT an Encoding op uses the predefined Standard
    encoding (spec default): codes 32..126 -> SIDs 1..95 -> charset
    gid. Same glyphs must resolve as the explicit format-0 twin."""
    from doctr_ray.sources.cfffont import CFFFont, build_cff

    sq = [[(0, 0, True), (40, 0, True), (40, 40, True), (0, 40, True)]]
    tri = [[(0, 0, True), (40, 0, True), (20, 40, True)]]
    glyphs = [[], sq, tri]
    enc = {65: 1, 90: 2}  # 'A' -> square, 'Z' -> triangle
    explicit = CFFFont(build_cff(glyphs, enc, 41, 48))
    standard = CFFFont(build_cff(glyphs, enc, 41, 48, standard_encoding=True))
    assert standard.cmap[65] == explicit.cmap[65] == 1
    assert standard.cmap[90] == explicit.cmap[90] == 2
    for gid in (1, 2):
        assert standard.glyph_contours(gid) == explicit.glyph_contours(gid)
    # codes outside 32..126 are rejected by the builder
    import pytest as _pytest

    with _pytest.raises(ValueError, match="32..126"):
        build_cff(glyphs, {20: 1, 90: 2}, 41, 48, standard_encoding=True)


def test_seac_accent_composition():
    """endchar with 4 args (adx ady bchar achar) composes base +
    shifted accent through Standard-encoding codes and the charset."""
    from doctr_ray.sources.cfffont import CFFFont, _cs_num, build_cff

    sq = [[(0, 0, True), (40, 0, True), (40, 40, True), (0, 40, True)]]
    dot = [[(0, 60, True), (10, 60, True), (10, 70, True), (0, 70, True)]]
    glyphs = [[], sq, dot, sq]  # gid3 gets replaced by a seac charstring
    f = CFFFont(
        build_cff(glyphs, {65: 1, 90: 2, 97: 3}, 41, 96,
                  standard_encoding=True)
    )
    # gid 3 := seac(adx=15, ady=5, bchar='A', achar='Z')
    f.charstrings[3] = (
        _cs_num(15) + _cs_num(5) + _cs_num(65) + _cs_num(90) + b"\x0e"
    )
    got = f.glyph_contours(3)
    base = f.glyph_contours(1)
    acc = f.glyph_contours(2)
    assert got[: len(base)] == base
    shifted = [[(x + 15, y + 5, on) for x, y, on in c] for c in acc]
    assert got[len(base):] == shifted


def test_format1_encoding_and_supplements():
    """Format-1 (range) encodings and supplement overrides parse back
    to the exact code -> gid map the builder wrote."""
    from doctr_ray.glyphs import FONT, GLYPH_H, GLYPH_W
    from doctr_ray.sources.cfffont import CFFFont, build_cff
    from doctr_ray.sources.pdffont import _bitmap_contours

    chars = list("abcdefg")
    codes = [0x21, 0x22, 0x23, 0x40, 0x41, 0x60, 0x61]  # three runs
    glyphs = [[]]
    encoding = {}
    for i, (ch, c) in enumerate(zip(chars, codes)):
        glyphs.append(_bitmap_contours(FONT[ch]))
        encoding[c] = i + 1
    blob = build_cff(
        glyphs, encoding, default_width=GLYPH_W + 1, upem=GLYPH_H,
        format1_encoding=True,
    )
    assert CFFFont(blob).cmap == encoding
    # supplement: extra code mapped through the charset (SID == gid)
    blob = build_cff(
        glyphs, encoding, default_width=GLYPH_W + 1, upem=GLYPH_H,
        format1_encoding=True, supplement=(0x7E, 3),
    )
    assert CFFFont(blob).cmap == {**encoding, 0x7E: 3}
    # glyph outlines identical across encoding forms
    f0 = CFFFont(build_cff(glyphs, encoding, GLYPH_W + 1, GLYPH_H))
    f1 = CFFFont(blob)
    for gid in range(1, len(glyphs)):
        assert f0.glyph_contours(gid) == f1.glyph_contours(gid)
