"""Font-rendered PDFs: TrueType parse/rasterize round-trips (the
writer<->parser pair), quadratic-Bézier and composite-glyph coverage,
the subset-font text-layer guard, and byte-exact OCR through the real
media dispatch."""

import numpy as np
import pytest

from doctr_ray.glyphs import CHAR_H, FONT, VOCAB, render_word
from doctr_ray.media import MARGIN
from doctr_ray.sources.pdffont import (
    TrueTypeFont,
    _bitmap_contours,
    build_ttf,
    fill_glyph,
    make_glyph_ttf,
    make_truetype_pdf,
    rasterize_truetype_pdf,
)


def test_ttf_roundtrip_outlines_and_metrics():
    ttf, char_code = make_glyph_ttf()
    f = TrueTypeFont(ttf)
    assert f.upem == 7
    assert f.num_glyphs == len(VOCAB) + 1
    # every char maps through the (scrambled) cmap to a glyph whose
    # rectangle outlines cover exactly its bitmap's ink runs
    for ch in "a9?.":
        gid = f.cmap[char_code[ch]]
        want = sorted(
            tuple(p[:2] for p in c) for c in _bitmap_contours(FONT[ch])
        )
        got = sorted(
            tuple((int(x), int(y)) for x, y, _ in c)
            for c in f.glyph_contours(gid)
        )
        assert got == want, ch
    # fixed pitch: 6 units per glyph
    assert all(int(a) == 6 for a in f.advances[1:])


def test_glyph_fill_pixel_exact_at_scale_2():
    ttf, char_code = make_glyph_ttf()
    f = TrueTypeFont(ttf)
    for ch in VOCAB:
        page = np.full((20, 16), 255, np.uint8)
        gid = f.cmap[char_code[ch]]
        fill_glyph(page, f.glyph_contours(gid), 2.0, 2, 3)  # pen (2,3)
        ink = (page == 0).astype(np.uint8)
        want = np.zeros_like(ink)
        # glyph spans rows [20-3-14, 20-3) = [3, 17), cols [2, 12)
        want[3:17, 2:12] = np.kron(FONT[ch], np.ones((2, 2), np.uint8))
        assert np.array_equal(ink, want), ch


def test_quadratic_bezier_fill():
    # one closed curve: on(0,0) off(50,100) on(100,0) + baseline — the
    # filled region is under the parabola y = 2t(1-t)*100
    contours = [[(0, 0, True), (50, 100, False), (100, 0, True)]]
    page = np.full((110, 110), 255, np.uint8)
    fill_glyph(page, contours, 1.0, 0, 5)
    ink = page == 0
    # apex: the curve peaks at y=50, x=50 -> pixels just under it filled
    assert ink[110 - 5 - 48, 50]
    assert not ink[110 - 5 - 60, 50]  # above the curve: empty
    # near the base corners the curve is low
    assert ink[110 - 5 - 2, 50]
    assert not ink[110 - 5 - 30, 2]  # high above the left foot
    # symmetry about x=50: pixel center c+0.5 mirrors to column 99-c
    assert np.array_equal(ink[:, 1:50], ink[:, 98:49:-1])


def test_composite_glyph_offsets():
    # glyph 1 = unit square; glyph 2 = composite: two copies offset in x
    import struct

    square = [[(0, 0, True), (4, 0, True), (4, 4, True), (0, 4, True)]]
    comp = (
        struct.pack(">hhhhh", -1, 0, 0, 12, 4)
        + struct.pack(">HHhh", 0x0023, 0, 0, 0)   # words+xy+more -> gid 0
        + struct.pack(">HHhh", 0x0003, 0, 8, 0)   # words+xy, last -> gid 0
    )
    ttf = build_ttf([square], {65: 0}, [5], upem=8)
    f = TrueTypeFont(ttf)
    assert f.glyph_contours(0)
    # splice the composite in as glyph 1 (parse path under test)
    f.glyf = f.glyf + comp
    f.loca = np.array([0, len(f.glyf) - len(comp), len(f.glyf)], np.int64)
    cont = f.glyph_contours(1)
    assert len(cont) == 2
    xs = sorted(c[0][0] for c in cont)
    assert xs == [0.0, 8.0]


def test_subset_font_text_layer_refused():
    from doctr_ray.sources.pdftext import extract_pdf_text

    pdf = make_truetype_pdf([["secret words"]])
    assert extract_pdf_text(pdf) == []  # private codes: no text layer


def test_truetype_pdf_pixELS_match_renderer():
    pdf = make_truetype_pdf([["hello world"]])
    img = rasterize_truetype_pdf(pdf)[0]
    ref = render_word("hello")
    blk = img[MARGIN : MARGIN + CHAR_H, MARGIN : MARGIN + ref.shape[1]]
    assert np.array_equal((blk == 0).astype(np.uint8), ref)


def test_truetype_pdf_ocr_exact_multiline_multipage(tmp_path):
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    lines = [f"word{i:03d} item{i:03d} thing{i:03d}" for i in range(50)]
    pages = [lines[:30], lines[30:]]
    p = tmp_path / "font.pdf"
    p.write_bytes(make_truetype_pdf(pages))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == " ".join(lines)
    assert conf > 0.9


def test_truetype_query_oracle_sf(ray_session):
    """The oracled query at sf0.001: byte-exact reconstruction."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = (
        e.queries()["ocr_truetype_pdf"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(e.oracle_sql()["ocr_truetype_pdf"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["full_text"].tolist() == want["full_text"].tolist()


def test_cid_identity_h_bit_identical_and_widths():
    """Composite /Type0 /Identity-H over CIDFontType2: 2-byte gid codes
    render bit-identical to the simple-font twin; /DW//W widths drive
    the pen through the CID width model."""
    import numpy as np

    from doctr_ray.sources.pdffont import (
        PdfFont,
        make_cid_pdf,
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )
    from doctr_ray.sources.pdfimage import _scan_objects

    pages = [["composite identity words", "second line"], ["page two"]]
    a = rasterize_truetype_pdf(make_truetype_pdf(pages))
    b = rasterize_truetype_pdf(make_cid_pdf(pages))
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    # the parsed font exposes the composite contract
    data = make_cid_pdf(pages)
    objs = _scan_objects(data)
    fnum = next(
        n for n, (h, _) in objs.items() if b"/Type0" in h and b"/Font" in h
    )
    f = PdfFont(objs, fnum)
    assert f.two_byte
    assert f.codes_of(b"\x00\x05\x00\x09") == [5, 9]
    assert f.code_to_gid(5) == 5
    # /W range: every mapped gid advances exactly CHAR_PITCH px at CHAR_H
    from doctr_ray.glyphs import CHAR_H, CHAR_PITCH

    assert f.advance_px(1, CHAR_H) == CHAR_PITCH


def test_cid_unsupported_variants_raise():
    import pytest

    from doctr_ray.sources.pdffont import PdfFont, make_cid_pdf
    from doctr_ray.sources.pdfimage import _scan_objects

    data = make_cid_pdf([["x"]])
    for patch, msg in (
        ((b"/Identity-H", b"/UniJIS-UCS2-H"), "non-Identity"),
        ((b"/CIDFontType2", b"/CIDFontType9"), "unknown CID descendant"),
        ((b"/CIDToGIDMap /Identity", b"/CIDToGIDMap /Other"), "CIDToGIDMap"),
    ):
        objs = _scan_objects(data.replace(*patch))
        fnum = next(
            n for n, (h, _) in objs.items() if b"/Type0" in h and b"/Font" in h
        )
        with pytest.raises(NotImplementedError, match=msg):
            PdfFont(objs, fnum)


def test_cid_w_array_forms():
    """Both /W forms parse: c [w...] runs and c1 c2 w ranges."""
    from doctr_ray.sources.pdffont import PdfFont

    f = PdfFont.__new__(PdfFont)
    f.cid_w = {}
    f._parse_cid_w(b"1 [600 700 800] 10 12 500")
    assert f.cid_w == {1: 600.0, 2: 700.0, 3: 800.0, 10: 500.0,
                       11: 500.0, 12: 500.0}


def test_rotated_text_matrix_quarter_turn_exact():
    """Tm with a 90-degree rotation renders the page as the exact
    rot90 of the unrotated twin; sheared matrices still raise."""
    import re

    import numpy as np
    import pytest

    from doctr_ray.sources.pdffont import (
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )

    pages = [["rotated text here", "second line"]]
    base_pdf = make_truetype_pdf(pages)
    base = rasterize_truetype_pdf(base_pdf)[0]
    H, W = base.shape
    data = base_pdf.replace(
        b"/MediaBox [0 0 %d %d]" % (W, H), b"/MediaBox [0 0 %d %d]" % (H, W)
    )
    data = re.sub(
        rb"1 0 0 1 (\d+) (\d+) Tm",
        lambda m: b"0 -1 1 0 %d %d Tm"
        % (int(m.group(2)), W - int(m.group(1))),
        data,
    )
    # fix the content streams' /Length after the rewrite
    out, pos = bytearray(), 0
    for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", data):
        start = m.end()
        end = data.find(b"\nendstream", start)
        out += data[pos : m.start()]
        out += b"<< /Length " + str(end - start).encode() + b" >>\nstream\n"
        out += data[start:end] + b"\nendstream"
        pos = end + len(b"\nendstream")
    out += data[pos:]
    got = rasterize_truetype_pdf(bytes(out))
    assert len(got) == 1
    assert np.array_equal(got[0], np.rot90(base, 3))
    # shear still raises with a named gap
    sheared = bytes(out).replace(b"0 -1 1 0", b"1 1 0 1", 1)
    with pytest.raises(NotImplementedError, match="shear"):
        rasterize_truetype_pdf(_fix_lengths(sheared))


def _fix_lengths(data):
    import re

    out, pos = bytearray(), 0
    for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", data):
        start = m.end()
        end = data.find(b"\nendstream", start)
        out += data[pos : m.start()]
        out += b"<< /Length " + str(end - start).encode() + b" >>\nstream\n"
        out += data[start:end] + b"\nendstream"
        pos = end + len(b"\nendstream")
    out += data[pos:]
    return bytes(out)


def test_rotate90_writer_and_ocr(tmp_path):
    """make_truetype_pdf(rotate=90) pages are the exact rot90 of the
    unrotated twin, and orientation detection recovers exact text."""
    import numpy as np

    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdffont import (
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )

    pages = [["quarter turn page", "line two"], ["page two words"]]
    base = rasterize_truetype_pdf(make_truetype_pdf(pages))
    rot = rasterize_truetype_pdf(make_truetype_pdf(pages, rotate=90))
    for b, r in zip(base, rot):
        assert np.array_equal(r, np.rot90(b, 3))
    text = "rotated page text reads back exactly after deskew"
    words = text.split()
    lines = [" ".join(words[i : i + 5]) for i in range(0, len(words), 5)]
    p = tmp_path / "rot.pdf"
    p.write_bytes(make_truetype_pdf([lines], rotate=90))
    got, _ = media_to_ocr_span(
        "d", f"file://{p}", 0, GlyphRecognizer(), detect_orientation=True
    )
    assert got == text


def test_rect_fill_operators_pixel_exact():
    """re/f path operators: filled rects land on the exact pixel set
    (pixel-center coverage), composing with text in one stream."""
    import re

    import numpy as np

    from doctr_ray.sources.pdffont import (
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )

    pdf = make_truetype_pdf([["rect and text"]])
    data = pdf.replace(b"BT /F1", b"10 10 30 5 re f\nBT /F1", 1)
    page = rasterize_truetype_pdf(_fix_lengths(data))[0]
    H = page.shape[0]
    assert (page[H - 15 : H - 10, 10:40] == 0).all()
    assert (page[H - 16, 10:40] == 255).all()
    assert (page[H - 9, 10:40] == 255).all()
    assert (page[H - 15 : H - 10, 9] == 255).all()
    assert (page[H - 15 : H - 10, 40] == 255).all()


def test_table_pdf_exact_grid():
    """A ruled table drawn with re/f rects + embedded-font cells is
    recovered as the exact logical grid by the lattice extractor."""
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdffont import make_table_pdf, rasterize_truetype_pdf
    from doctr_ray.tables import extract_tables

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    pages = rasterize_truetype_pdf(make_table_pdf([(words, 2, 3)]))
    assert len(pages) == 1
    tables, _ = extract_tables(pages[0], GlyphRecognizer())
    assert len(tables) == 1
    assert tables[0].to_grid() == [
        ["alpha", "beta", "gamma"],
        ["delta", "eps", "zeta"],
    ]


# ----------------------------------------------------------- Type 3 fonts


def test_type3_pages_bit_identical_to_truetype_twin():
    """The Type 3 CharProcs (d0 + re/f rect runs in the /FontMatrix
    glyph space) must paint the exact pixels the TrueType outline
    twin paints."""
    import numpy as np

    from doctr_ray.sources.pdffont import (
        make_truetype_pdf,
        make_type3_pdf,
        rasterize_truetype_pdf,
    )

    pages = [["hello world", "type three glyphs"], ["second page"]]
    got = rasterize_truetype_pdf(make_type3_pdf(pages))
    want = rasterize_truetype_pdf(make_truetype_pdf(pages))
    assert len(got) == len(want) == 2
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_type3_text_layer_refused_without_tounicode():
    """/CharProcs + scrambled /Differences and no /ToUnicode: the text
    layer is garbage by construction and must be refused (the standard
    extractor heuristic) so the media route rasterizes instead."""
    from doctr_ray.sources.pdffont import make_type3_pdf
    from doctr_ray.sources.pdftext import extract_pdf_text

    assert extract_pdf_text(make_type3_pdf([["secret words"]])) == []


def test_type3_rotated_tm_raises():
    import re as _re

    import pytest as _pytest

    from doctr_ray.sources.pdffont import make_type3_pdf, rasterize_truetype_pdf

    data = make_type3_pdf([["spin me"]])
    # splice a rotated Tm in front of the first Tj
    rot = data.replace(b"1 0 0 1 ", b"0 -1 1 0 ", 1)
    if rot != data:
        with _pytest.raises(NotImplementedError, match="Type3"):
            rasterize_truetype_pdf(rot)


def test_type3_path_operator_charproc_raises():
    """A Type3 glyph drawn with path operators (curves) instead of
    re/f rect fills must raise rather than render silently blank."""
    import pytest as _pytest

    from doctr_ray.sources.pdffont import make_type3_pdf, rasterize_truetype_pdf

    data = make_type3_pdf([["x"]])
    # turn every rect op into a curve op (same byte length: xref holds)
    bad = data.replace(b" re\n", b" c \n")
    assert bad != data
    with _pytest.raises(NotImplementedError, match="charproc"):
        rasterize_truetype_pdf(bad)


def test_cmap_formats_0_6_12_parse_identically():
    """The same glyph mapping through cmap formats 0/6/12 must parse
    to the same code->gid table as format 4."""
    import numpy as np

    from doctr_ray.sources.pdffont import TrueTypeFont, build_ttf

    sq = [[(0, 0, True), (60, 0, True), (60, 60, True), (0, 60, True)]]
    tri = [[(0, 0, True), (60, 0, True), (30, 60, True)]]
    glyphs = [[], sq, tri]
    cmap = {65: 1, 66: 2, 67: 1, 100: 2}
    ref = TrueTypeFont(build_ttf(glyphs, cmap, [60, 60, 60], 64)).cmap
    assert ref == cmap
    for fmt in (0, 6, 12):
        got = TrueTypeFont(
            build_ttf(glyphs, cmap, [60, 60, 60], 64, cmap_format=fmt)
        ).cmap
        assert got == cmap, fmt


def test_stream_cid_to_gid_map():
    """A stream /CIDToGIDMap (identity written out as 2-byte GIDs)
    must rasterize identically to /CIDToGIDMap /Identity."""
    import numpy as np

    from doctr_ray.sources.pdffont import make_cid_pdf, rasterize_truetype_pdf

    base = make_cid_pdf([["STREAM MAP"]])
    ngids = 4096
    table = b"".join(g.to_bytes(2, "big") for g in range(ngids))
    obj = (
        b"9 0 obj\n<< /Length " + str(len(table)).encode()
        + b" >>\nstream\n" + table + b"\nendstream\nendobj\n"
    )
    patched = base.replace(b"/CIDToGIDMap /Identity", b"/CIDToGIDMap 9 0 R")
    patched = patched.replace(b"trailer", obj + b"trailer", 1)
    a = rasterize_truetype_pdf(base)
    b = rasterize_truetype_pdf(patched)
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0], b[0])


def test_composite_glyph_2x2_transform():
    """A composite glyph with WE_HAVE_A_TWO_BY_TWO (90-degree rotation
    written as F2Dot14) resolves to the rotated child contours."""
    import struct

    import numpy as np

    from doctr_ray.sources.pdffont import TrueTypeFont

    def f2(v):  # float -> F2Dot14
        return struct.pack(">h", int(round(v * 16384)))

    # simple child glyph: right triangle (0,0) (100,0) (0,50)
    tri = [(0, 0), (100, 0), (0, 50)]
    child = struct.pack(">hhhhh", 1, 0, 0, 100, 50)
    child += struct.pack(">H", 2)  # end pt of contour 0
    child += struct.pack(">H", 0)  # no instructions
    child += bytes([0x01, 0x01, 0x01])  # flags: on-curve, int16 coords
    prevx = 0
    xs = b"".join(struct.pack(">h", x - px) for (x, _), (px, _) in
                  zip(tri, [(0, 0)] + tri[:-1]))
    ys = b"".join(struct.pack(">h", y - py) for (_, y), (_, py) in
                  zip(tri, [(0, 0)] + tri[:-1]))
    # flags say words: bit0 on-curve only; x/y are int16 when NOT
    # short: repeat flag bytes without short bits -> full words
    child = struct.pack(">hhhhh", 1, 0, 0, 100, 50)
    child += struct.pack(">H", 2) + struct.pack(">H", 0)
    child += bytes([0x01] * 3) + xs + ys
    if len(child) % 4:
        child += b"\x00" * (4 - len(child) % 4)
    # composite: rotate 90deg CCW: (x,y) -> (-y, x); a=0 b=1 c=-1 d=0
    comp = struct.pack(">hhhhh", -1, -50, 0, 0, 100)
    comp += struct.pack(">HH", 0x0001 | 0x0002 | 0x0080, 1)  # words+xy+2x2
    comp += struct.pack(">hh", 0, 0)  # dx dy
    comp += f2(0) + f2(1) + f2(-1) + f2(0)
    if len(comp) % 4:
        comp += b"\x00" * (4 - len(comp) % 4)

    f = TrueTypeFont.__new__(TrueTypeFont)
    f.glyf = b"\x00" * 0 + child + comp
    f.loca = np.array([0, 0, len(child), len(child) + len(comp)])
    f._contour_cache = {}
    got = f.glyph_contours(2)
    assert len(got) == 1
    pts = [(round(x), round(y)) for x, y, _ in got[0]]
    assert pts == [(0, 0), (0, 100), (-50, 0)]
