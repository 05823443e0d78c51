"""Pure-stdlib PDF native-text extraction: round-trips through the
minimal writer, operator coverage, and the file:// media path."""

import zlib

import pytest

from doctr_ray.sources.pdftext import (
    extract_pdf_text,
    make_simple_pdf,
    pdf_escape,
)


def test_roundtrip_compressed_and_plain():
    pages = [["Hello world", "second line"], ["page two here"]]
    for compress in (True, False):
        data = make_simple_pdf(pages, compress=compress)
        assert data.startswith(b"%PDF-")
        got = extract_pdf_text(data)
        assert got == ["Hello world", "second line", "page two here"]


def test_escapes_roundtrip():
    tricky = ["paren (hi) and \\ backslash", "tabs\tstay"]
    got = extract_pdf_text(make_simple_pdf([tricky]))
    assert got == tricky


def test_tj_array_and_hex_strings():
    # hand-built content stream exercising TJ arrays, hex strings, and '
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -20 (lo) 30 ( wor) (ld)] TJ "
        b"T* (next line) Tj "
        b"(apostrophe line) ' "
        b"ET"
    )
    z = zlib.compress(content)
    body = (
        b"<< /Length " + str(len(z)).encode() + b" /Filter /FlateDecode >>"
        b"\nstream\n" + z + b"\nendstream"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
        b"trailer\n<< >>\n%%EOF\n"
    )
    got = extract_pdf_text(pdf)
    assert got == ["Hello world", "next line", "apostrophe line"]


def test_octal_escape():
    content = b"BT (A\\101B) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["AAB"]


def test_rejects_non_pdf_and_names_deps():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"plain bytes")
    enc = b"%PDF-1.4\n1 0 obj\n<< /Encrypt 2 0 R >>\nendobj\n%%EOF"
    with pytest.raises(NotImplementedError, match="Encrypt"):
        extract_pdf_text(enc)  # truncated encryption dict still refuses
    crypt = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /Crypt >>\n"
        b"stream\nABCD\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(NotImplementedError, match="/Crypt"):
        extract_pdf_text(crypt)


def test_lzw_content_stream_decodes():
    from doctr_ray.sources.pdffilters import lzw_encode

    content = b"BT (lzw text) Tj ET"
    z = lzw_encode(content)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(z)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + z
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["lzw text"]


def test_ascii85_flate_chain_content_stream():
    import zlib

    from doctr_ray.sources.pdffilters import ascii85_encode

    content = b"BT (chained) Tj ET"
    payload = ascii85_encode(zlib.compress(content))
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(payload)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n" + payload
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["chained"]


def test_image_streams_skipped():
    img = b"\x00" * 16
    body = (
        b"<< /Subtype /Image /Length 16 >>\nstream\n" + img + b"\nendstream"
    )
    txt = b"BT (kept text) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n" + body + b"\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(txt)).encode() + b" >>\nstream\n" + txt + b"\nendstream\nendobj\n"
        b"%%EOF"
    )
    assert extract_pdf_text(pdf) == ["kept text"]


def test_pdf_escape():
    assert pdf_escape("a(b)c\\d") == b"a\\(b\\)c\\\\d"


def test_file_pdf_media_in_fused_pipeline(tmp_path):
    """A file://doc.pdf media span resolves through the NATIVE text
    layer in the fused worker — no rasterization, no OCR — exactly like
    the HTML branch: text-bearing media short-circuit to their text."""
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    p = tmp_path / "native.pdf"
    p.write_bytes(make_simple_pdf([["alpha beta", "gamma"], ["delta"]]))
    text, conf = media_to_ocr_span("d0", f"file://{p}", 0, GlyphRecognizer())
    assert text == "alpha beta gamma delta"
    assert conf == 1.0


def test_scanned_pdf_still_raises_for_rasterizer(tmp_path):
    # a PDF with no text layer cannot short-circuit: the rasterizer
    # dependency is still named
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    p = tmp_path / "scan.pdf"
    p.write_bytes(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF\n")
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        media_to_ocr_span("d0", f"file://{p}", 0, GlyphRecognizer())


def test_objstm_repack_text_roundtrip():
    from doctr_ray.sources.pdfimage import repack_with_objstm
    from doctr_ray.sources.pdftext import make_simple_pdf

    pages = [["first line", "second line"], ["third line"]]
    classic = make_simple_pdf(pages)
    packed = repack_with_objstm(classic)
    assert b"/ObjStm" in packed
    assert extract_pdf_text(packed) == extract_pdf_text(classic)


def test_objstm_hides_untrusted_embedded_font():
    """A font-embedded PDF packed into /ObjStm must STILL be treated
    as untrustworthy text (the FontFile dict is compressed, but the
    expanded bodies join the heuristic)."""
    from doctr_ray.sources.pdffont import make_truetype_pdf
    from doctr_ray.sources.pdfimage import repack_with_objstm

    packed = repack_with_objstm(make_truetype_pdf([["SECRET"]]))
    assert b"/FontFile" not in packed  # compressed away
    assert extract_pdf_text(packed) == []


def test_tounicode_subset_font_text_layer():
    """Tagged subset fonts: /ToUnicode CMaps make the private-code
    text layer REAL — both the simple (1-byte) and composite Identity-H
    (2-byte) forms extract exactly, with Tm-based word/line
    segmentation; without the map the layer stays refused."""
    from doctr_ray.sources.pdffont import make_cid_pdf, make_truetype_pdf

    pages = [["hello world", "second line"], ["page two"]]
    flat = ["hello world", "second line", "page two"]
    assert extract_pdf_text(make_truetype_pdf(pages, to_unicode=True)) == flat
    assert extract_pdf_text(make_cid_pdf(pages, to_unicode=True)) == flat
    assert extract_pdf_text(make_truetype_pdf(pages)) == []  # refused


def test_parse_tounicode_bfrange_forms():
    from doctr_ray.sources.pdftext import parse_tounicode

    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0041> <0058> endbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"
        b"<0020> <0021> [<0077 0078> <0079>]\n"
        b"endbfrange"
    )
    nbytes, m = parse_tounicode(cmap)
    assert nbytes == 2
    assert m[0x41] == "X"
    assert m[0x10] == "a" and m[0x11] == "b" and m[0x12] == "c"
    assert m[0x20] == "wx" and m[0x21] == "y"


def test_tounicode_short_circuits_ocr(tmp_path):
    """A ToUnicode font PDF resolves through the NATIVE text layer in
    the fused worker (confidence 1.0) — no rasterization."""
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdffont import make_truetype_pdf

    p = tmp_path / "tagged.pdf"
    p.write_bytes(
        make_truetype_pdf([["alpha beta", "gamma"]], to_unicode=True)
    )
    text, conf = media_to_ocr_span("d0", f"file://{p}", 0, GlyphRecognizer())
    assert text == "alpha beta gamma"
    assert conf == 1.0
