"""Scanned-image PDF rasterization: round-trips, page order, filters,
predictors, and exact OCR through the real media dispatch."""

import numpy as np
import pytest

from doctr_ray.sources.pdfimage import (
    extract_pdf_page_images,
    make_scanned_pdf,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_flate_roundtrip_exact_gray_and_rgb():
    imgs = [
        _rng(1).integers(0, 256, (40, 60), np.uint8),
        _rng(2).integers(0, 256, (32, 48, 3), np.uint8),
    ]
    out = extract_pdf_page_images(make_scanned_pdf(imgs, image_format="flate"))
    assert len(out) == 2
    for a, b in zip(imgs, out):
        assert np.array_equal(a, b)


def test_jpeg_pages_decode_with_bounded_error():
    img = _rng(3).integers(0, 256, (24, 40), np.uint8)
    out = extract_pdf_page_images(make_scanned_pdf([img], image_format="jpeg"))
    assert out[0].shape == img.shape
    assert np.abs(out[0].astype(int) - img.astype(int)).mean() < 3


def test_page_order_follows_catalog_kids():
    # distinguishable pages: constant gray levels 10, 20, 30
    imgs = [np.full((8, 8), v, np.uint8) for v in (10, 20, 30)]
    out = extract_pdf_page_images(make_scanned_pdf(imgs, image_format="flate"))
    assert [int(o[0, 0]) for o in out] == [10, 20, 30]


def test_png_predictor_streams_decode():
    # hand-build a /Predictor 12 (Up) image object inside a minimal PDF
    import zlib

    img = _rng(4).integers(0, 256, (6, 10), np.uint8)
    rows = []
    prev = np.zeros(10, np.uint8)
    for r in img:
        rows.append(bytes([2]) + ((r.astype(int) - prev.astype(int)) % 256).astype(np.uint8).tobytes())
        prev = r
    payload = zlib.compress(b"".join(rows))
    base = make_scanned_pdf([img], image_format="flate")
    # swap the image object for the predictor-coded variant
    new_obj = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 6 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Colors 1 /Columns 10 >> "
        b"/Length " + str(len(payload)).encode() + b" >>\nstream\n" + payload + b"\nendstream"
    )
    start = base.find(b"1 0 obj\n") + len(b"1 0 obj\n")
    end = base.find(b"\nendobj", start)
    data = base[:start] + new_obj + base[end:]
    out = extract_pdf_page_images(data)
    assert np.array_equal(out[0], img)


def test_unsupported_filters_name_dependency():
    base = make_scanned_pdf([np.zeros((4, 4), np.uint8)], image_format="flate")
    data = base.replace(b"/Filter /FlateDecode", b"/Filter /Crypt")
    with pytest.raises(NotImplementedError, match="/Crypt"):
        extract_pdf_page_images(data)
    with pytest.raises(ValueError, match="%PDF-"):
        extract_pdf_page_images(b"not a pdf")


def test_lzw_and_rle_image_roundtrip_exact():
    imgs = [
        _rng(11).integers(0, 256, (24, 36), np.uint8),
        _rng(12).integers(0, 4, (20, 30), np.uint8) * 80,  # runs for RLE
    ]
    for fmt in ("lzw", "rle"):
        out = extract_pdf_page_images(make_scanned_pdf(imgs, image_format=fmt))
        assert len(out) == 2
        for a, b in zip(imgs, out):
            assert np.array_equal(a, b)


def test_ascii_transport_wrapped_images_roundtrip():
    img = _rng(13).integers(0, 256, (16, 22), np.uint8)
    rgb = _rng(14).integers(0, 256, (12, 18, 3), np.uint8)
    for transport in ("ahx", "a85"):
        for fmt in ("flate", "lzw"):
            pdf = make_scanned_pdf(
                [img, rgb], image_format=fmt, transport=transport
            )
            out = extract_pdf_page_images(pdf)
            assert np.array_equal(out[0], img)
            assert np.array_equal(out[1], rgb)


def test_a85_wrapped_jpeg_decodes():
    img = _rng(15).integers(0, 256, (24, 40), np.uint8)
    pdf = make_scanned_pdf([img], image_format="jpeg", transport="a85")
    out = extract_pdf_page_images(pdf)
    assert out[0].shape == img.shape
    assert np.abs(out[0].astype(int) - img.astype(int)).mean() < 3


def test_inline_ahx_round_trip():
    img = _rng(16).integers(0, 256, (10, 14), np.uint8)
    out = extract_pdf_page_images(
        make_scanned_pdf([img], image_format="inline_ahx")
    )
    assert np.array_equal(out[0], img)


def test_scanned_pdf_ocr_exact_multipage(tmp_path):
    """Multi-page scanned PDF (JPEG pages) -> full OCR pipeline ->
    byte-exact ground-truth text, via the real media dispatch."""
    from doctr_ray.media import (
        encode_media_ref,
        rasterize_synth,
        synth_ground_truth_text,
    )
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    words = " ".join(f"word{i:04d}" for i in range(900))
    ref = encode_media_ref(words)
    pages = rasterize_synth(ref)
    assert len(pages) > 1  # must actually span pages
    p = tmp_path / "scan.pdf"
    p.write_bytes(make_scanned_pdf([pg.image for pg in pages], image_format="jpeg"))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == synth_ground_truth_text(ref)


def test_text_layer_still_wins_over_raster(tmp_path):
    # a NATIVE-text PDF must keep short-circuiting (no OCR)
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdftext import make_simple_pdf

    p = tmp_path / "digital.pdf"
    p.write_bytes(make_simple_pdf([["hello native", "text layer"]]))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == "hello native text layer"
    assert conf == 1.0


def test_subbyte_gray_roundtrip_exact():
    # 1/2/4-bit gray samples on the exact 255/(2^b-1) grid
    for bits, scale in ((1, 255), (2, 85), (4, 17)):
        levels = np.arange(2**bits, dtype=np.uint8) * scale
        img = levels[_rng(bits).integers(0, 2**bits, (13, 21))]
        out = extract_pdf_page_images(
            make_scanned_pdf([img], image_format="flate", bits=bits)
        )
        assert np.array_equal(out[0], img), bits
    # off-grid values are rejected, not silently quantized
    with pytest.raises(ValueError, match="multiples"):
        make_scanned_pdf([np.full((4, 4), 7, np.uint8)], bits=1)


def test_16bit_gray_high_byte():
    img16 = _rng(9).integers(0, 65536, (9, 14)).astype(np.uint16)
    out = extract_pdf_page_images(
        make_scanned_pdf([img16], image_format="flate", bits=16)
    )
    assert np.array_equal(out[0], (img16 >> 8).astype(np.uint8))


def test_indexed_palette_roundtrip():
    pal = np.array([[250, 10, 10], [10, 250, 10], [10, 10, 250], [0, 0, 0]],
                   np.uint8)
    idx = _rng(11).integers(0, 4, (12, 18)).astype(np.uint8)
    out = extract_pdf_page_images(
        make_scanned_pdf([idx], image_format="flate", palette=pal)
    )
    assert np.array_equal(out[0], pal[idx])
    # achromatic palette collapses to gray (what the OCR kernel eats)
    gpal = np.stack([np.arange(0, 256, 16, dtype=np.uint8)] * 3, axis=1)
    gidx = _rng(12).integers(0, 16, (8, 8)).astype(np.uint8)
    gout = extract_pdf_page_images(
        make_scanned_pdf([gidx], image_format="flate", palette=gpal)
    )
    assert gout[0].ndim == 2
    assert np.array_equal(gout[0], gpal[gidx][:, :, 0])


def test_indexed_palette_stream_lookup():
    # palette delivered as a stream object reference instead of a hex string
    import zlib as _z

    pal = np.array([[1, 2, 3], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    base = make_scanned_pdf([idx], image_format="flate", palette=pal)
    hexpal = pal.tobytes().hex().encode()
    palstream = _z.compress(pal.tobytes())
    # replace the inline hex lookup with "99 0 R" and append object 99
    swapped = base.replace(b"<" + hexpal + b">", b"99 0 R")
    insert = (
        b"99 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(palstream)).encode()
        + b" >>\nstream\n" + palstream + b"\nendstream\nendobj\n"
    )
    data = swapped.replace(b"xref\n", insert + b"xref\n", 1)
    out = extract_pdf_page_images(data)
    assert np.array_equal(out[0], pal[idx])


def test_bilevel_scanned_pdf_ocr_exact(tmp_path):
    """A 1-bit (bilevel archival) scan of a rendered page must OCR to
    the exact ground truth through the real media dispatch."""
    from doctr_ray.media import (
        encode_media_ref,
        rasterize_synth,
        synth_ground_truth_text,
    )
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    ref = encode_media_ref("bilevel archive scan words here")
    pages = rasterize_synth(ref)
    # threshold the rendered page to pure black/white (synthetic pages
    # are already near-bilevel, so thresholding is lossless for OCR)
    bilevel = [
        np.where(pg.image > 127, 255, 0).astype(np.uint8) for pg in pages
    ]
    p = tmp_path / "bilevel.pdf"
    p.write_bytes(make_scanned_pdf(bilevel, image_format="flate", bits=1))
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == synth_ground_truth_text(ref)


# ------------------------------------------------------- inline images


def test_inline_flate_round_trip_gray_and_rgb():
    """BI/ID/EI inline images (PDF 8.9.7 abbreviated keys) round-trip
    bit-exact through the shared decode path."""
    rng = np.random.RandomState(3)
    g = (rng.rand(40, 60) * 255).astype(np.uint8)
    rgb = (rng.rand(30, 50, 3) * 255).astype(np.uint8)
    data = make_scanned_pdf([g, rgb], image_format="inline_flate")
    out = extract_pdf_page_images(data)
    assert len(out) == 2
    assert np.array_equal(out[0], g)
    assert np.array_equal(out[1], rgb)
    # no XObject image objects exist: the content stream IS the image
    assert b"/XObject" not in data


def test_inline_jpeg_decodes():
    flat = np.full((32, 48), 128, np.uint8)
    data = make_scanned_pdf([flat], image_format="inline_jpeg")
    out = extract_pdf_page_images(data)
    assert out[0].shape == (32, 48)
    assert abs(out[0].astype(int) - 128).max() <= 3


def test_inline_raw_segment_end_detection():
    """An unfiltered inline image's binary segment is sliced by the
    computed row stride — bytes after EI must not leak into the image."""
    from doctr_ray.sources.pdfimage import _inline_images

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    content = (
        b"q BI /W 4 /H 3 /CS /G /BPC 8 ID\n" + img.tobytes() + b"\nEI Q"
    )
    out = _inline_images(content)
    assert len(out) == 1
    assert np.array_equal(out[0], img)


def test_inline_stray_bi_in_stream_is_skipped():
    from doctr_ray.sources.pdfimage import _inline_images

    # "BI" without an image dict (e.g. inside other operands) is benign
    assert _inline_images(b"BT (A BI C) Tj ET ID nothing") == []


def test_inline_array_cs_raises():
    from doctr_ray.sources.pdfimage import _inline_images

    with pytest.raises(NotImplementedError, match="ColorSpace"):
        _inline_images(
            b"BI /W 2 /H 2 /CS [/I /G 1 <00ff>] /BPC 8 ID\n\x00\xff\x00\xff\nEI"
        )


def test_objstm_repack_scanned_pdf_roundtrip():
    """PDF 1.5 compressed form: dict objects (pages, catalog) move
    into an /ObjStm + /XRef stream; the catalog walk must still find
    page order and images."""
    from doctr_ray.sources.pdfimage import repack_with_objstm

    imgs = [np.full((8, 8), v, np.uint8) for v in (10, 20, 30)]
    classic = make_scanned_pdf(imgs, image_format="flate")
    packed = repack_with_objstm(classic)
    assert b"/ObjStm" in packed and b"/Type /XRef" in packed
    # page dicts are no longer top-level text
    assert b"/Type /Page /Parent" not in packed
    out = extract_pdf_page_images(packed)
    assert [int(o[0, 0]) for o in out] == [10, 20, 30]


def test_objstm_repack_font_pdf_rasterizes():
    from doctr_ray.sources.pdffont import make_truetype_pdf, rasterize_truetype_pdf
    from doctr_ray.sources.pdfimage import repack_with_objstm

    classic = make_truetype_pdf([["HELLO OBJSTM"]])
    packed = repack_with_objstm(classic)
    a = rasterize_truetype_pdf(classic)
    b = rasterize_truetype_pdf(packed)
    assert len(a) == len(b) == 1
    assert np.array_equal(a[0], b[0])


def test_ccitt_k_positive_and_byte_align_pdf_roundtrip():
    """/K 4 mixed coding and /EncodedByteAlign true decode through the
    full PDF path."""
    rng = np.random.default_rng(31)
    img = np.where(rng.random((20, 64)) < 0.35, 0, 255).astype(np.uint8)
    img[8:14] = img[8]  # correlated rows
    for align in (False, True):
        pdf = make_scanned_pdf(
            [img], image_format="ccitt_g3_2d", ccitt_byte_align=align
        )
        assert b"/K 4" in pdf
        out = extract_pdf_page_images(pdf)
        assert np.array_equal(out[0], img), align
    pdf = make_scanned_pdf([img], image_format="ccitt_g4", ccitt_byte_align=True)
    assert b"/EncodedByteAlign true" in pdf
    assert np.array_equal(extract_pdf_page_images(pdf)[0], img)


def test_imagemask_stencil_and_decode_inversion():
    """/ImageMask true stencils (bit 0 = paint black) and /Decode
    [1 0] inversion on both masks and gray images."""
    img = np.where(_rng(51).random((14, 33)) < 0.4, 0, 255).astype(np.uint8)
    pdf = make_scanned_pdf([img], image_format="mask")
    assert b"/ImageMask true" in pdf and b"/ColorSpace" not in pdf
    assert np.array_equal(extract_pdf_page_images(pdf)[0], img)
    # /Decode [1 0] flips the stencil
    flipped = pdf.replace(b"/ImageMask true", b"/ImageMask true /Decode [1 0]")
    assert np.array_equal(extract_pdf_page_images(flipped)[0], 255 - img)
    # /Decode [1 0] on plain 8-bit gray inverts samples
    g = _rng(52).integers(0, 256, (9, 12), np.uint8)
    base = make_scanned_pdf([g], image_format="flate")
    inv = base.replace(b"/BitsPerComponent 8", b"/BitsPerComponent 8 /Decode [1 0]")
    assert np.array_equal(extract_pdf_page_images(inv)[0], 255 - g)


def test_inline_imagemask_decodes():
    img = np.where(_rng(53).random((6, 20)) < 0.5, 0, 255).astype(np.uint8)
    bits = np.packbits((img == 255).astype(np.uint8), axis=1).tobytes()
    content = (
        b"q 20 0 0 6 0 0 cm BI /W 20 /H 6 /BPC 1 /IM true ID\n"
        + bits + b"\nEI Q"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 3 0 R /MediaBox [0 0 20 6] "
        b"/Contents 1 0 R /Resources << >> >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"trailer\n<< /Root 4 0 R >>\n%%EOF\n"
    )
    out = extract_pdf_page_images(pdf)
    assert np.array_equal(out[0], img)


def test_smask_composites_over_white():
    """/SMask soft masks composite the image over the white page:
    alpha 255 shows the pixel, alpha 0 shows white."""
    import zlib as _z

    img = np.full((6, 8), 40, np.uint8)
    base = make_scanned_pdf([img], image_format="flate")
    alpha = np.zeros((6, 8), np.uint8)
    alpha[:, :4] = 255  # left half opaque, right half transparent
    az = _z.compress(alpha.tobytes())
    smask_obj = (
        b"9 0 obj\n<< /Type /XObject /Subtype /Image /Width 8 /Height 6 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length " + str(len(az)).encode() + b" >>\nstream\n" + az
        + b"\nendstream\nendobj\n"
    )
    data = base.replace(
        b"/Type /XObject /Subtype /Image",
        b"/Type /XObject /Subtype /Image /SMask 9 0 R", 1,
    ).replace(b"trailer", smask_obj + b"trailer", 1)
    out = extract_pdf_page_images(data)
    assert len(out) == 1  # the mask itself is NOT a page image
    assert (out[0][:, :4] == 40).all()
    assert (out[0][:, 4:] == 255).all()


def test_iccbased_colorspace_resolves_rgb():
    """[/ICCBased N 0 R] with /N 3 must decode as RGB, not gray."""
    import zlib as _z

    rgb = _rng(81).integers(0, 256, (5, 7, 3), np.uint8)
    base = make_scanned_pdf([rgb], image_format="flate")
    icc_obj = (
        b"9 0 obj\n<< /N 3 /Length 4 >>\nstream\nfake\nendstream\nendobj\n"
    )
    data = base.replace(
        b"/ColorSpace /DeviceRGB", b"/ColorSpace [/ICCBased 9 0 R]", 1
    ).replace(b"trailer", icc_obj + b"trailer", 1)
    out = extract_pdf_page_images(data)
    assert np.array_equal(out[0], rgb)


def test_form_xobject_nested_images():
    """Images referenced from a /Form XObject's OWN /Resources (the
    one-level nesting real producers emit) are found by the walk even
    when the page also has a direct image."""
    import zlib as _z

    direct = np.full((4, 4), 30, np.uint8)
    nested = np.full((4, 4), 90, np.uint8)
    base = make_scanned_pdf([direct], image_format="flate")
    nz = _z.compress(nested.tobytes())
    img_obj = (
        b"9 0 obj\n<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length " + str(len(nz)).encode() + b" >>\nstream\n" + nz
        + b"\nendstream\nendobj\n"
    )
    form_body = b"q 4 0 0 4 0 0 cm /ImN Do Q"
    form_obj = (
        b"10 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 4 4] "
        b"/Resources << /XObject << /ImN 9 0 R >> >> /Length "
        + str(len(form_body)).encode() + b" >>\nstream\n" + form_body
        + b"\nendstream\nendobj\n"
    )
    data = base.replace(
        b"/XObject << /Im0 1 0 R >>",
        b"/XObject << /Im0 1 0 R /Fo 10 0 R >>", 1,
    ).replace(b"trailer", img_obj + form_obj + b"trailer", 1)
    out = extract_pdf_page_images(data)
    vals = sorted(int(o[0, 0]) for o in out)
    assert vals == [30, 90]
