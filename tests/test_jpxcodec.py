"""JPEG 2000 codec (sources/jpxcodec) and its /JPXDecode plumbing in
sources/pdfimage: 5/3 DWT, EBCOT tier-1, tag trees, packet headers,
codestream and JP2 container.

Reference coverage: pypdfium2's bundled OpenJPEG behind io/pdf.py's
rasterization — the lossless JPEG 2000 profile archival PDFs embed.
"""

import numpy as np
import pytest

import doctr_ray.sources.jpxcodec as jpx
from doctr_ray.sources.pdfimage import extract_pdf_page_images, make_scanned_pdf


# --- DWT ----------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 33, 100, 101])
def test_dwt_1d_exact_roundtrip(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-5000, 5000, size=(4, n))
    s, d = jpx._fwd_53_1d(x)
    assert s.shape[-1] == (n + 1) // 2 and d.shape[-1] == n // 2
    assert np.array_equal(jpx._inv_53_1d(s, d, n), x)


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 12), (33, 47), (64, 64)])
@pytest.mark.parametrize("levels", [1, 3])
def test_dwt_2d_multilevel_roundtrip(shape, levels):
    rng = np.random.default_rng(7)
    img = rng.integers(-2000, 2000, size=shape)
    bands = jpx.dwt53_forward(img, levels)
    assert len(bands) == levels + 1
    assert np.array_equal(jpx.dwt53_inverse(bands, shape), img)


def test_dwt_lowpass_tracks_mean():
    # the LL band of a constant image is (nearly) the constant itself
    img = np.full((32, 32), 100, np.int64)
    bands = jpx.dwt53_forward(img, 2)
    assert (np.asarray(bands[0]) == 100).all()
    for hl, lh, hh in bands[1:]:
        assert not np.asarray(hl).any() and not np.asarray(hh).any()


# --- EBCOT --------------------------------------------------------------


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_ebcot_block_roundtrips(band):
    rng = np.random.default_rng(hash(band) % 2 ** 31)
    for shape in [(4, 4), (7, 5), (13, 17), (64, 64)]:
        for scale, density in [(1, 0.5), (100, 0.3), (30000, 0.05)]:
            c = (rng.integers(-scale, scale + 1, size=shape)
                 * (rng.random(shape) < density)).astype(np.int64)
            data, nplanes, npasses = jpx.encode_block(c, band)
            out = jpx.decode_block(data, shape[0], shape[1], band,
                                   nplanes, npasses)
            assert np.array_equal(out, c)


def test_ebcot_empty_and_single_coefficient():
    z = np.zeros((8, 8), np.int64)
    data, npl, nps = jpx.encode_block(z, "HH")
    assert npl == 0 and nps == 0 and data == b""
    one = z.copy()
    one[3, 5] = -77
    data, npl, nps = jpx.encode_block(one, "LH")
    assert npl == 7  # |−77| needs 7 magnitude bit-planes
    assert np.array_equal(jpx.decode_block(data, 8, 8, "LH", npl, nps), one)


def test_zc_tables_match_spec_shape():
    # every context value in 0..8; the all-zero neighborhood maps to 0
    for tab in (jpx._ZC_LH, jpx._ZC_HL, jpx._ZC_HH):
        assert tab.min() >= 0 and tab.max() == 8 and tab[0, 0, 0] == 0
    # HL is the H/V transpose of LH
    assert np.array_equal(jpx._ZC_HL, np.swapaxes(jpx._ZC_LH, 0, 1))


# --- tag trees + packet headers ------------------------------------------


def test_tag_tree_roundtrip():
    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (3, 2), (5, 7), (9, 4)]:
        vals = rng.integers(0, 6, size=(h, w))
        te = jpx._TagTree(w, h)
        te.set_values(vals)
        wtr = jpx._HeaderWriter()
        for y in range(h):
            for x in range(w):
                te.encode(x, y, int(vals[y, x]) + 1, wtr.put)
        td = jpx._TagTree(w, h)
        rd = jpx._HeaderReader(wtr.flush())
        for y in range(h):
            for x in range(w):
                k = 1
                while True:
                    v = td.decode(x, y, k, rd.get)
                    if v is not None:
                        break
                    k += 1
                assert v == vals[y, x]


def test_header_bit_stuffing():
    w = jpx._HeaderWriter()
    for _ in range(32):
        w.put(1)
    data = w.flush()
    # a 0xFF byte is always followed by a 7-bit byte (MSB 0)
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] <= 0x7F
    r = jpx._HeaderReader(data)
    assert all(r.get() == 1 for _ in range(32))


# --- full images ----------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (37, 61), (100, 160), (1, 7)])
def test_jpx_gray_lossless(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    out = jpx.decode_jpx(jpx.encode_jpx(img))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_jpx_rgb_rct_lossless_and_jp2_container():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(45, 70, 3)).astype(np.uint8)
    raw = jpx.decode_jpx(jpx.encode_jpx(img))
    boxed = jpx.decode_jpx(jpx.encode_jp2(img))
    assert np.array_equal(raw, img) and np.array_equal(boxed, img)


def test_jpx_16bit_gray():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 1 << 16, size=(20, 33)).astype(np.uint16)
    out = jpx.decode_jpx(jpx.encode_jpx(img))
    assert out.dtype == np.uint16 and np.array_equal(out, img)


def test_jpx_structured_page_compresses():
    img = np.full((120, 200), 255, np.uint8)
    img[20:24, 10:190] = 0
    img[50:100, 40:44] = 0
    data = jpx.encode_jpx(img)
    assert np.array_equal(jpx.decode_jpx(data), img)
    assert len(data) < img.size // 8  # structured content compresses


def test_jpx_rejects_inconsistent_97_without_quantization():
    # a 9/7 transform byte on a stream whose QCD says "no
    # quantization" (reversible) is malformed — refuse, don't garble
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(jpx.encode_jpx(img))
    cod_at = data.find(b"\xff\x52")
    data[cod_at + 13] = 0
    with pytest.raises(NotImplementedError, match="9/7"):
        jpx.decode_jpx(bytes(data))


def test_pdf_jpx_image_roundtrip():
    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, size=(37, 61)).astype(np.uint8)
    rgb = rng.integers(0, 256, size=(20, 30, 3)).astype(np.uint8)
    pages = extract_pdf_page_images(
        make_scanned_pdf([gray, rgb], image_format="jpx")
    )
    assert len(pages) == 2
    assert np.array_equal(pages[0], gray)
    assert np.array_equal(pages[1], rgb)


def test_97_dwt_roundtrip_float_exact():
    from doctr_ray.sources.jpxcodec import dwt97_forward, dwt97_inverse

    rng = np.random.default_rng(61)
    for shape in ((1, 1), (2, 3), (17, 9), (64, 64), (33, 47)):
        img = rng.random(shape) * 255
        for levels in (0, 1, 3):
            bands = dwt97_forward(img, levels)
            out = dwt97_inverse(bands, shape)
            assert np.allclose(out, img, atol=1e-8), (shape, levels)


def test_lossy_roundtrip_bounded_and_monotonic():
    from doctr_ray.sources.jpxcodec import decode_jpx, encode_jpx

    rng = np.random.default_rng(62)
    noise = rng.integers(0, 256, (37, 51), np.uint8)
    errs = []
    for p in (-2, 0, 2):
        out = decode_jpx(encode_jpx(noise, lossy=True, precision=p))
        assert out.shape == noise.shape and out.dtype == np.uint8
        errs.append(np.abs(out.astype(int) - noise.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]  # finer steps -> smaller error
    assert errs[2] < 0.05  # delta=0.25 reconstructs within rounding


def test_lossy_rgb_ict_and_16bit():
    from doctr_ray.sources.jpxcodec import decode_jpx, encode_jp2, encode_jpx

    rng = np.random.default_rng(63)
    rgb = rng.integers(0, 256, (24, 31, 3), np.uint8)
    out = decode_jpx(encode_jpx(rgb, lossy=True, precision=4))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1
    g16 = rng.integers(0, 65536, (20, 22)).astype(np.uint16)
    out16 = decode_jpx(encode_jpx(g16, lossy=True, precision=2))
    assert out16.dtype == np.uint16
    assert np.abs(out16.astype(int) - g16.astype(int)).max() <= 1
    # lossy through the JP2 container too
    out2 = decode_jpx(encode_jp2(rgb, lossy=True, precision=4))
    assert np.abs(out2.astype(int) - rgb.astype(int)).max() <= 1


def test_lossy_pdf_page_ocr_exact(tmp_path):
    """A lossy-JPX scanned PDF still OCRs byte-exactly: the fine-step
    quantization error (<1 gray level) is far inside the binarization
    margin of the 0/255 glyph pages."""
    from doctr_ray.media import (
        encode_media_ref,
        rasterize_synth,
        synth_ground_truth_text,
    )
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.pdfimage import make_scanned_pdf

    ref = encode_media_ref("lossy jpx page words " * 4)
    pages = rasterize_synth(ref)
    p = tmp_path / "lossy.pdf"
    p.write_bytes(
        make_scanned_pdf([pg.image for pg in pages], image_format="jpx_lossy")
    )
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == synth_ground_truth_text(ref)


def test_scalar_derived_quantization():
    """Sqcd style 1 (one base pair; steps double per finer level):
    round-trips with the E.5 derived exponents, error bounded and
    shrinking with precision."""
    from doctr_ray.sources.jpxcodec import decode_jpx, encode_jpx

    rng = np.random.default_rng(64)
    img = rng.integers(0, 256, (37, 51), np.uint8)
    prev = None
    for p in (1, 3, 5):
        out = decode_jpx(
            encode_jpx(img, lossy=True, precision=p, qcd_style="derived")
        )
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        if prev is not None:
            assert err < prev
        prev = err
    assert prev < 0.2
    rgb = rng.integers(0, 256, (24, 31, 3), np.uint8)
    out = decode_jpx(
        encode_jpx(rgb, lossy=True, precision=5, qcd_style="derived")
    )
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1
