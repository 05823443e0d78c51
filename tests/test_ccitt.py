"""CCITT Group 4 / Group 3 fax codec (sources/ccittcodec) and its
/CCITTFaxDecode plumbing in sources/pdfimage.

Reference coverage: pypdfium2's bundled fax codec behind io/pdf.py's
rasterization — the compression of bilevel archival scans.
"""

import numpy as np
import pytest

from doctr_ray.sources.ccittcodec import (
    BLACK_CODES,
    EXT_MAKEUP,
    WHITE_CODES,
    decode_g3,
    decode_g4,
    encode_g3,
    encode_g4,
)
from doctr_ray.sources.pdfimage import extract_pdf_page_images, make_scanned_pdf


def test_tables_prefix_free_and_lengths():
    # T.4 MH tables must be uniquely decodable prefix codes, 2-13 bits
    for codes in ({**WHITE_CODES, **EXT_MAKEUP}, {**BLACK_CODES, **EXT_MAKEUP}):
        assert set(codes) == set(range(64)) | set(range(64, 2561, 64))
        by_len = sorted(codes.values(), key=len)
        assert 2 <= len(by_len[0]) and len(by_len[-1]) <= 13
        for i, a in enumerate(by_len):
            for b in by_len[i + 1 :]:
                assert not b.startswith(a), (a, b)


@pytest.mark.parametrize("enc,dec", [(encode_g4, decode_g4), (encode_g3, decode_g3)])
def test_random_roundtrips(enc, dec):
    rng = np.random.default_rng(11)
    for _ in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 90))
        img = rng.random((h, w)) < rng.random()
        assert np.array_equal(dec(enc(img), w, h), img)


@pytest.mark.parametrize("enc,dec", [(encode_g4, decode_g4), (encode_g3, decode_g3)])
def test_structured_page_and_long_runs(enc, dec):
    img = np.zeros((120, 400), bool)
    img[20:30, 10:390] = True  # solid bar
    img[40:100:7, ::3] = True  # dense texture rows
    img[:, 200] = True  # vertical rule
    assert np.array_equal(dec(enc(img), 400, 120), img)
    # runs needing chained extended makeup codes (> 2560)
    big = np.zeros((2, 6000), bool)
    big[0, 100:5900] = True
    assert np.array_equal(dec(enc(big), 6000, 2), big)
    # all-white and all-black pages
    for fill in (False, True):
        page = np.full((5, 64), fill)
        assert np.array_equal(dec(enc(page), 64, 5), page)


def test_g4_stops_at_eofb_without_rows():
    rng = np.random.default_rng(5)
    img = rng.random((12, 64)) < 0.3
    assert np.array_equal(decode_g4(encode_g4(img), 64), img)


def test_g3_accepts_eol_framed_rows():
    # EndOfLine true framing: EOL (with fill) before every row
    from doctr_ray.sources.ccittcodec import (
        BLACK_CODES,
        WHITE_CODES,
        _BitWriter,
        _put_run,
        _transitions_of,
    )

    img = np.random.default_rng(8).random((4, 30)) < 0.5
    bw = _BitWriter()
    for y in range(4):
        bw.put("0000" + "000000000001")  # fill + EOL
        pos, color = 0, 0
        for t in _transitions_of(img[y]) + [30]:
            _put_run(bw, t - pos, BLACK_CODES if color else WHITE_CODES)
            pos, color = t, color ^ 1
    assert np.array_equal(decode_g3(bw.tobytes(), 30, 4), img)


def test_truncated_stream_raises():
    img = np.random.default_rng(9).random((6, 50)) < 0.5
    data = encode_g4(img)
    with pytest.raises(ValueError, match="ended at row"):
        decode_g4(data[: len(data) // 3], 50, 6)


@pytest.mark.parametrize("fmt", ["ccitt_g4", "ccitt_g3"])
def test_pdf_roundtrip(fmt):
    rng = np.random.default_rng(3)
    imgs = [
        np.where(rng.random((33, 57)) < 0.4, 0, 255).astype(np.uint8),
        np.where(rng.random((21, 40)) < 0.1, 0, 255).astype(np.uint8),
    ]
    out = extract_pdf_page_images(make_scanned_pdf(imgs, image_format=fmt))
    assert len(out) == 2
    for got, want in zip(out, imgs):
        assert np.array_equal(got, want)


def test_pdf_rejects_non_bilevel():
    with pytest.raises(ValueError, match="0 or 255"):
        make_scanned_pdf([np.full((4, 4), 128, np.uint8)], image_format="ccitt_g4")
    with pytest.raises(ValueError, match="gray bilevel"):
        make_scanned_pdf(
            [np.zeros((4, 4, 3), np.uint8)], image_format="ccitt_g4"
        )


def test_mislabeled_k_parameter_fails_loudly():
    # a G4 stream labeled /K 4 is NOT silently misdecoded: K>0 data
    # must start with an EOL, which MMR row coding never emits
    base = make_scanned_pdf(
        [np.full((4, 4), 0, np.uint8)], image_format="ccitt_g4"
    )
    with pytest.raises(ValueError, match="EOL"):
        extract_pdf_page_images(base.replace(b"/K -1", b"/K 4"))


def test_blackis1_flips_samples():
    img = np.where(np.eye(6, 9) > 0, 0, 255).astype(np.uint8)
    base = make_scanned_pdf([img], image_format="ccitt_g4")
    flipped = extract_pdf_page_images(
        base.replace(b"/K -1", b"/K -1 /BlackIs1 true")
    )[0]
    # 1 bits now mean black -> DeviceGray sample 1 renders white
    assert np.array_equal(flipped, 255 - img)


def test_ccitt_scanned_pdf_ocr_exact(tmp_path):
    """A G4-compressed scan of a rendered page must OCR to the exact
    ground truth through the real media dispatch."""
    from doctr_ray.media import (
        encode_media_ref,
        rasterize_synth,
        synth_ground_truth_text,
    )
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    ref = encode_media_ref("ccitt group four archival scan words")
    pages = rasterize_synth(ref)  # synthetic pages are already 0/255
    p = tmp_path / "fax.pdf"
    p.write_bytes(
        make_scanned_pdf([pg.image for pg in pages], image_format="ccitt_g4")
    )
    got, conf = media_to_ocr_span("d", f"file://{p}", 0, GlyphRecognizer())
    assert got == synth_ground_truth_text(ref)


def test_g3_2d_mixed_roundtrip():
    """K>0: EOL+tag rows, every 4th row 1-D, rest 2-D coded."""
    from doctr_ray.sources.ccittcodec import decode_g3_2d, encode_g3_2d

    rng = np.random.default_rng(21)
    img = rng.random((23, 71)) < 0.3
    # correlated rows (the case 2-D coding exists for)
    img[5:12] = img[5]
    for k in (1, 2, 4, 8):
        enc = encode_g3_2d(img, k=k)
        out = decode_g3_2d(enc, img.shape[1], img.shape[0])
        assert np.array_equal(out, img), k


def test_byte_align_all_codecs():
    from doctr_ray.sources.ccittcodec import (
        decode_g3,
        decode_g3_2d,
        decode_g4,
        encode_g3,
        encode_g3_2d,
        encode_g4,
    )

    rng = np.random.default_rng(22)
    img = rng.random((9, 37)) < 0.4
    for enc, dec in (
        (encode_g3, decode_g3),
        (encode_g4, decode_g4),
        (encode_g3_2d, decode_g3_2d),
    ):
        data = enc(img, byte_align=True)
        out = dec(data, img.shape[1], img.shape[0], byte_align=True)
        assert np.array_equal(out, img), enc.__name__


def test_g3_2d_requires_leading_eol():
    from doctr_ray.sources.ccittcodec import decode_g3_2d

    with pytest.raises(ValueError, match="EOL"):
        decode_g3_2d(b"\xff\xff\xff", 16, 1)
