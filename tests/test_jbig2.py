"""JBIG2 codec (sources/jbig2codec + sources/mqcoder) and its
/JBIG2Decode plumbing in sources/pdfimage.

Reference coverage: pypdfium2's bundled JBIG2 codec behind io/pdf.py's
rasterization — the high-compression bilevel coding scanners and
Acrobat emit for archival documents.
"""

import random

import numpy as np
import pytest

from doctr_ray.sources.jbig2codec import (
    decode_generic,
    decode_jbig2,
    encode_generic,
    encode_jbig2,
)
from doctr_ray.sources.mqcoder import (
    NLPS,
    NMPS,
    QE,
    QE_TABLE,
    SWITCH,
    MQDecoder,
    MQEncoder,
)
from doctr_ray.sources.pdfimage import extract_pdf_page_images, make_scanned_pdf


# --- MQ coder ----------------------------------------------------------


def test_qe_table_shape_and_invariants():
    assert len(QE_TABLE) == 47
    for i, (qe, nmps, nlps, switch) in enumerate(QE_TABLE):
        assert 0 < qe <= 0x5601
        assert 0 <= nmps < 47 and 0 <= nlps < 47
        assert switch in (0, 1)
    # SWITCH is set exactly on the three fast-attack states
    assert [i for i in range(47) if SWITCH[i]] == [0, 6, 14]
    # state 46 is the non-adaptive terminal state
    assert NMPS[46] == NLPS[46] == 46 and QE[46] == 0x5601


def _roundtrip(bits, cxs, ncx):
    enc = MQEncoder()
    icx, mps = bytearray(ncx), bytearray(ncx)
    for b, cx in zip(bits, cxs):
        enc.encode(icx, mps, cx, b)
    data = enc.flush()
    dec = MQDecoder(data)
    icx2, mps2 = bytearray(ncx), bytearray(ncx)
    return [dec.decode(icx2, mps2, cx) for cx in cxs], data


def test_mq_exhaustive_short_sequences():
    for n in range(1, 12):
        for v in range(2 ** n):
            bits = [(v >> i) & 1 for i in range(n)]
            got, _ = _roundtrip(bits, [0] * n, 1)
            assert got == bits, bits


def test_mq_randomized_roundtrips():
    rng = random.Random(7)
    for trial in range(60):
        n = rng.randrange(1, 2500)
        ncx = rng.choice([1, 2, 16, 512, 1 << 16])
        if trial % 3 == 0:
            p = rng.random()
            bits = [1 if rng.random() < p else 0 for _ in range(n)]
        elif trial % 3 == 1:
            bits = [rng.getrandbits(1) for _ in range(n)]
        else:  # long runs exercise renorm chains and byte stuffing
            bits = []
            while len(bits) < n:
                bits += [rng.getrandbits(1)] * rng.randrange(1, 300)
            bits = bits[:n]
        cxs = [rng.randrange(ncx) for _ in range(n)]
        got, data = _roundtrip(bits, cxs, ncx)
        assert got == bits
        # terminated per FLUSH: marker tail present
        assert data[-1] == 0xAC


def test_mq_stream_never_emits_marker_mid_data():
    # 0xFF must always be followed by a stuffed byte <= 0x8F (or the
    # terminal 0xAC marker) — otherwise the decoder would stop early.
    rng = random.Random(3)
    for _ in range(30):
        n = rng.randrange(200, 4000)
        bits = [1] * n  # all-LPS-then-MPS pressure maximizes 0xFF runs
        got, data = _roundtrip(bits, [0] * n, 1)
        assert got == bits
        for i in range(len(data) - 2):  # exclude the final FF AC marker
            if data[i] == 0xFF:
                assert data[i + 1] <= 0x8F, data.hex()


def test_mq_decoder_survives_truncated_stream():
    bits = [random.Random(5).getrandbits(1) for _ in range(500)]
    _, data = _roundtrip(bits, [0] * 500, 1)
    dec = MQDecoder(data[: len(data) // 2])
    icx, mps = bytearray(1), bytearray(1)
    out = [dec.decode(icx, mps, 0) for _ in range(500)]  # must not raise
    assert len(out) == 500


# --- generic region ----------------------------------------------------


@pytest.mark.parametrize("tpgdon", [True, False])
def test_generic_region_roundtrips(tpgdon):
    rng = np.random.default_rng(11)
    for _ in range(12):
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 80))
        img = rng.random((h, w)) < rng.random()
        data = encode_generic(img, tpgdon=tpgdon)
        assert np.array_equal(decode_generic(data, w, h, tpgdon=tpgdon), img)


def test_generic_region_structured_content():
    # rules, solid blocks, blank bands — the shapes TPGDON accelerates
    img = np.zeros((120, 200), bool)
    img[10:12, 5:195] = True
    img[40:80, 20:28] = True
    img[40:80, 172:180] = True
    img[118, :] = True
    data = encode_generic(img)
    assert np.array_equal(decode_generic(data, 200, 120), img)
    # blank-heavy page must compress far below 1 bit/pixel
    assert len(data) * 8 < img.size / 4


def test_inlined_loops_match_readable_mq_classes():
    # encode_generic inlines MQEncoder; replay its decisions through
    # the readable class decoder to pin the two implementations together
    rng = np.random.default_rng(2)
    img = rng.random((30, 40)) < 0.35
    data = encode_generic(img, tpgdon=False)
    dec = MQDecoder(data)
    icx, mps = bytearray(1 << 16), bytearray(1 << 16)
    h, w = img.shape
    pad = np.zeros((h, w + 8), np.uint8)
    pad[:, 4 : w + 4] = img
    out = np.zeros_like(img)
    zeros = [0] * (w + 8)
    rows = []
    for y in range(h):
        r1 = rows[y - 1] if y >= 1 else zeros
        r2 = rows[y - 2] if y >= 2 else zeros
        row = zeros[:]
        w2 = (r2[2] << 4) | (r2[3] << 3) | (r2[4] << 2) | (r2[5] << 1) | r2[6]
        w1 = (
            (r1[1] << 6) | (r1[2] << 5) | (r1[3] << 4) | (r1[4] << 3)
            | (r1[5] << 2) | (r1[6] << 1) | r1[7]
        )
        w0 = 0
        for x in range(w):
            d = dec.decode(icx, mps, (w2 << 11) | (w1 << 4) | w0)
            row[x + 4] = d
            out[y, x] = d
            w2 = ((w2 << 1) | r2[x + 7]) & 0x1F
            w1 = ((w1 << 1) | r1[x + 8]) & 0x7F
            w0 = ((w0 << 1) | d) & 0xF
        rows.append(row)
    assert np.array_equal(out, img)


# --- embedded segment stream + PDF plumbing ----------------------------


def test_embedded_stream_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.random((60, 90)) < 0.2
    out = decode_jbig2(encode_jbig2(img))
    assert out.dtype == bool and np.array_equal(out, img)


def test_embedded_stream_no_tpgdon():
    img = np.eye(33, 47, dtype=bool)
    assert np.array_equal(decode_jbig2(encode_jbig2(img, tpgdon=False)), img)


def test_pdf_jbig2_image_roundtrip():
    rng = np.random.default_rng(9)
    imgs = [
        np.where(rng.random((37, 61)) < 0.3, np.uint8(0), np.uint8(255)),
        np.full((20, 30), np.uint8(255)),
    ]
    pages = extract_pdf_page_images(make_scanned_pdf(imgs, image_format="jbig2"))
    assert len(pages) == 2
    for got, want in zip(pages, imgs):
        assert np.array_equal(got, want)


def test_pdf_jbig2_rejects_non_bilevel():
    with pytest.raises(ValueError):
        make_scanned_pdf([np.full((4, 4), 128, np.uint8)], image_format="jbig2")


def test_decode_rejects_halftone():
    import struct

    from doctr_ray.sources.jbig2codec import _segment

    # a halftone region segment (type 22) must raise, not mis-decode
    stream = _segment(0, 48, 1, struct.pack(">IIIIBH", 8, 8, 0, 0, 1, 0))
    stream += _segment(1, 22, 1, b"\x00" * 20)
    with pytest.raises(NotImplementedError):
        decode_jbig2(stream)


def test_generic_templates_1_2_3_roundtrip():
    """GB templates 1-3 (T.88 6.2.5.3 nominal ATs) round-trip through
    the parameterized cold path, with and without TPGDON, and through
    the full embedded-segment stream."""
    from doctr_ray.sources.jbig2codec import (
        decode_generic,
        decode_jbig2,
        encode_generic,
        encode_jbig2,
    )

    rng = np.random.default_rng(12)
    img = rng.random((40, 90)) < 0.3
    img[10:20] = img[10]
    for tmpl in (1, 2, 3):
        for tp in (True, False):
            enc = encode_generic(img, tpgdon=tp, template=tmpl)
            assert np.array_equal(
                decode_generic(enc, 90, 40, tpgdon=tp, template=tmpl), img
            ), (tmpl, tp)
        stream = encode_jbig2(img, template=tmpl)
        assert np.array_equal(
            decode_jbig2(stream, width=90, height=40), img
        ), tmpl
