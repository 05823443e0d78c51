"""JBIG2 symbol-dictionary + text-region coding (sources/jbig2symbol):
the integer arithmetic decoding procedures, component extraction, and
the symbolic encode -> decode page round-trip.

Reference coverage: pypdfium2's JBIG2 symbol mode behind io/pdf.py —
the coding real scanner firmware emits for text pages.
"""

import random

import numpy as np
import pytest

from doctr_ray.sources.jbig2codec import decode_jbig2
from doctr_ray.sources.jbig2symbol import (
    OOB,
    IntCtx,
    connected_components,
    decode_iaid,
    decode_int,
    decode_symbol_dict,
    decode_text_region,
    encode_iaid,
    encode_int,
    encode_jbig2_symbolic,
    encode_symbol_dict,
    encode_text_region_w,
)
from doctr_ray.sources.mqcoder import MQDecoder, MQEncoder
from doctr_ray.sources.pdfimage import extract_pdf_page_images, make_scanned_pdf


def test_int_arith_bucket_edges_and_oob():
    vals = [0, 1, -1, 3, -3, 4, 19, 20, -20, 83, 84, 339, 340, -340,
            4435, 4436, -4436, 10 ** 6, -(10 ** 6), OOB, 0, OOB]
    enc = MQEncoder()
    ctx = IntCtx()
    for v in vals:
        encode_int(enc, ctx, v)
    dec = MQDecoder(enc.flush())
    ctx2 = IntCtx()
    for v in vals:
        got = decode_int(dec, ctx2)
        assert (got is OOB) if v is OOB else (got == v)


def test_int_arith_randomized():
    rng = random.Random(13)
    vals = [rng.randrange(-(10 ** 7), 10 ** 7) for _ in range(2000)]
    enc = MQEncoder()
    ctx = IntCtx()
    for v in vals:
        encode_int(enc, ctx, v)
    dec = MQDecoder(enc.flush())
    ctx2 = IntCtx()
    assert [decode_int(dec, ctx2) for _ in vals] == vals


@pytest.mark.parametrize("codelen", [1, 3, 9])
def test_iaid_roundtrip(codelen):
    rng = random.Random(codelen)
    ids = [rng.randrange(1 << codelen) for _ in range(300)]
    enc = MQEncoder()
    ctx = IntCtx(1 << (codelen + 1))
    for i in ids:
        encode_iaid(enc, ctx, codelen, i)
    dec = MQDecoder(enc.flush())
    ctx2 = IntCtx(1 << (codelen + 1))
    assert [decode_iaid(dec, ctx2, codelen) for _ in ids] == ids


def test_connected_components_8conn_and_residual():
    img = np.zeros((30, 40), bool)
    img[2:6, 3:7] = True
    img[10, 10] = True
    img[11, 11] = True  # diagonal touch: one component under 8-conn
    img[20:22, 0:40] = True  # full-width rule: oversized -> residual
    comps, residual = connected_components(img, max_side=16)
    assert len(comps) == 2
    assert residual[20:22, :].all() and residual.sum() == 80
    recon = residual.copy()
    for bm, x, y in comps:
        recon[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
    assert np.array_equal(recon, img)


def test_symbol_dict_roundtrip_multiple_height_classes():
    rng = np.random.default_rng(3)
    syms = [rng.random((h, w)) < 0.5
            for h, w in [(3, 4), (3, 7), (5, 2), (5, 5), (5, 9), (8, 8)]]
    for s in syms:
        s[0, 0] = True  # keep every symbol non-empty
    out = decode_symbol_dict(encode_symbol_dict(syms))
    assert len(out) == len(syms)
    for a, b in zip(out, syms):
        assert np.array_equal(a, b)


def test_text_region_repeated_symbol_placements():
    sym = np.ones((4, 3), bool)
    sym[1:3, 1] = False
    payload = encode_text_region_w(
        [(0, 2, 1, 3), (0, 10, 1, 3), (0, 5, 12, 3), (0, 4, 20, 3)],
        nsyms=1, region_w=30, region_h=28,
    )
    page = np.zeros((28, 30), bool)
    decode_text_region(payload, [sym], page)
    want = np.zeros_like(page)
    for x, y in [(2, 1), (10, 1), (5, 12), (4, 20)]:
        want[y:y + 4, x:x + 3] |= sym
    assert np.array_equal(page, want)


def test_symbolic_page_roundtrip_with_residual():
    rng = np.random.default_rng(7)
    img = np.zeros((140, 200), bool)
    glyphs = [rng.random((9, 7)) < 0.5 for _ in range(3)]
    pos = [(5, 5), (20, 5), (40, 5), (5, 30), (60, 30), (100, 70),
           (150, 70), (90, 110)]
    for i, (gx, gy) in enumerate(pos):
        img[gy:gy + 9, gx:gx + 7] |= glyphs[i % 3]
    img[125:127, 4:196] = True  # rule -> residual generic region
    out = decode_jbig2(encode_jbig2_symbolic(img))
    assert np.array_equal(out, img)


def test_symbolic_matches_generic_decode_on_synth_page():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.sources.jbig2codec import encode_jbig2

    pages = rasterize_synth(encode_media_ref("Symbol mode parity check."))
    black = pages[0].image < 128
    gen = decode_jbig2(encode_jbig2(black))
    sym = decode_jbig2(encode_jbig2_symbolic(black))
    assert np.array_equal(gen, black) and np.array_equal(sym, black)


def test_pdf_jbig2_sym_roundtrip():
    rng = np.random.default_rng(1)
    img = np.where(rng.random((50, 80)) < 0.08, np.uint8(0), np.uint8(255))
    pages = extract_pdf_page_images(
        make_scanned_pdf([img], image_format="jbig2_sym")
    )
    assert len(pages) == 1 and np.array_equal(pages[0], img)


def test_huffman_variants_raise():
    import struct

    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_symbol_dict(struct.pack(">H", 1) + b"\x00" * 16)
    payload = (struct.pack(">IIIIB", 8, 8, 0, 0, 0)
               + struct.pack(">H", 1) + struct.pack(">I", 0))
    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_text_region(payload, [], np.zeros((8, 8), bool))
