"""JBIG2 (ITU-T T.88) bilevel image codec — the ``/JBIG2Decode`` PDF filter.

The reference rasterizes every PDF through pypdfium2 (io/pdf.py:16-43)
whose bundled codecs include JBIG2 — the dominant high-compression
bilevel coding for scanned documents (what Acrobat and scanner
firmware emit alongside CCITT G4). No native codec exists in this
container, so this module implements the embedded-in-PDF profile in
pure Python + numpy:

- **MQ-coded generic region decoding** (T.88 §6.2): template 0 with
  the nominal adaptive-template pixels A1(+3,-1) A2(-3,-1) A3(+2,-2)
  A4(-2,-2), which makes the 16-pixel context three contiguous
  sliding windows (5 px of row y-2, 7 px of row y-1, 4 px of row y) —
  maintained incrementally with two shifts per pixel. TPGDON (typical
  prediction) is supported: one SLTP decision per row in context
  0x9B25, a set LTP flag copying the previous row outright — which is
  also the fast path, since blank scan rows cost one decision instead
  of ``width``.
- **Generic region encoding** with the same template (TPGDON on), so
  ``make_scanned_pdf`` can produce real JBIG2 archival fixtures and
  the round-trip is testable end-to-end in-container.
- **The embedded segment stream** (T.88 §7, PDF 32000 §7.4.7): page
  information / immediate (lossless) generic region / end-of-page
  segment headers in both directions. Symbol-dictionary + text-region
  coding lives in jbig2symbol (built on the integer arithmetic
  decoding procedures); halftone and refinement coding raise
  ``NotImplementedError`` naming the gap.

Pixel convention: JBIG2 bit 1 = black. Callers map to gray samples
(pdfimage maps 1 -> 0x00, matching the CCITT ``/BlackIs1 false``
convention of DeviceGray black).

The per-pixel loops inline the MQ coder state machine from
sources/mqcoder (differential-tested against the readable classes
there); context state is two ``bytearray(1 << 16)`` tables.
"""

from __future__ import annotations

import struct

import numpy as np

from .mqcoder import NLPS, NMPS, QE, SWITCH

#: SLTP (typical prediction) context for GB template 0 (T.88 6.2.5.7)
_SLTP_CX0 = 0x9B25

#: generic-region template geometry (nominal AT pixels folded in):
#: (row y-2 span or None, row y-1 span, current-row lowest offset,
#:  SLTP context) — spans are inclusive (lo, hi) pixel offsets
_GB_TEMPLATES = {
    0: ((-2, 2), (-3, 3), -4, _SLTP_CX0),
    1: ((-1, 2), (-2, 3), -3, 0x0795),
    2: ((-1, 1), (-2, 2), -2, 0x00E5),
    3: (None, (-3, 2), -4, 0x0195),
}


def _tmpl_geometry(template: int):
    span2, span1, lo0, sltp = _GB_TEMPLATES[template]
    n2 = 0 if span2 is None else span2[1] - span2[0] + 1
    n1 = span1[1] - span1[0] + 1
    n0 = -lo0
    return span2, span1, n2, n1, n0, sltp


def _decode_generic_tmpl(data: bytes, width: int, height: int,
                         tpgdon: bool, template: int) -> np.ndarray:
    """Generic-region decode for GB templates 1-3 (T.88 6.2.5.3,
    nominal AT pixels). Cold path — real streams overwhelmingly use
    template 0, which keeps its inlined loop below."""
    from .mqcoder import MQDecoder

    span2, span1, n2, n1, n0, sltp_cx = _tmpl_geometry(template)
    w, h = int(width), int(height)
    dec = MQDecoder(data)
    icx = bytearray(1 << 16)
    mps = bytearray(1 << 16)
    mask2, mask1, mask0 = (1 << n2) - 1, (1 << n1) - 1, (1 << n0) - 1
    zeros = [0] * (w + 8)
    rows: list[list[int]] = []
    ltp = 0
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        r1 = rows[y - 1] if y >= 1 else zeros
        r2 = rows[y - 2] if y >= 2 else zeros
        if tpgdon:
            ltp ^= dec.decode(icx, mps, sltp_cx)
            if ltp:
                rows.append(r1[:] if y >= 1 else zeros[:])
                if y >= 1:
                    out[y] = out[y - 1]
                continue
        row = zeros[:]
        w2 = 0
        if span2 is not None:
            for off in range(span2[0], span2[1] + 1):
                w2 = (w2 << 1) | r2[4 + off]
        w1 = 0
        for off in range(span1[0], span1[1] + 1):
            w1 = (w1 << 1) | r1[4 + off]
        w0 = 0
        for x in range(w):
            cx = (w2 << (n1 + n0)) | (w1 << n0) | w0
            d = dec.decode(icx, mps, cx)
            row[x + 4] = d
            if span2 is not None:
                w2 = ((w2 << 1) | r2[x + 5 + span2[1]]) & mask2
            w1 = ((w1 << 1) | r1[x + 5 + span1[1]]) & mask1
            w0 = ((w0 << 1) | d) & mask0
        rows.append(row)
        if any(row):
            out[y] = np.array(row[4:w + 4], dtype=bool)
    return out


def _encode_generic_tmpl(black: np.ndarray, tpgdon: bool,
                         template: int) -> bytes:
    """Mirror of _decode_generic_tmpl (fixture writer for GB 1-3)."""
    from .mqcoder import MQEncoder

    span2, span1, n2, n1, n0, sltp_cx = _tmpl_geometry(template)
    h, w = black.shape
    enc = MQEncoder()
    icx = bytearray(1 << 16)
    mps = bytearray(1 << 16)
    mask2, mask1, mask0 = (1 << n2) - 1, (1 << n1) - 1, (1 << n0) - 1
    zeros = [0] * (w + 8)
    pad = np.zeros((h, w + 8), dtype=np.uint8)
    pad[:, 4:w + 4] = black
    padded = pad.tolist()
    prev_eq = np.zeros(h, dtype=bool)
    if h > 1:
        prev_eq[1:] = (black[1:] == black[:-1]).all(axis=1)
    prev_eq[0] = not black[0].any()
    ltp = 0
    for y in range(h):
        r1 = padded[y - 1] if y >= 1 else zeros
        r2 = padded[y - 2] if y >= 2 else zeros
        row = padded[y]
        if tpgdon:
            sltp = int(prev_eq[y]) ^ ltp
            ltp ^= sltp
            enc.encode(icx, mps, sltp_cx, sltp)
            if ltp:
                continue
        w2 = 0
        if span2 is not None:
            for off in range(span2[0], span2[1] + 1):
                w2 = (w2 << 1) | r2[4 + off]
        w1 = 0
        for off in range(span1[0], span1[1] + 1):
            w1 = (w1 << 1) | r1[4 + off]
        w0 = 0
        for x in range(w):
            d = row[x + 4]
            enc.encode(icx, mps, (w2 << (n1 + n0)) | (w1 << n0) | w0, d)
            if span2 is not None:
                w2 = ((w2 << 1) | r2[x + 5 + span2[1]]) & mask2
            w1 = ((w1 << 1) | r1[x + 5 + span1[1]]) & mask1
            w0 = ((w0 << 1) | d) & mask0
    return enc.flush()


# --- generic region: MQ-coded bitmap <-> decisions --------------------

def decode_generic(data: bytes, width: int, height: int,
                   tpgdon: bool = True, template: int = 0) -> np.ndarray:
    """MQ-decode one generic region (nominal AT pixels).

    Returns (height, width) bool, True = black. Template 0 — what
    real streams use — runs the inlined per-pixel hot loop below;
    templates 1-3 route through the parameterized cold path.
    """
    if template:
        return _decode_generic_tmpl(data, width, height, tpgdon, template)
    w, h = int(width), int(height)
    icx = bytearray(1 << 16)
    mps = bytearray(1 << 16)
    qe_t, nmps_t, nlps_t, sw_t = QE, NMPS, NLPS, SWITCH

    # --- inline INITDEC ---
    n = len(data)
    bp = 0
    c = (data[0] if n else 0xFF) << 16
    # BYTEIN
    cur = data[bp] if bp < n else 0xFF
    if cur == 0xFF:
        nxt = data[bp + 1] if bp + 1 < n else 0xFF
        if nxt > 0x8F:
            c += 0xFF00
            ct = 8
        else:
            bp += 1
            c += nxt << 9
            ct = 7
    else:
        bp += 1
        c += (data[bp] if bp < n else 0xFF) << 8
        ct = 8
    c = (c << 7) & 0xFFFFFFFF
    ct -= 7
    a = 0x8000

    zeros = [0] * (w + 8)
    rows: list[list[int]] = []  # padded rows: 4 left pads, 4 right pads
    ltp = 0
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        r1 = rows[y - 1] if y >= 1 else zeros
        r2 = rows[y - 2] if y >= 2 else zeros
        if tpgdon:
            # --- inline MQ decode of SLTP in context 0x9B25 ---
            cx = _SLTP_CX0
            i = icx[cx]
            qe = qe_t[i]
            a -= qe
            if ((c >> 16) & 0xFFFF) < qe:
                if a < qe:
                    d = mps[cx]
                    icx[cx] = nmps_t[i]
                else:
                    d = mps[cx] ^ 1
                    if sw_t[i]:
                        mps[cx] ^= 1
                    icx[cx] = nlps_t[i]
                a = qe
                renorm = 1
            else:
                c -= qe << 16
                if a & 0x8000:
                    d = mps[cx]
                    renorm = 0
                else:
                    if a < qe:
                        d = mps[cx] ^ 1
                        if sw_t[i]:
                            mps[cx] ^= 1
                        icx[cx] = nlps_t[i]
                    else:
                        d = mps[cx]
                        icx[cx] = nmps_t[i]
                    renorm = 1
            if renorm:
                while True:
                    if ct == 0:
                        cur = data[bp] if bp < n else 0xFF
                        if cur == 0xFF:
                            nxt = data[bp + 1] if bp + 1 < n else 0xFF
                            if nxt > 0x8F:
                                c += 0xFF00
                                ct = 8
                            else:
                                bp += 1
                                c += nxt << 9
                                ct = 7
                        else:
                            bp += 1
                            c += (data[bp] if bp < n else 0xFF) << 8
                            ct = 8
                    a <<= 1
                    c = (c << 1) & 0xFFFFFFFF
                    ct -= 1
                    if a & 0x8000:
                        break
            ltp ^= d
            if ltp:
                rows.append(r1[:] if y >= 1 else zeros[:])
                if y >= 1:
                    out[y] = out[y - 1]
                continue
        row = zeros[:]
        # sliding context windows (nominal AT -> contiguous):
        #   w2: row y-2, x-2..x+2 (5 bits)   w1: row y-1, x-3..x+3 (7)
        #   w0: row y,   x-4..x-1 (4 bits)
        w2 = (r2[2] << 4) | (r2[3] << 3) | (r2[4] << 2) | (r2[5] << 1) | r2[6]
        w1 = ((r1[1] << 6) | (r1[2] << 5) | (r1[3] << 4) | (r1[4] << 3)
              | (r1[5] << 2) | (r1[6] << 1) | r1[7])
        w0 = 0
        for x in range(w):
            cx = (w2 << 11) | (w1 << 4) | w0
            # --- inline MQ decode ---
            i = icx[cx]
            qe = qe_t[i]
            a -= qe
            if ((c >> 16) & 0xFFFF) < qe:
                if a < qe:
                    d = mps[cx]
                    icx[cx] = nmps_t[i]
                else:
                    d = mps[cx] ^ 1
                    if sw_t[i]:
                        mps[cx] ^= 1
                    icx[cx] = nlps_t[i]
                a = qe
                renorm = 1
            else:
                c -= qe << 16
                if a & 0x8000:
                    d = mps[cx]
                    renorm = 0
                else:
                    if a < qe:
                        d = mps[cx] ^ 1
                        if sw_t[i]:
                            mps[cx] ^= 1
                        icx[cx] = nlps_t[i]
                    else:
                        d = mps[cx]
                        icx[cx] = nmps_t[i]
                    renorm = 1
            if renorm:
                while True:
                    if ct == 0:
                        cur = data[bp] if bp < n else 0xFF
                        if cur == 0xFF:
                            nxt = data[bp + 1] if bp + 1 < n else 0xFF
                            if nxt > 0x8F:
                                c += 0xFF00
                                ct = 8
                            else:
                                bp += 1
                                c += nxt << 9
                                ct = 7
                        else:
                            bp += 1
                            c += (data[bp] if bp < n else 0xFF) << 8
                            ct = 8
                    a <<= 1
                    c = (c << 1) & 0xFFFFFFFF
                    ct -= 1
                    if a & 0x8000:
                        break
            row[x + 4] = d
            w2 = ((w2 << 1) | r2[x + 7]) & 0x1F
            w1 = ((w1 << 1) | r1[x + 8]) & 0x7F
            w0 = ((w0 << 1) | d) & 0xF
        rows.append(row)
        if any(row):
            out[y] = np.array(row[4:w + 4], dtype=bool)
    return out


def encode_generic(black: np.ndarray, tpgdon: bool = True,
                   template: int = 0) -> bytes:
    """MQ-encode one (H, W) bool bitmap (nominal AT pixels)."""
    if black.ndim != 2:
        raise ValueError("encode_generic expects a 2-D bool bitmap")
    if template:
        return _encode_generic_tmpl(black.astype(bool), tpgdon, template)
    h, w = black.shape
    icx = bytearray(1 << 16)
    mps = bytearray(1 << 16)
    qe_t, nmps_t, nlps_t, sw_t = QE, NMPS, NLPS, SWITCH

    # --- inline INITENC ---
    a = 0x8000
    c = 0
    ct = 12
    out = bytearray(b"\x00")  # dummy byte at BPST - 1

    zeros = [0] * (w + 8)
    pad = np.zeros((h, w + 8), dtype=np.uint8)
    pad[:, 4:w + 4] = black
    padded = pad.tolist()
    prev_eq = np.zeros(h, dtype=bool)
    if h > 1:
        prev_eq[1:] = (black[1:] == black[:-1]).all(axis=1)
    prev_eq[0] = not black[0].any()  # row 0 "typical" iff blank (ref row is 0)

    ltp = 0
    for y in range(h):
        r1 = padded[y - 1] if y >= 1 else zeros
        r2 = padded[y - 2] if y >= 2 else zeros
        row = padded[y]
        decisions: list[tuple[int, int]] = []
        if tpgdon:
            sltp = int(prev_eq[y]) ^ ltp
            ltp ^= sltp
            decisions.append((_SLTP_CX0, sltp))
            if ltp:
                pass  # row coded as copy of previous
        if not (tpgdon and ltp):
            w2 = ((r2[2] << 4) | (r2[3] << 3) | (r2[4] << 2) | (r2[5] << 1)
                  | r2[6])
            w1 = ((r1[1] << 6) | (r1[2] << 5) | (r1[3] << 4) | (r1[4] << 3)
                  | (r1[5] << 2) | (r1[6] << 1) | r1[7])
            w0 = 0
            for x in range(w):
                d = row[x + 4]
                decisions.append(((w2 << 11) | (w1 << 4) | w0, d))
                w2 = ((w2 << 1) | r2[x + 7]) & 0x1F
                w1 = ((w1 << 1) | r1[x + 8]) & 0x7F
                w0 = ((w0 << 1) | d) & 0xF
        for cx, d in decisions:
            # --- inline MQ encode ---
            i = icx[cx]
            qe = qe_t[i]
            if d == mps[cx]:
                a -= qe
                if a & 0x8000:
                    c += qe
                    continue
                if a < qe:
                    a = qe
                else:
                    c += qe
                icx[cx] = nmps_t[i]
            else:
                a -= qe
                if a < qe:
                    c += qe
                else:
                    a = qe
                if sw_t[i]:
                    mps[cx] ^= 1
                icx[cx] = nlps_t[i]
            while True:
                a <<= 1
                c <<= 1
                ct -= 1
                if ct == 0:
                    # --- inline BYTEOUT ---
                    if out[-1] == 0xFF:
                        out.append((c >> 20) & 0xFF)
                        c &= 0xFFFFF
                        ct = 7
                    elif c < 0x8000000:
                        out.append((c >> 19) & 0xFF)
                        c &= 0x7FFFF
                        ct = 8
                    else:
                        out[-1] += 1
                        if out[-1] == 0xFF:
                            c &= 0x7FFFFFF
                            out.append((c >> 20) & 0xFF)
                            c &= 0xFFFFF
                            ct = 7
                        else:
                            out.append((c >> 19) & 0xFF)
                            c &= 0x7FFFF
                            ct = 8
                if a & 0x8000:
                    break
    # --- FLUSH (shared tail; cold path, call the readable helper) ---
    from .mqcoder import MQEncoder

    tail = MQEncoder()
    tail.a, tail.c, tail.ct, tail.out = a, c, ct, out
    return tail.flush()


# --- embedded segment stream (PDF profile) ----------------------------

#: segment types (T.88 §7.3)
SEG_SYMBOL_DICT = 0
SEG_TEXT_IMMEDIATE = 6
SEG_TEXT_IMMEDIATE_LOSSLESS = 7
SEG_PAGE_INFO = 48
SEG_END_OF_PAGE = 49
SEG_END_OF_STRIPE = 50
SEG_END_OF_FILE = 51
SEG_PROFILES = 52
SEG_TABLES = 53
SEG_GENERIC_IMMEDIATE = 38
SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
SEG_GENERIC_INTERMEDIATE = 36
SEG_TEXT_INTERMEDIATE = 4


def _segment(num: int, seg_type: int, page: int, data: bytes,
             refs: tuple[int, ...] = ()) -> bytes:
    """One segment header + data (T.88 §7.2, 1-byte page association)."""
    if len(refs) > 4:
        raise ValueError("more than 4 referred segments needs the long form")
    head = struct.pack(">IBB", num, seg_type & 0x3F, len(refs) << 5)
    for r in refs:
        if r > 0xFF:
            raise ValueError("referred segment number > 255")
        head += struct.pack(">B", r)
    head += struct.pack(">BI", page, len(data))
    return head + data


def _region_info(w: int, h: int, x: int = 0, y: int = 0,
                 comb_op: int = 0) -> bytes:
    """Region segment information field (T.88 §7.4.1): 17 bytes."""
    return struct.pack(">IIIIB", w, h, x, y, comb_op)


#: nominal template-0 AT pixels as signed (x, y) byte pairs
_NOMINAL_AT0 = bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE])


def _nominal_at(template: int) -> bytes:
    """Nominal AT pixel bytes per GB template (T.88 6.2.5.3)."""
    if template == 0:
        return _NOMINAL_AT0
    if template == 1:
        return bytes([3, 0xFF])  # A1 = (3, -1)
    return bytes([2, 0xFF])  # templates 2 and 3: A1 = (2, -1)


def encode_jbig2(black: np.ndarray, tpgdon: bool = True,
                 template: int = 0) -> bytes:
    """(H, W) bool bitmap -> embedded JBIG2 stream (PDF profile).

    Page info + one immediate lossless generic region + end-of-page,
    exactly the shape scanner firmware writes for a full-page scan.
    """
    h, w = black.shape
    page = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    flags = (0 << 0) | (template << 1) | (int(bool(tpgdon)) << 3)  # MMR=0
    region = (
        _region_info(w, h)
        + struct.pack(">B", flags)
        + _nominal_at(template)
        + encode_generic(black.astype(bool), tpgdon=tpgdon,
                         template=template)
    )
    return (
        _segment(0, SEG_PAGE_INFO, 1, page)
        + _segment(1, SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, region)
        + _segment(2, SEG_END_OF_PAGE, 1, b"")
    )


def _parse_segments(data: bytes):
    """Yield (number, type, page, payload) from an embedded stream."""
    pos = 0
    n = len(data)
    while pos + 11 <= n:
        num, flags, rts = struct.unpack_from(">IBB", data, pos)
        pos += 6
        seg_type = flags & 0x3F
        count = rts >> 5
        if count == 7:  # long form: 4-byte count + retain bitmap
            count = struct.unpack_from(">I", data, pos - 1)[0] & 0x1FFFFFFF
            pos += 3 + (count + 8) // 8
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        if flags & 0x40:  # 4-byte page association
            page = struct.unpack_from(">I", data, pos)[0]
            pos += 4
        else:
            page = data[pos]
            pos += 1
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise NotImplementedError("JBIG2 unknown-length segment")
        yield num, seg_type, page, data[pos:pos + length]
        pos += length


def _decode_region_payload(payload: bytes, page: np.ndarray) -> None:
    """Immediate generic region payload -> composed onto the page."""
    w, h, x, y, comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = payload[17]
    pos = 18
    if flags & 0x01:  # MMR
        from .ccittcodec import decode_g4

        region = decode_g4(payload[pos:], w, h)
    else:
        template = (flags >> 1) & 0x03
        n_at = 8 if template == 0 else 2
        at = payload[pos:pos + n_at]
        pos += n_at
        if at != _nominal_at(template):
            raise NotImplementedError("JBIG2 non-nominal AT pixels")
        region = decode_generic(payload[pos:], w, h,
                                tpgdon=bool(flags & 0x08),
                                template=template)
    ph, pw = page.shape
    y1, x1 = min(y + h, ph), min(x + w, pw)
    view = region[: y1 - y, : x1 - x]
    if comb & 0x07 in (0, 2):  # OR / XOR start from 0 page: both OR-like here
        page[y:y1, x:x1] |= view
    else:  # REPLACE / AND / XNOR collapse to replace for our page model
        page[y:y1, x:x1] = view


def decode_jbig2(data: bytes, globals_data: bytes = b"",
                 width: int | None = None,
                 height: int | None = None) -> np.ndarray:
    """Embedded JBIG2 stream -> (H, W) bool page, True = black.

    ``globals_data`` is the optional ``/JBIG2Globals`` stream (shared
    segments, processed first). Symbol/text segments route through
    jbig2symbol; halftone/refinement raise ``NotImplementedError``.
    """
    page: np.ndarray | None = None
    symbols: list[np.ndarray] = []
    for num, seg_type, seg_page, payload in _parse_segments(
        globals_data + data
    ):
        if seg_type == SEG_PAGE_INFO:
            w, h = struct.unpack_from(">II", payload, 0)
            if h == 0xFFFFFFFF:  # unknown height: trust the PDF /Height
                if height is None:
                    raise ValueError("JBIG2 page height unknown")
                h = height
            flags = payload[16] if len(payload) > 16 else 0
            page = np.full((h, w), bool(flags & 0x04), dtype=bool)
        elif seg_type in (SEG_GENERIC_IMMEDIATE,
                          SEG_GENERIC_IMMEDIATE_LOSSLESS):
            if page is None:
                w, h = struct.unpack_from(">II", payload, 0)
                page = np.zeros((height or h, width or w), dtype=bool)
            _decode_region_payload(payload, page)
        elif seg_type == SEG_SYMBOL_DICT:
            from .jbig2symbol import decode_symbol_dict

            symbols.extend(decode_symbol_dict(payload))
        elif seg_type in (SEG_TEXT_IMMEDIATE, SEG_TEXT_IMMEDIATE_LOSSLESS):
            from .jbig2symbol import decode_text_region

            if page is None:
                if width is None or height is None:
                    raise ValueError("JBIG2 text region before page info")
                page = np.zeros((height, width), dtype=bool)
            decode_text_region(payload, symbols, page)
        elif seg_type in (SEG_END_OF_PAGE, SEG_END_OF_STRIPE,
                          SEG_END_OF_FILE, SEG_PROFILES, SEG_TABLES):
            continue
        elif seg_type == SEG_GENERIC_INTERMEDIATE or seg_type == SEG_TEXT_INTERMEDIATE:
            raise NotImplementedError("JBIG2 intermediate (auxiliary) regions")
        elif seg_type in range(20, 24) or seg_type in range(40, 44):
            raise NotImplementedError(
                "JBIG2 halftone/refinement coding (rare outside test suites)"
            )
        # other segment types (extensions, 62) are skippable by spec
    if page is None:
        raise ValueError("JBIG2 stream contains no page")
    return page
