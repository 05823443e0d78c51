"""JBIG2 symbol-dictionary + text-region coding (T.88 §6.4/6.5).

The mode real scanner firmware and Acrobat actually emit: glyph-like
connected components are collected into a shared symbol dictionary
(each bitmap MQ-coded once) and pages become lists of (symbol id, x,
y) placements — 10-50x smaller than generic coding on text pages, and
proportionally faster to decode since repeated glyphs cost one
dictionary entry plus cheap placement integers.

Implemented from the spec, both directions:

- the **integer arithmetic decoding procedures** (Annex A): IADH /
  IADW / IAEX / IADT / IAFS / IADS / IAIT share one prefix-bucket
  state machine (sign + 2/4/6/8/12/32-bit buckets, 512-entry context
  tree), IAID is a flat SBSYMCODELEN-deep context tree;
- **symbol dictionary** (§6.5): height classes with IADH/IADW deltas,
  per-symbol bitmaps coded as generic regions over MQ/GB state SHARED
  across the whole dictionary, IAEX export runs;
- **text region** (§6.4): strip loop (IADT strips, IAFS first-S,
  IADS subsequent-S with OOB strip end, IAIT intra-strip T), the four
  REFCORNER placements and TRANSPOSED, OR-composition onto the page;
- the **symbolic encoder**: 8-connected component extraction
  (row-run union-find), exact-bitmap symbol dedupe, oversized
  components routed to a residual generic region — the jbig2enc
  -symbol shape, so fixtures exercise the same stream structure
  scanners produce.

Out of scope (honest ``NotImplementedError`` in the callers):
Huffman-coded (SDHUFF/SBHUFF) variants and refinement/aggregate
coding — rare outside conformance suites; arithmetic coding is what
encoders emit.

Pixel convention matches jbig2codec: bit 1 = black.
"""

from __future__ import annotations

import struct

import numpy as np

from .mqcoder import MQDecoder, MQEncoder

#: text/symbol flags bit layout constants
_REFCORNER_BL, _REFCORNER_TL, _REFCORNER_BR, _REFCORNER_TR = 0, 1, 2, 3


# --- Annex A: integer arithmetic decoding ------------------------------


class IntCtx:
    """One IAx procedure's adaptive state (512-entry context tree;
    IAID passes ``2 ** (codelen + 1)`` for its flat id tree)."""

    __slots__ = ("icx", "mps")

    def __init__(self, size: int = 512):
        self.icx = bytearray(size)
        self.mps = bytearray(size)


#: value buckets: (prefix bits after sign, value bits, offset)
_INT_BUCKETS = ((0, 2, 0), (1, 4, 4), (2, 6, 20), (3, 8, 84),
                (4, 12, 340), (5, 32, 4436))

OOB = object()  # out-of-band marker (S=1, V=0)


def decode_int(dec: MQDecoder, ctx: IntCtx):
    """IAx decode: returns int or OOB (T.88 A.2)."""
    icx, mps = ctx.icx, ctx.mps
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(icx, mps, prev)
        prev = ((prev << 1) | b) if prev < 256 else \
            ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    if bit() == 0:
        nbits, offset = 2, 0
    elif bit() == 0:
        nbits, offset = 4, 4
    elif bit() == 0:
        nbits, offset = 6, 20
    elif bit() == 0:
        nbits, offset = 8, 84
    elif bit() == 0:
        nbits, offset = 12, 340
    else:
        nbits, offset = 32, 4436
    v = 0
    for _ in range(nbits):
        v = (v << 1) | bit()
    v += offset
    if s and v == 0:
        return OOB
    return -v if s else v


def encode_int(enc: MQEncoder, ctx: IntCtx, value) -> None:
    """IAx encode: int or OOB, mirror of decode_int."""
    icx, mps = ctx.icx, ctx.mps
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(icx, mps, prev, b)
        prev = ((prev << 1) | b) if prev < 256 else \
            ((((prev << 1) | b) & 511) | 256)

    if value is OOB:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    for i, (plen, nbits, offset) in enumerate(_INT_BUCKETS):
        top = offset + (1 << nbits) - 1
        if v <= top or i == len(_INT_BUCKETS) - 1:
            for _ in range(plen):
                bit(1)
            if i < len(_INT_BUCKETS) - 1:
                bit(0)
            rel = v - offset
            for k in range(nbits - 1, -1, -1):
                bit((rel >> k) & 1)
            return
    raise AssertionError("unreachable")


def decode_iaid(dec: MQDecoder, ctx: IntCtx, codelen: int) -> int:
    """IAID decode: symbol id, ``codelen``-deep context tree (A.3)."""
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | dec.decode(ctx.icx, ctx.mps, prev)
    return prev - (1 << codelen)


def encode_iaid(enc: MQEncoder, ctx: IntCtx, codelen: int, value: int) -> None:
    prev = 1
    for k in range(codelen - 1, -1, -1):
        b = (value >> k) & 1
        enc.encode(ctx.icx, ctx.mps, prev, b)
        prev = (prev << 1) | b
    assert prev - (1 << codelen) == value


def _symcodelen(nsyms: int) -> int:
    return max(1, (max(nsyms - 1, 1)).bit_length() if nsyms > 1 else 1)


# --- shared-state generic bitmap coding (for symbol bitmaps) -----------


def _decode_bitmap(dec: MQDecoder, gb_icx: bytearray, gb_mps: bytearray,
                   w: int, h: int) -> np.ndarray:
    """Generic-region decode (template 0, nominal AT, no TPGDON) over a
    SHARED MQ decoder + GB context state — the symbol-dictionary rule
    (T.88 6.5.8.1: all symbols of a dictionary share one GB state)."""
    zeros = [0] * (w + 8)
    rows: list[list[int]] = []
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        r1 = rows[y - 1] if y >= 1 else zeros
        r2 = rows[y - 2] if y >= 2 else zeros
        row = zeros[:]
        w2 = (r2[2] << 4) | (r2[3] << 3) | (r2[4] << 2) | (r2[5] << 1) | r2[6]
        w1 = ((r1[1] << 6) | (r1[2] << 5) | (r1[3] << 4) | (r1[4] << 3)
              | (r1[5] << 2) | (r1[6] << 1) | r1[7])
        w0 = 0
        for x in range(w):
            d = dec.decode(gb_icx, gb_mps, (w2 << 11) | (w1 << 4) | w0)
            row[x + 4] = d
            w2 = ((w2 << 1) | r2[x + 7]) & 0x1F
            w1 = ((w1 << 1) | r1[x + 8]) & 0x7F
            w0 = ((w0 << 1) | d) & 0xF
        rows.append(row)
        if any(row):
            out[y] = np.array(row[4:w + 4], dtype=bool)
    return out


def _encode_bitmap(enc: MQEncoder, gb_icx: bytearray, gb_mps: bytearray,
                   bitmap: np.ndarray) -> None:
    h, w = bitmap.shape
    zeros = [0] * (w + 8)
    pad = np.zeros((h, w + 8), dtype=np.uint8)
    pad[:, 4:w + 4] = bitmap
    padded = pad.tolist()
    for y in range(h):
        r1 = padded[y - 1] if y >= 1 else zeros
        r2 = padded[y - 2] if y >= 2 else zeros
        row = padded[y]
        w2 = (r2[2] << 4) | (r2[3] << 3) | (r2[4] << 2) | (r2[5] << 1) | r2[6]
        w1 = ((r1[1] << 6) | (r1[2] << 5) | (r1[3] << 4) | (r1[4] << 3)
              | (r1[5] << 2) | (r1[6] << 1) | r1[7])
        w0 = 0
        for x in range(w):
            d = row[x + 4]
            enc.encode(gb_icx, gb_mps, (w2 << 11) | (w1 << 4) | w0, d)
            w2 = ((w2 << 1) | r2[x + 7]) & 0x1F
            w1 = ((w1 << 1) | r1[x + 8]) & 0x7F
            w0 = ((w0 << 1) | d) & 0xF


# --- symbol dictionary segment (§6.5 / §7.4.3) --------------------------


def decode_symbol_dict(payload: bytes) -> list[np.ndarray]:
    """Symbol dictionary segment payload -> exported symbol bitmaps."""
    (flags,) = struct.unpack_from(">H", payload, 0)
    if flags & 0x01:
        raise NotImplementedError("JBIG2 Huffman-coded symbol dictionary")
    if flags & 0x02:
        raise NotImplementedError("JBIG2 refinement/aggregate symbol coding")
    template = (flags >> 10) & 0x03
    if template != 0:
        raise NotImplementedError(f"JBIG2 symbol dict GB template {template}")
    pos = 2
    at = payload[pos:pos + 8]
    pos += 8
    from .jbig2codec import _NOMINAL_AT0

    if at != _NOMINAL_AT0:
        raise NotImplementedError("JBIG2 non-nominal AT pixels")
    numex, numnew = struct.unpack_from(">II", payload, pos)
    pos += 8
    dec = MQDecoder(payload[pos:])
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    gb_icx, gb_mps = bytearray(1 << 16), bytearray(1 << 16)
    syms: list[np.ndarray] = []
    height = 0
    while len(syms) < numnew:
        dh = decode_int(dec, iadh)
        if dh is OOB:
            raise ValueError("JBIG2 symbol dict: OOB height delta")
        height += dh
        width = 0
        while True:
            dw = decode_int(dec, iadw)
            if dw is OOB:
                break
            width += dw
            if width <= 0 or height <= 0 or len(syms) >= numnew:
                raise ValueError("JBIG2 symbol dict: bad symbol size")
            syms.append(_decode_bitmap(dec, gb_icx, gb_mps, width, height))
    # export flags: alternating skip/export runs over input+new symbols
    exported: list[np.ndarray] = []
    idx, cur = 0, 0
    while idx < len(syms) and len(exported) < numex:
        run = decode_int(dec, iaex)
        if run is OOB or run < 0:
            raise ValueError("JBIG2 symbol dict: bad export run")
        if cur:
            exported.extend(syms[idx:idx + run])
        idx += run
        cur ^= 1
    return exported


def encode_symbol_dict(symbols: list[np.ndarray]) -> bytes:
    """Symbols (sorted by (height, width)) -> dictionary payload."""
    order = sorted(range(len(symbols)),
                   key=lambda i: (symbols[i].shape[0], symbols[i].shape[1]))
    assert order == list(range(len(symbols))), "symbols must be pre-sorted"
    enc = MQEncoder()
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    gb_icx, gb_mps = bytearray(1 << 16), bytearray(1 << 16)
    height = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        encode_int(enc, iadh, h - height)
        height = h
        width = 0
        while i < len(symbols) and symbols[i].shape[0] == h:
            w = symbols[i].shape[1]
            encode_int(enc, iadw, w - width)
            width = w
            _encode_bitmap(enc, gb_icx, gb_mps, symbols[i])
            i += 1
        encode_int(enc, iadw, OOB)
    # export all new symbols: skip 0, export N
    encode_int(enc, iaex, 0)
    encode_int(enc, iaex, len(symbols))
    from .jbig2codec import _NOMINAL_AT0

    head = struct.pack(">H", 0) + _NOMINAL_AT0 + struct.pack(
        ">II", len(symbols), len(symbols)
    )
    return head + enc.flush()


# --- text region segment (§6.4 / §7.4.4) --------------------------------


def decode_text_region(payload: bytes, symbols: list[np.ndarray],
                       page: np.ndarray) -> None:
    """Text region payload -> symbol instances composed onto the page."""
    w, h, x0, y0, _comb = struct.unpack_from(">IIIIB", payload, 0)
    (flags,) = struct.unpack_from(">H", payload, 17)
    if flags & 0x01:
        raise NotImplementedError("JBIG2 Huffman-coded text region")
    if flags & 0x02:
        raise NotImplementedError("JBIG2 refined text region")
    log2strips = (flags >> 2) & 0x03
    strips = 1 << log2strips
    refcorner = (flags >> 4) & 0x03
    transposed = (flags >> 6) & 0x01
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    (ninstances,) = struct.unpack_from(">I", payload, 19)
    dec = MQDecoder(payload[23:])
    codelen = _symcodelen(len(symbols))
    iadt, iafs, iads, iait = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iaid = IntCtx(1 << (codelen + 1))
    region = np.zeros((h, w), dtype=bool)

    stript = -(decode_int(dec, iadt)) * strips
    firsts = 0
    placed = 0
    while placed < ninstances:
        dt = decode_int(dec, iadt)
        if dt is OOB:
            raise ValueError("JBIG2 text region: OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = decode_int(dec, iafs)
                if dfs is OOB:
                    raise ValueError("JBIG2 text region: OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = decode_int(dec, iads)
                if ids is OOB:
                    break  # end of strip
                curs += ids + dsoffset
            curt = decode_int(dec, iait) if strips > 1 else 0
            ti = stript + curt
            sid = decode_iaid(dec, iaid, codelen)
            if sid >= len(symbols):
                raise ValueError("JBIG2 text region: symbol id out of range")
            sym = symbols[sid]
            hi, wi = sym.shape
            if transposed:
                # S axis is vertical, T horizontal
                ys = curs
                xs = ti if refcorner in (_REFCORNER_TL, _REFCORNER_BL) \
                    else ti - wi + 1
                curs += hi - 1
            else:
                xs = curs
                ys = ti if refcorner in (_REFCORNER_TL, _REFCORNER_TR) \
                    else ti - hi + 1
                curs += wi - 1
            ye, xe = min(ys + hi, h), min(xs + wi, w)
            if ys < ye and xs < xe and ys >= 0 and xs >= 0:
                region[ys:ye, xs:xe] |= sym[:ye - ys, :xe - xs]
            placed += 1
            if placed == ninstances:
                break
    ph, pw = page.shape
    y1, x1 = min(y0 + h, ph), min(x0 + w, pw)
    page[y0:y1, x0:x1] |= region[:y1 - y0, :x1 - x0]


def encode_text_region_w(instances: list[tuple[int, int, int, int]],
                         nsyms: int, region_w: int,
                         region_h: int) -> bytes:
    """(sid, x, y, sym_width) TOPLEFT placements -> text region payload."""
    inst = sorted(instances, key=lambda t: (t[2], t[1]))
    enc = MQEncoder()
    codelen = _symcodelen(nsyms)
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iaid = IntCtx(1 << (codelen + 1))
    encode_int(enc, iadt, 0)
    stript = 0
    firsts = 0
    i = 0
    while i < len(inst):
        y = inst[i][2]
        encode_int(enc, iadt, y - stript)
        stript = y
        row_end = i
        while row_end < len(inst) and inst[row_end][2] == y:
            row_end += 1
        curs = None
        for j in range(i, row_end):
            sid, x, _, sw = inst[j]
            if curs is None:
                encode_int(enc, iafs, x - firsts)
                firsts = x
            else:
                encode_int(enc, iads, x - curs)
            encode_iaid(enc, iaid, codelen, sid)
            curs = x + sw - 1
        encode_int(enc, iads, OOB)
        i = row_end
    # flags: arith, no refine, strips=1, REFCORNER=TL(1), no transpose,
    # OR comb, default pixel 0, DSOFFSET 0, rtemplate 0
    flags = (_REFCORNER_TL << 4)
    head = (struct.pack(">IIIIB", region_w, region_h, 0, 0, 0)
            + struct.pack(">H", flags)
            + struct.pack(">I", len(inst)))
    return head + enc.flush()


# --- symbolic encoder: components -> dictionary + placements -----------


def connected_components(black: np.ndarray,
                         max_side: int = 96) -> tuple[list, np.ndarray]:
    """8-connected components via row-run union-find.

    Returns (components, residual): components is a list of
    (bitmap, x, y) with sides <= ``max_side``; oversized components
    stay in the residual bitmap (coded as a generic region, the
    jbig2enc fallback for line art).
    """
    h, w = black.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # row runs: (y, x_start, x_end, label)
    runs: list[tuple[int, int, int, int]] = []
    prev_row: list[int] = []  # indices into runs for row y-1
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:w + 1] = black
    diff = np.diff(padded, axis=1)
    for y in range(h):
        starts = np.flatnonzero(diff[y] == 1)
        ends = np.flatnonzero(diff[y] == -1)
        cur_row: list[int] = []
        pi = 0
        for s, e in zip(starts.tolist(), ends.tolist()):
            label = len(parent)
            parent.append(label)
            idx = len(runs)
            runs.append((y, s, e, label))
            # 8-connectivity: runs are [s, e) pixel spans; a previous-row
            # run [ps, pe) touches iff ps <= e and pe >= s (diagonal slack
            # of one column on each side)
            while pi < len(prev_row) and runs[prev_row[pi]][2] < s:
                pi += 1  # wholly left of every remaining current run
            pj = pi
            while pj < len(prev_row):
                _, ps, pe, plabel = runs[prev_row[pj]]
                if ps > e:
                    break
                if pe >= s:
                    union(label, plabel)
                pj += 1
            cur_row.append(idx)
        prev_row = cur_row
    # gather runs per root
    groups: dict[int, list[int]] = {}
    for idx, (y, s, e, label) in enumerate(runs):
        groups.setdefault(find(label), []).append(idx)
    comps: list[tuple[np.ndarray, int, int]] = []
    residual = np.zeros_like(black)
    for root, idxs in groups.items():
        ys = [runs[i][0] for i in idxs]
        xs0 = [runs[i][1] for i in idxs]
        xs1 = [runs[i][2] for i in idxs]
        y0, y1 = min(ys), max(ys) + 1
        x0, x1 = min(xs0), max(xs1)
        bw, bh = x1 - x0, y1 - y0
        if bw > max_side or bh > max_side:
            for i in idxs:
                ry, rs, re, _ = runs[i]
                residual[ry, rs:re] = True
            continue
        bm = np.zeros((bh, bw), dtype=bool)
        for i in idxs:
            ry, rs, re, _ = runs[i]
            bm[ry - y0, rs - x0:re - x0] = True
        comps.append((bm, x0, y0))
    comps.sort(key=lambda t: (t[2], t[1]))
    return comps, residual


def encode_jbig2_symbolic(black: np.ndarray) -> bytes:
    """(H, W) bool page -> embedded JBIG2 stream in SYMBOL mode:
    page info + symbol dictionary + text region (+ residual generic
    region for oversized components) + end-of-page."""
    from .jbig2codec import (
        SEG_END_OF_PAGE,
        SEG_PAGE_INFO,
        SEG_SYMBOL_DICT,
        SEG_TEXT_IMMEDIATE_LOSSLESS,
        _segment,
        encode_generic,
        _region_info,
        _NOMINAL_AT0,
    )

    h, w = black.shape
    comps, residual = connected_components(black.astype(bool))
    # exact-bitmap dedupe
    uniq: dict[bytes, int] = {}
    sym_list: list[np.ndarray] = []
    placements: list[tuple[int, int, int, int]] = []
    for bm, x, y in comps:
        key = bm.shape[0].to_bytes(2, "big") + bm.shape[1].to_bytes(2, "big") \
            + np.packbits(bm).tobytes()
        sid = uniq.get(key)
        if sid is None:
            sid = len(sym_list)
            uniq[key] = sid
            sym_list.append(bm)
        placements.append((sid, x, y, bm.shape[1]))
    # dictionary order: (height, width); remap placement ids
    order = sorted(range(len(sym_list)),
                   key=lambda i: (sym_list[i].shape[0], sym_list[i].shape[1]))
    remap = {old: new for new, old in enumerate(order)}
    sym_sorted = [sym_list[i] for i in order]
    placements = [(remap[sid], x, y, sw) for sid, x, y, sw in placements]

    page = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    out = _segment(0, SEG_PAGE_INFO, 1, page)
    nseg = 1
    if sym_sorted:
        out += _segment(nseg, SEG_SYMBOL_DICT, 1,
                        encode_symbol_dict(sym_sorted))
        dict_seg = nseg
        nseg += 1
        out += _segment(
            nseg, SEG_TEXT_IMMEDIATE_LOSSLESS, 1,
            encode_text_region_w(placements, len(sym_sorted), w, h),
            refs=(dict_seg,),
        )
        nseg += 1
    if residual.any():
        from .jbig2codec import SEG_GENERIC_IMMEDIATE_LOSSLESS

        region = (_region_info(w, h) + struct.pack(">B", 0x08)
                  + _NOMINAL_AT0 + encode_generic(residual))
        out += _segment(nseg, SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, region)
        nseg += 1
    out += _segment(nseg, SEG_END_OF_PAGE, 1, b"")
    return out
