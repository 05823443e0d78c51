"""Font-rendered PDF rasterization: TrueType glyphs -> pixel pages.

The reference rasterizes ANY pdf via pdfium (io/pdf.py:16-43). The
remaining in-container gap after sources/pdftext (native text layers)
and sources/pdfimage (scanned image-per-page PDFs) was the PDF that
DRAWS text with embedded fonts — this module closes it with pure
stdlib + numpy:

- a TrueType parser: sfnt table directory, ``head``/``maxp``/``loca``/
  ``glyf`` (simple AND composite glyphs, short/long loca),
  ``cmap`` format 4, ``hhea``/``hmtx`` advances;
- a glyph rasterizer: quadratic-Bézier outlines (implied on-curve
  midpoints per the TrueType spec) flattened and filled with the
  NONZERO WINDING rule sampled at pixel centers — integer-rectangle
  contours therefore fill pixel-exactly;
- a content-stream interpreter for the text operators
  (BT/ET, Tf, Td/TD/TL/T*/Tm, Tj/TJ/'/") over pages discovered with
  sources/pdfimage's object scanner, glyph codes resolved through the
  font's own cmap (the honest path for SUBSET fonts whose codes are
  private — exactly the PDFs whose "text layer" is garbage and which
  therefore must be OCRed);
- a TTF WRITER (``build_ttf``) and a font-embedded PDF writer
  (``make_truetype_pdf``) whose fixture font's glyphs are the engine's
  own pixel glyphs as rectangle outlines — rendering at the matching
  size reproduces the procedural font bit-exactly, so the full OCR
  pipeline round-trips byte-exact ground truth over a REAL
  embedded-font PDF.

Bare-CFF (``/FontFile3 /Subtype /Type1C``) font programs render
through the Type 2 charstring interpreter in sources/cfffont, and
original eexec-encrypted Type 1 programs (``/FontFile``) through
sources/type1font — both duck-type TrueTypeFont's rendering surface,
so every single-byte embedded-font technology a PDF can carry now
rasterizes in-container.

Composite fonts (``/Type0 /Identity-H`` over a ``CIDFontType2``
descendant — the dominant modern subset-producer form, whose 2-byte
codes are glyph ids and whose text layer is therefore garbage by
construction) render through the same TrueType machinery with the
CID width model (/DW, /W).

Rotated text matrices (``Tm`` whose 2x2 is orthogonal with uniform
scale — the rotated-page producer case) render exactly: a 90-degree
page is the bit-exact rot90 of its unrotated twin.

Out of scope (NotImplementedError naming the gap): non-Identity CMap
encodings, CIDFontType0 (CID-keyed CFF), stream /CIDToGIDMap, sheared
text matrices.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

from .pdffilters import decode_stream
from .pdfimage import _page_order, _scan_objects
from .pdftext import _LENGTH_RE  # noqa: F401  (shared regex family)

# --------------------------------------------------------------- TTF parser


class TrueTypeFont:
    """Minimal TrueType font: glyph outlines + cmap + advances."""

    def __init__(self, data: bytes):
        self.data = data
        (n_tables,) = struct.unpack(">H", data[4:6])
        self.tables: dict[bytes, tuple[int, int]] = {}
        for i in range(n_tables):
            off = 12 + 16 * i
            tag = data[off : off + 4]
            t_off, t_len = struct.unpack(">II", data[off + 8 : off + 16])
            self.tables[tag] = (t_off, t_len)
        head = self._table(b"head")
        self.upem = struct.unpack(">H", head[18:20])[0]
        self.loca_long = struct.unpack(">h", head[50:52])[0] == 1
        maxp = self._table(b"maxp")
        self.num_glyphs = struct.unpack(">H", maxp[4:6])[0]
        loca = self._table(b"loca")
        if self.loca_long:
            self.loca = np.frombuffer(
                loca[: 4 * (self.num_glyphs + 1)], ">u4"
            ).astype(np.int64)
        else:
            self.loca = (
                np.frombuffer(loca[: 2 * (self.num_glyphs + 1)], ">u2").astype(
                    np.int64
                )
                * 2
            )
        self.glyf = self._table(b"glyf")
        hhea = self._table(b"hhea")
        n_hmetrics = struct.unpack(">H", hhea[34:36])[0]
        hmtx = self._table(b"hmtx")
        adv = np.frombuffer(hmtx[: 4 * n_hmetrics], ">u2")[::2].astype(np.int64)
        # trailing glyphs reuse the last advance (spec)
        if n_hmetrics < self.num_glyphs and len(adv):
            adv = np.concatenate(
                [adv, np.full(self.num_glyphs - n_hmetrics, adv[-1], np.int64)]
            )
        self.advances = adv
        self.cmap = self._parse_cmap()
        self._contour_cache: dict[int, list] = {}

    def _table(self, tag: bytes) -> bytes:
        off, length = self.tables[tag]
        return self.data[off : off + length]

    def _parse_cmap(self) -> dict[int, int]:
        cm = self._table(b"cmap")
        n = struct.unpack(">H", cm[2:4])[0]
        sub_off = None
        for i in range(n):
            plat, enc, off = struct.unpack(">HHI", cm[4 + 8 * i : 12 + 8 * i])
            if (plat, enc) in ((3, 1), (0, 3), (3, 0)) or sub_off is None:
                sub_off = off
        sub = cm[sub_off:]
        fmt = struct.unpack(">H", sub[:2])[0]
        if fmt == 0:  # byte encoding table
            return {c: sub[6 + c] for c in range(256) if sub[6 + c]}
        if fmt == 6:  # trimmed table
            first, cnt = struct.unpack(">HH", sub[6:10])
            gids = np.frombuffer(sub[10 : 10 + 2 * cnt], ">u2")
            return {first + i: int(g) for i, g in enumerate(gids) if g}
        if fmt == 12:  # segmented coverage (32-bit — the modern form)
            ngroups = struct.unpack(">I", sub[12:16])[0]
            groups = np.frombuffer(sub[16 : 16 + 12 * ngroups], ">u4").reshape(
                -1, 3
            )
            out12: dict[int, int] = {}
            for s0, e0, g0 in groups.tolist():
                for code in range(s0, e0 + 1):
                    out12[code] = g0 + (code - s0)
            return out12
        if fmt != 4:
            raise NotImplementedError(
                f"cmap format {fmt} (formats 0/4/6/12 supported)"
            )
        seg_x2 = struct.unpack(">H", sub[6:8])[0]
        segs = seg_x2 // 2
        end = np.frombuffer(sub[14 : 14 + seg_x2], ">u2")
        start = np.frombuffer(sub[16 + seg_x2 : 16 + 2 * seg_x2], ">u2")
        delta = np.frombuffer(sub[16 + 2 * seg_x2 : 16 + 3 * seg_x2], ">i2")
        rng_off_pos = 16 + 3 * seg_x2
        rng = np.frombuffer(sub[rng_off_pos : rng_off_pos + seg_x2], ">u2")
        out: dict[int, int] = {}
        for s in range(segs):
            for code in range(int(start[s]), int(end[s]) + 1):
                if code == 0xFFFF:
                    continue
                if rng[s] == 0:
                    gid = (code + int(delta[s])) & 0xFFFF
                else:
                    idx = rng_off_pos + 2 * s + int(rng[s]) + 2 * (
                        code - int(start[s])
                    )
                    gid = struct.unpack(">H", sub[idx : idx + 2])[0]
                    if gid:
                        gid = (gid + int(delta[s])) & 0xFFFF
                if gid:
                    out[code] = gid
        return out

    def glyph_contours(self, gid: int) -> list[list[tuple[float, float, bool]]]:
        """Outline of one glyph as contours of (x, y, on_curve) points
        in font units — composites resolved recursively; parsed once
        per gid (text runs revisit the same glyphs constantly)."""
        hit = self._contour_cache.get(gid)
        if hit is not None:
            return hit
        out = self._parse_glyph(gid)
        self._contour_cache[gid] = out
        return out

    def _parse_glyph(self, gid: int):
        start, end = int(self.loca[gid]), int(self.loca[gid + 1])
        if end <= start:
            return []
        g = self.glyf[start:end]
        n_cont = struct.unpack(">h", g[:2])[0]
        if n_cont >= 0:
            return self._simple_contours(g, n_cont)
        # composite glyph
        contours: list[list[tuple[float, float, bool]]] = []
        pos = 10
        while True:
            flags, comp_gid = struct.unpack(">HH", g[pos : pos + 4])
            pos += 4
            if flags & 0x0001:  # ARG_1_AND_2_ARE_WORDS
                dx, dy = struct.unpack(">hh", g[pos : pos + 4])
                pos += 4
            else:
                dx, dy = struct.unpack(">bb", g[pos : pos + 2])
                pos += 2
            if not flags & 0x0002:  # ARGS_ARE_XY_VALUES required here
                raise NotImplementedError("composite point-matching args")
            sx = sy = 1.0
            b01 = c10 = 0.0  # off-diagonal terms (2x2 transforms)
            if flags & 0x0008:  # WE_HAVE_A_SCALE (F2Dot14)
                sx = sy = struct.unpack(">h", g[pos : pos + 2])[0] / 16384.0
                pos += 2
            elif flags & 0x0040:  # X_AND_Y_SCALE
                sx = struct.unpack(">h", g[pos : pos + 2])[0] / 16384.0
                sy = struct.unpack(">h", g[pos + 2 : pos + 4])[0] / 16384.0
                pos += 4
            elif flags & 0x0080:  # WE_HAVE_A_TWO_BY_TWO (a b c d F2Dot14)
                a2, b2, c2, d2 = struct.unpack(">hhhh", g[pos : pos + 8])
                pos += 8
                sx, b01 = a2 / 16384.0, b2 / 16384.0
                c10, sy = c2 / 16384.0, d2 / 16384.0
            for cont in self.glyph_contours(comp_gid):
                contours.append(
                    [
                        (x * sx + y * c10 + dx, x * b01 + y * sy + dy, on)
                        for x, y, on in cont
                    ]
                )
            if not flags & 0x0020:  # MORE_COMPONENTS
                break
        return contours

    @staticmethod
    def _simple_contours(g: bytes, n_cont: int):
        end_pts = np.frombuffer(g[10 : 10 + 2 * n_cont], ">u2").astype(int)
        n_pts = int(end_pts[-1]) + 1 if n_cont else 0
        pos = 10 + 2 * n_cont
        (ins_len,) = struct.unpack(">H", g[pos : pos + 2])
        pos += 2 + ins_len
        # flags with repeat expansion
        flags: list[int] = []
        while len(flags) < n_pts:
            f = g[pos]
            pos += 1
            flags.append(f)
            if f & 0x08:  # REPEAT
                rep = g[pos]
                pos += 1
                flags.extend([f] * rep)
        xs: list[int] = []
        x = 0
        for f in flags:
            if f & 0x02:  # x short
                dx = g[pos]
                pos += 1
                x += dx if f & 0x10 else -dx
            elif not f & 0x10:  # long delta
                x += struct.unpack(">h", g[pos : pos + 2])[0]
                pos += 2
            xs.append(x)
        ys: list[int] = []
        y = 0
        for f in flags:
            if f & 0x04:  # y short
                dy = g[pos]
                pos += 1
                y += dy if f & 0x20 else -dy
            elif not f & 0x20:
                y += struct.unpack(">h", g[pos : pos + 2])[0]
                pos += 2
            ys.append(y)
        contours = []
        s = 0
        for e in end_pts:
            contours.append(
                [
                    (float(xs[i]), float(ys[i]), bool(flags[i] & 0x01))
                    for i in range(s, int(e) + 1)
                ]
            )
            s = int(e) + 1
        return contours


# ------------------------------------------------------------- rasterizer


def _contour_segments(
    contour: list[tuple[float, float, bool]], flatten: int = 8
) -> np.ndarray:
    """One TrueType contour -> (S, 4) line segments [x0 y0 x1 y1],
    quadratic Béziers flattened; consecutive off-curve points get the
    spec's implied on-curve midpoints."""
    if not contour:
        return np.zeros((0, 4))
    # normalize: expand implied midpoints, start on an on-curve point
    pts = list(contour)
    if not any(on for _, _, on in pts):
        # all-off-curve contour: start from midpoint of last/first
        x0 = (pts[0][0] + pts[-1][0]) / 2.0
        y0 = (pts[0][1] + pts[-1][1]) / 2.0
        pts = [(x0, y0, True)] + pts
    else:
        k = next(i for i, p in enumerate(pts) if p[2])
        pts = pts[k:] + pts[:k]
    expanded: list[tuple[float, float, bool]] = []
    for i, p in enumerate(pts):
        expanded.append(p)
        q = pts[(i + 1) % len(pts)]
        if not p[2] and not q[2]:
            expanded.append(((p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0, True))
    segs: list[tuple[float, float, float, float]] = []
    i = 0
    n = len(expanded)
    ts = np.linspace(0.0, 1.0, flatten + 1)
    while i < n:
        p0 = expanded[i]
        p1 = expanded[(i + 1) % n]
        if p1[2]:  # straight edge
            segs.append((p0[0], p0[1], p1[0], p1[1]))
            i += 1
        else:  # quadratic: p0 on, p1 off, p2 on
            p2 = expanded[(i + 2) % n]
            bx = (
                (1 - ts) ** 2 * p0[0] + 2 * (1 - ts) * ts * p1[0] + ts**2 * p2[0]
            )
            by = (
                (1 - ts) ** 2 * p0[1] + 2 * (1 - ts) * ts * p1[1] + ts**2 * p2[1]
            )
            for k in range(flatten):
                segs.append((bx[k], by[k], bx[k + 1], by[k + 1]))
            i += 2
    return np.asarray(segs, np.float64)


def _wind_mask(segs: np.ndarray, r_lo: int, r_hi: int, c_lo: int, c_hi: int):
    """Nonzero-winding coverage of segments (image pixel coords) over
    the pixel-center grid rows [r_lo, r_hi) x cols [c_lo, c_hi)."""
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    yc = np.arange(r_lo, r_hi, dtype=np.float64)[:, None] + 0.5  # (R,1)
    below0 = y0[None, :] <= yc
    below1 = y1[None, :] <= yc
    crosses = below0 != below1  # (R,S)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (yc - y0[None, :]) / (y1 - y0)[None, :]
    xint = x0[None, :] + t * (x1 - x0)[None, :]
    sign = np.where(y1 > y0, 1, -1)[None, :]  # image-y winding direction
    xc = np.arange(c_lo, c_hi, dtype=np.float64)[None, None, :] + 0.5
    contrib = np.where(crosses, sign, 0)[:, :, None] * (xint[:, :, None] > xc)
    return contrib.sum(axis=1) != 0  # (R,C)


def _glyph_segments(contours, scale: float, matrix=None) -> np.ndarray | None:
    """Contours -> flattened segments in a y-DOWN frame scaled to
    pixels, with the glyph origin at (0, 0): seg y = -unit_y * scale.
    ``matrix`` (a, b, c, d) applies the PDF text-matrix 2x2 (y-up user
    space: x' = a x + c y, y' = b x + d y) before the y flip — the
    rotated-text path. Horizontal segments dropped (they never cross a
    scanline)."""
    if not contours:
        return None
    segs = np.concatenate([_contour_segments(c) for c in contours])
    out = np.empty_like(segs)
    if matrix is None:
        out[:, 0] = segs[:, 0] * scale
        out[:, 1] = -segs[:, 1] * scale
        out[:, 2] = segs[:, 2] * scale
        out[:, 3] = -segs[:, 3] * scale
    else:
        a, b, c, d = matrix
        for src, dx, dy in ((0, 0, 1), (2, 2, 3)):
            x = segs[:, src] * scale
            y = segs[:, src + 1] * scale
            out[:, dx] = a * x + c * y
            out[:, dy] = -(b * x + d * y)
    out = out[out[:, 1] != out[:, 3]]
    return out if len(out) else None


def fill_glyph(
    page: np.ndarray,
    contours: list[list[tuple[float, float, bool]]],
    scale: float,
    pen_x: float,
    pen_y: float,
    _cache: dict | None = None,
    _key=None,
    matrix=None,
) -> None:
    """Nonzero-winding fill of one positioned glyph into ``page``
    ((H, W) uint8, 255 background), sampled at pixel centers. ``pen``
    is the baseline origin in PDF user space (y up, 1 unit = 1 px).

    When ``_cache``/``_key`` are given AND the pen lands on integer
    pixel coordinates, the glyph's coverage mask is rasterized once per
    (glyph, scale) and blitted thereafter — identical pixels (the grid
    offset relative to the outline is the same for every integral pen),
    ~50x cheaper for text runs where glyphs repeat."""
    H, W = page.shape
    ox = pen_x
    oy = H - pen_y  # glyph origin in image coords (baseline)
    integral = float(ox).is_integer() and float(oy).is_integer()
    if _cache is not None and _key is not None and integral:
        hit = _cache.get(_key)
        if hit is None:
            segs = _glyph_segments(contours, scale, matrix)
            if segs is None:
                _cache[_key] = (None, 0, 0)
                return
            r_lo = int(np.floor(segs[:, [1, 3]].min()))
            r_hi = int(np.ceil(segs[:, [1, 3]].max()))
            c_lo = int(np.floor(segs[:, [0, 2]].min()))
            c_hi = int(np.ceil(segs[:, [0, 2]].max()))
            mask = _wind_mask(segs, r_lo, r_hi, c_lo, c_hi)
            hit = _cache[_key] = (mask, r_lo, c_lo)
        mask, mr, mc = hit
        if mask is None:
            return
        r0 = int(oy) + mr
        c0 = int(ox) + mc
        mh, mw = mask.shape
        pr0, pc0 = max(0, r0), max(0, c0)
        pr1, pc1 = min(H, r0 + mh), min(W, c0 + mw)
        if pr1 <= pr0 or pc1 <= pc0:
            return
        sub = mask[pr0 - r0 : pr1 - r0, pc0 - c0 : pc1 - c0]
        block = page[pr0:pr1, pc0:pc1]
        block[sub] = 0
        return
    segs = _glyph_segments(contours, scale, matrix)
    if segs is None:
        return
    segs = segs + np.array([ox, oy, ox, oy], np.float64)
    r_lo = max(0, int(np.floor(segs[:, [1, 3]].min())))
    r_hi = min(H, int(np.ceil(segs[:, [1, 3]].max())))
    c_lo = max(0, int(np.floor(segs[:, [0, 2]].min())))
    c_hi = min(W, int(np.ceil(segs[:, [0, 2]].max())))
    if r_hi <= r_lo or c_hi <= c_lo:
        return
    wind = _wind_mask(segs, r_lo, r_hi, c_lo, c_hi)
    block = page[r_lo:r_hi, c_lo:c_hi]
    block[wind] = 0


# -------------------------------------------------- PDF text interpreter

_TOKEN_RE = re.compile(
    rb"/([^\s/<>\[\]()]+)"  # 1 name
    rb"|(<[0-9A-Fa-f\s]*>)"  # 2 hex string
    rb"|([-+]?\d*\.?\d+)"  # 3 number
    rb"|(\[|\])"  # 4 array delims
    rb"|(?<![A-Za-z])(BT|ET|Tf|Td|TD|TL|T\*|Tm|TJ|Tj|re|f\*|f|d0|d1|'|\")"
    rb"(?![A-Za-z*])"  # 5 operator (word-bounded: path ops are short)
    rb"|(\()"  # 6 literal string opener
)


def _read_literal(data: bytes, start: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at the '(' — returns
    (decoded bytes, index after closing paren)."""
    out = bytearray()
    depth = 1
    i = start + 1
    esc = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12}
    while i < len(data) and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
            elif nxt.isdigit():
                j = i + 1
                oct_s = b""
                while j < len(data) and data[j : j + 1].isdigit() and len(oct_s) < 3:
                    oct_s += data[j : j + 1]
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _tokenize(stream: bytes):
    """Content-stream token iterator: ('name'|'str'|'num'|'arr'|'op', value)."""
    pos = 0
    while True:
        m = _TOKEN_RE.search(stream, pos)
        if m is None:
            return
        if m.group(6):  # literal string
            s, pos = _read_literal(stream, m.start(6))
            yield ("str", s)
            continue
        pos = m.end()
        if m.group(1):
            yield ("name", m.group(1).decode("latin-1"))
        elif m.group(2):
            hx = re.sub(rb"\s", b"", m.group(2))[1:-1]
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode()))
        elif m.group(3):
            yield ("num", float(m.group(3)))
        elif m.group(4):
            yield ("arr", m.group(4).decode())
        else:
            yield ("op", m.group(5).decode())


def _page_fonts(objs: dict, page_head: bytes) -> dict[str, "PdfFont"]:
    """/Resources /Font dict of a page -> name -> PdfFont."""
    rm = re.search(rb"/Font\s*<<(.*?)>>", page_head, re.S)
    if rm is None:
        return {}
    fonts: dict[str, PdfFont] = {}
    for fm in re.finditer(rb"/(\w+)\s+(\d+)\s+0\s+R", rm.group(1)):
        fonts[fm.group(1).decode()] = PdfFont(objs, int(fm.group(2)))
    return fonts


class PdfFont:
    """One /Font object: embedded TrueType (/FontFile2) or bare-CFF
    Type1C (/FontFile3) program + /Widths."""

    def __init__(self, objs: dict, num: int):
        head, _ = objs[num]
        self.two_byte = False
        self.cid2gid: np.ndarray | None = None
        self.cid_dw = 1000.0
        self.cid_w: dict[int, float] = {}
        self.type3: dict | None = None
        if b"/Type3" in head and b"/CharProcs" in head:
            # Type 3 font: glyphs are PDF content streams drawn in the
            # font's own /FontMatrix glyph space (PDF 9.6.5)
            self._init_type3(objs, head)
            return
        if b"/Type0" in head:
            # composite font: 2-byte codes through /Identity-H into a
            # CIDFontType2 descendant whose CIDs ARE glyph ids
            if b"/Identity-H" not in head:
                raise NotImplementedError(
                    "Type0 font with a non-Identity-H CMap encoding"
                )
            dfm = re.search(
                rb"/DescendantFonts\s*\[?\s*(\d+)\s+0\s+R", head
            )
            if dfm is None:
                raise ValueError("Type0 font without /DescendantFonts")
            head, _ = objs[int(dfm.group(1))]
            if b"/CIDFontType2" in head:
                if re.search(rb"/CIDToGIDMap\s*/(?!Identity)", head):
                    raise NotImplementedError("named non-Identity /CIDToGIDMap")
                sm = re.search(rb"/CIDToGIDMap\s+(\d+)\s+0\s+R", head)
                if sm is not None:
                    # stream map: 2 bytes big-endian GID per CID
                    ghead, graw = objs[int(sm.group(1))]
                    self.cid2gid = np.frombuffer(
                        decode_stream(ghead, graw), ">u2"
                    )
            elif b"/CIDFontType0" not in head:
                raise NotImplementedError("unknown CID descendant font type")
            self.two_byte = True
            dwm = re.search(rb"/DW\s+([\d.]+)", head)
            if dwm:
                self.cid_dw = float(dwm.group(1))
            wm = re.search(rb"/W\s*\[(.*?)\]\s*(?:/|>>)", head, re.S)
            if wm:
                self._parse_cid_w(wm.group(1))
        dm = re.search(rb"/FontDescriptor\s+(\d+)\s+0\s+R", head)
        if dm is None:
            raise NotImplementedError(
                "font without embedded program (base-14 metrics)"
            )
        dhead, _ = objs[int(dm.group(1))]
        fm = re.search(rb"/FontFile([23]?)\s+(\d+)\s+0\s+R", dhead)
        if fm is None:
            raise NotImplementedError("font descriptor without FontFile")
        fhead, fraw = objs[int(fm.group(2))]
        prog = decode_stream(fhead, fraw)
        if fm.group(1) == b"2":
            self.ttf = TrueTypeFont(prog)
        elif fm.group(1) == b"3":  # bare CFF (/Type1C or CIDFontType0C)
            from .cfffont import CFFFont

            self.ttf = CFFFont(prog)
        else:  # /FontFile: original eexec-encrypted Type 1 program
            from .type1font import Type1Font

            self.ttf = Type1Font(prog)
        # /Widths (PDF 1000-unit glyph space), /FirstChar
        self.first_char = 0
        self.widths: list[float] | None = None
        wm = re.search(rb"/FirstChar\s+(\d+)", head)
        if wm:
            self.first_char = int(wm.group(1))
        am = re.search(rb"/Widths\s*\[(.*?)\]", head, re.S)
        if am:
            self.widths = [float(x) for x in re.findall(rb"[-\d.]+", am.group(1))]
        #: (gid, size) -> rasterized coverage mask, shared across pages
        self.raster_cache: dict = {}

    def _init_type3(self, objs: dict, head: bytes) -> None:
        """Parse the Type 3 dictionaries: /FontMatrix, /CharProcs
        (glyph name -> content-stream object), /Encoding /Differences
        (code -> glyph name), /Widths (GLYPH-space units)."""
        self._objs = objs
        mm = re.search(
            rb"/FontMatrix\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+"
            rb"([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)", head
        )
        if mm is None:
            raise ValueError("Type3 font without /FontMatrix")
        fm = tuple(float(mm.group(i)) for i in range(1, 7))
        if fm[1] or fm[2]:
            raise NotImplementedError("Type3 /FontMatrix with shear/rotation")
        cm = re.search(rb"/CharProcs\s+(\d+)\s+0\s+R", head)
        if cm is not None:
            cp_head, _ = objs[int(cm.group(1))]
        else:
            cpm = re.search(rb"/CharProcs\s*<<(.*?)>>", head, re.S)
            if cpm is None:
                raise ValueError("Type3 font without /CharProcs")
            cp_head = cpm.group(1)
        procs = {
            m.group(1): int(m.group(2))
            for m in re.finditer(rb"/([\w.]+)\s+(\d+)\s+0\s+R", cp_head)
        }
        em = re.search(rb"/Encoding\s+(\d+)\s+0\s+R", head)
        enc_head = objs[int(em.group(1))][0] if em else head
        dm = re.search(rb"/Differences\s*\[(.*?)\]", enc_head, re.S)
        if dm is None:
            raise NotImplementedError("Type3 font without /Differences encoding")
        code_name: dict[int, bytes] = {}
        code = 0
        for tok in re.findall(rb"/[\w.]+|\d+", dm.group(1)):
            if tok.startswith(b"/"):
                code_name[code] = tok[1:]
                code += 1
            else:
                code = int(tok)
        self.first_char = 0
        fcm = re.search(rb"/FirstChar\s+(\d+)", head)
        if fcm:
            self.first_char = int(fcm.group(1))
        self.widths = None
        wm = re.search(rb"/Widths\s*\[(.*?)\]", head, re.S)
        if wm:
            self.widths = [float(x) for x in re.findall(rb"[-\d.]+", wm.group(1))]
        self.type3 = {"fm": fm, "procs": procs, "code_name": code_name}
        self.raster_cache = {}

    def type3_advance_px(self, code: int, size: float) -> float:
        """Glyph-space /Widths through the diagonal /FontMatrix."""
        w = 0.0
        if self.widths is not None:
            idx = code - self.first_char
            if 0 <= idx < len(self.widths):
                w = self.widths[idx]
        adv = w * self.type3["fm"][0] * size
        return round(adv) if abs(adv - round(adv)) < 1e-6 else adv

    def draw_type3(
        self, page: np.ndarray, code: int, size: float, px: float, py: float
    ) -> bool:
        """Execute the glyph's content stream (``d0``/``d1`` metrics +
        ``re``/``f`` rectangle fills — the bitmap-glyph producer form)
        into the page at pen (px, py). Returns True if ink landed."""
        t3 = self.type3
        name = t3["code_name"].get(code)
        if name is None or name not in t3["procs"]:
            return False
        rects = self.raster_cache.get(("t3", name))
        if rects is None:
            head, raw = self._objs[t3["procs"][name]]
            stream = decode_stream(head, raw)
            rects = []
            stack: list = []
            for kind, val in _tokenize(stream):
                if kind == "num":
                    stack.append(float(val))
                elif kind == "op":
                    if val == "re" and len(stack) >= 4:
                        rects.append(tuple(stack[-4:]))
                        del stack[-4:]
                    else:  # d0/d1 metrics, f/f* fills: args consumed
                        stack.clear()
                else:
                    stack.clear()
            if not rects and re.search(
                rb"(?<![\w.])(m|l|c|v|y|h|S|s|B|b|Do|BI|sh)(?![\w*])", stream
            ):
                # the glyph draws with path/XObject operators this
                # rectangle-fill interpreter cannot honor — raise
                # rather than render a silently-blank glyph
                raise NotImplementedError(
                    "Type3 charproc with path/XObject operators beyond re/f"
                )
            self.raster_cache[("t3", name)] = rects = tuple(rects)
        fa, _b, _c, fd, fe, ff = t3["fm"]
        H_, W_ = page.shape
        painted = False
        for gx, gy, gw, gh in rects:
            x0 = px + (fa * gx + fe) * size
            x1 = px + (fa * (gx + gw) + fe) * size
            y0 = py + (fd * gy + ff) * size
            y1 = py + (fd * (gy + gh) + ff) * size
            c0 = max(0, int(np.ceil(min(x0, x1) - 0.5)))
            c1 = min(W_, int(np.ceil(max(x0, x1) - 0.5)))
            r0 = max(0, int(np.ceil(H_ - max(y0, y1) - 0.5)))
            r1 = min(H_, int(np.ceil(H_ - min(y0, y1) - 0.5)))
            if r1 > r0 and c1 > c0:
                page[r0:r1, c0:c1] = 0
                painted = True
        return painted

    def _parse_cid_w(self, body: bytes) -> None:
        """CIDFontType2 /W array: ``c [w1 w2 ...]`` runs and
        ``c1 c2 w`` ranges (PDF 9.7.4.3)."""
        toks = re.findall(rb"\[|\]|[-\d.]+", body)
        i = 0
        while i < len(toks):
            if toks[i] in (b"[", b"]"):
                i += 1
                continue
            c = int(float(toks[i]))
            if i + 1 < len(toks) and toks[i + 1] == b"[":
                j = i + 2
                while j < len(toks) and toks[j] != b"]":
                    self.cid_w[c] = float(toks[j])
                    c += 1
                    j += 1
                i = j + 1
            elif i + 2 < len(toks):
                c2, w = int(float(toks[i + 1])), float(toks[i + 2])
                for cid in range(c, c2 + 1):
                    self.cid_w[cid] = w
                i += 3
            else:
                break

    def codes_of(self, s: bytes) -> list[int]:
        """String bytes -> character codes (2-byte big-endian for
        composite fonts, single bytes otherwise)."""
        if self.two_byte:
            return [
                (s[i] << 8) | s[i + 1] for i in range(0, len(s) - 1, 2)
            ]
        return list(s)

    def code_to_gid(self, code: int) -> int:
        if self.two_byte:  # Identity-H: the 2-byte code IS the CID
            if self.cid2gid is not None:  # stream /CIDToGIDMap
                return (
                    int(self.cid2gid[code]) if code < len(self.cid2gid) else 0
                )
            cid_map = getattr(self.ttf, "cid_to_gid", None)
            if cid_map is not None:  # CID-keyed CFF: charset routes it
                return cid_map.get(code, 0)
            # CIDFontType2 + Identity CIDToGIDMap: CID = gid
            return code if code < getattr(self.ttf, "num_glyphs", 1 << 16) else 0
        return self.ttf.cmap.get(code, 0)

    def advance_px(self, code: int, size: float) -> float:
        if self.two_byte:
            w = self.cid_w.get(code, self.cid_dw) / 1000.0 * size
            # CID widths arrive through decimal 1000-unit text space —
            # snap near-integral pixel advances so integral pen
            # positions (and the glyph raster cache) survive the float
            # round trip
            return round(w) if abs(w - round(w)) < 1e-6 else w
        if self.widths is not None:
            idx = code - self.first_char
            if 0 <= idx < len(self.widths):
                return self.widths[idx] / 1000.0 * size
        gid = self.ttf.cmap.get(code, 0)
        if hasattr(self.ttf, "glyph_width"):  # CFF: width is per-charstring
            return float(self.ttf.glyph_width(gid)) * size / self.ttf.upem
        if gid < len(self.ttf.advances):
            return float(self.ttf.advances[gid]) * size / self.ttf.upem
        return 0.0


def rasterize_truetype_pdf(data: bytes) -> list[np.ndarray]:
    """Font-rendered PDF -> one (H, W) uint8 gray image per page.

    Pages are MediaBox-sized at 1 user unit = 1 px; text painted black
    on white by filling each referenced glyph's outline from the
    embedded TrueType program. Raises NotImplementedError for font
    technologies that genuinely need more (CFF/Type0)."""
    if b"/Encrypt" in data:
        from .pdfcrypt import decrypt_pdf

        data = decrypt_pdf(data)
    objs = _scan_objects(data)
    pages = _page_order(data, objs)
    out: list[np.ndarray] = []
    for pnum in pages:
        head, _ = objs[pnum]
        mb = re.search(
            rb"/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)", head
        )
        if mb is None:
            continue
        W = int(round(float(mb.group(3)) - float(mb.group(1))))
        H = int(round(float(mb.group(4)) - float(mb.group(2))))
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", head)
        if cm is None:
            continue
        chead, craw = objs[int(cm.group(1))]
        stream = decode_stream(chead, craw)
        fonts = _page_fonts(objs, head)
        page = np.full((H, W), 255, np.uint8)
        if _draw_text(page, stream, fonts):
            out.append(page)
    return out


def _draw_text(page: np.ndarray, stream: bytes, fonts: dict) -> bool:
    """Interpret the text operators of one content stream. Returns
    True if any glyph was painted. ``Tm`` matrices with rotation are
    supported when orthogonal with uniform scale (the rotated-page
    cases a producer emits); shear raises."""
    font: PdfFont | None = None
    size = 12.0
    tx = ty = 0.0  # text-line origin (user space)
    px = py = 0.0  # pen
    leading = 0.0
    tmat = None  # 2x2 text-matrix (a, b, c, d); None = identity
    stack: list = []
    in_array: list | None = None
    path_rects: list[tuple[float, float, float, float]] = []
    painted = False

    def to_user(dx: float, dy: float) -> tuple[float, float]:
        """Text-space displacement -> user-space (through tmat)."""
        if tmat is None:
            return dx, dy
        a, b, c, d = tmat
        return a * dx + c * dy, b * dx + d * dy

    def show(s: bytes) -> None:
        nonlocal px, py, painted
        if font is None:
            return
        if font.type3 is not None:
            if tmat is not None:
                raise NotImplementedError("rotated Type3 text (Tm)")
            for code in font.codes_of(s):
                painted = font.draw_type3(page, code, size, px, py) or painted
                px += font.type3_advance_px(code, size)
            return
        for code in font.codes_of(s):
            gid = font.code_to_gid(code)
            if gid:
                fill_glyph(
                    page,
                    font.ttf.glyph_contours(gid),
                    size / font.ttf.upem,
                    px,
                    py,
                    _cache=font.raster_cache,
                    _key=(gid, size, tmat),
                    matrix=tmat,
                )
                painted = True
            ax, ay = to_user(font.advance_px(code, size), 0.0)
            px += ax
            py += ay

    for kind, val in _tokenize(stream):
        if kind == "arr":
            in_array = [] if val == "[" else in_array
            if val == "]":
                stack.append(in_array or [])
                in_array = None
            continue
        if kind in ("num", "str", "name"):
            (in_array if in_array is not None else stack).append((kind, val))
            continue
        op = val
        if op == "BT":
            tx = ty = px = py = 0.0
            tmat = None
            stack.clear()
        elif op == "Tf" and len(stack) >= 2:
            size = float(stack[-1][1])
            fname = stack[-2][1]
            font = fonts.get(fname, font)
            stack.clear()
        elif op in ("Td", "TD") and len(stack) >= 2:
            dx, dy = to_user(float(stack[-2][1]), float(stack[-1][1]))
            tx, ty = tx + dx, ty + dy
            px, py = tx, ty
            if op == "TD":
                leading = -float(stack[-1][1])
            stack.clear()
        elif op == "TL" and stack:
            leading = float(stack[-1][1])
            stack.clear()
        elif op == "Tm" and len(stack) >= 6:
            a, b, c, d, e, f = (float(v) for _, v in stack[-6:])
            if b or c:
                # rotation is fine when the 2x2 is orthogonal with
                # uniform scale (rotated-page producers); shear isn't
                import math

                s1, s2 = math.hypot(a, b), math.hypot(c, d)
                if abs(s1 - s2) > 1e-9 * max(s1, s2) or abs(
                    a * c + b * d
                ) > 1e-9 * max(s1 * s2, 1.0):
                    raise NotImplementedError("sheared text matrix (Tm)")
                tmat = (a, b, c, d)
            else:
                tmat = None
                size = size * d if d not in (0.0, 1.0) else size
            tx, ty = e, f
            px, py = tx, ty
            stack.clear()
        elif op == "T*":
            dx, dy = to_user(0.0, -leading)
            tx, ty = tx + dx, ty + dy
            px, py = tx, ty
            stack.clear()
        elif op == "re" and len(stack) >= 4:
            rx, ry, rw, rh = (float(v) for _, v in stack[-4:])
            path_rects.append((rx, ry, rw, rh))
            stack.clear()
        elif op in ("f", "f*"):
            # fill the pending rectangle path black (the vector-content
            # subset a table/rule producer emits); pixel-center
            # coverage: col/row c painted when its center is inside
            H_, W_ = page.shape
            for rx, ry, rw, rh in path_rects:
                c0 = max(0, int(np.ceil(rx - 0.5)))
                c1 = min(W_, int(np.ceil(rx + rw - 0.5)))
                r0 = max(0, int(np.ceil(H_ - ry - rh - 0.5)))
                r1 = min(H_, int(np.ceil(H_ - ry - 0.5)))
                if r1 > r0 and c1 > c0:
                    page[r0:r1, c0:c1] = 0
                    painted = True
            path_rects.clear()
            stack.clear()
        elif op == "Tj" and stack:
            show(stack[-1][1])
            stack.clear()
        elif op in ("'", '"') and stack:
            dx, dy = to_user(0.0, -leading)
            tx, ty = tx + dx, ty + dy
            px, py = tx, ty
            show(stack[-1][1])
            stack.clear()
        elif op == "TJ" and stack:
            items = stack[-1]
            if isinstance(items, list):
                for k, v in items:
                    if k == "str":
                        show(v)
                    else:  # kerning adjustment, 1000-unit text space
                        ax, ay = to_user(-float(v) / 1000.0 * size, 0.0)
                        px += ax
                        py += ay
            stack.clear()
        elif op == "ET":
            stack.clear()
    return painted


# ----------------------------------------------------------- TTF writer


def _fmt4_cmap(mapping: dict[int, int]) -> bytes:
    """cmap with one format-4 (3,1) subtable; one segment per code."""
    codes = sorted(mapping)
    segs = [(c, c, (mapping[c] - c) & 0xFFFF) for c in codes]
    segs.append((0xFFFF, 0xFFFF, 1))
    n = len(segs)
    seg_x2 = 2 * n
    import math

    search = 2 * (2 ** int(math.floor(math.log2(n))))
    sub = struct.pack(
        ">HHHHHHH",
        4,
        16 + 8 * n,
        0,
        seg_x2,
        search,
        int(math.log2(search // 2)),
        seg_x2 - search,
    )
    sub += b"".join(struct.pack(">H", e) for _, e, _ in segs)
    sub += b"\x00\x00"
    sub += b"".join(struct.pack(">H", s) for s, _, _ in segs)
    sub += b"".join(struct.pack(">H", d) for _, _, d in segs)
    sub += b"\x00\x00" * n  # idRangeOffset all zero
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub


def _fmt0_cmap(mapping: dict[int, int]) -> bytes:
    """cmap with one format-0 byte-table subtable (codes < 256)."""
    tbl = bytearray(256)
    for c, g in mapping.items():
        if not (0 <= c < 256 and g < 256):
            raise ValueError("format 0 cmap needs byte codes and gids")
        tbl[c] = g
    sub = struct.pack(">HHH", 0, 262, 0) + bytes(tbl)
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 0, 12) + sub


def _fmt6_cmap(mapping: dict[int, int]) -> bytes:
    """cmap with one format-6 trimmed-table subtable."""
    first, last = min(mapping), max(mapping)
    gids = [mapping.get(c, 0) for c in range(first, last + 1)]
    sub = struct.pack(">HHHHH", 6, 10 + 2 * len(gids), 0, first, len(gids))
    sub += b"".join(struct.pack(">H", g) for g in gids)
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub


def _fmt12_cmap(mapping: dict[int, int]) -> bytes:
    """cmap with one format-12 segmented-coverage subtable (one group
    per maximal run of consecutive code->gid mappings)."""
    groups = []
    for c in sorted(mapping):
        g = mapping[c]
        if groups and c == groups[-1][1] + 1 and g == groups[-1][2] + (
            c - groups[-1][0]
        ):
            groups[-1] = (groups[-1][0], c, groups[-1][2])
        else:
            groups.append((c, c, g))
    sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups))
    sub += b"".join(struct.pack(">III", s, e, g) for s, e, g in groups)
    return struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 10, 12) + sub


def _simple_glyph(contours: list[list[tuple[int, int, bool]]]) -> bytes:
    """Serialize one simple glyph (no repeat compression, long deltas
    where needed)."""
    all_pts = [p for c in contours for p in c]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    hdr = struct.pack(
        ">hhhhh", len(contours), min(xs), min(ys), max(xs), max(ys)
    )
    end_pts = []
    total = 0
    for c in contours:
        total += len(c)
        end_pts.append(total - 1)
    body = b"".join(struct.pack(">H", e) for e in end_pts)
    body += struct.pack(">H", 0)  # no instructions
    flags = bytearray()
    xb = bytearray()
    yb = bytearray()
    prev_x = prev_y = 0
    for x, y, on in all_pts:
        dx, dy = x - prev_x, y - prev_y
        f = 0x01 if on else 0x00
        if -255 <= dx <= 255:
            f |= 0x02
            if dx >= 0:
                f |= 0x10
            xb.append(abs(dx))
        else:
            xb += struct.pack(">h", dx)
        if -255 <= dy <= 255:
            f |= 0x04
            if dy >= 0:
                f |= 0x20
            yb.append(abs(dy))
        else:
            yb += struct.pack(">h", dy)
        flags.append(f)
        prev_x, prev_y = x, y
    return hdr + body + bytes(flags) + bytes(xb) + bytes(yb)


def build_ttf(
    glyphs: list[list[list[tuple[int, int, bool]]]],
    cmap: dict[int, int],
    advances: list[int],
    upem: int,
    cmap_format: int = 4,
) -> bytes:
    """Minimal valid TrueType binary: glyph 0 must be .notdef (pass an
    empty contour list); ``glyphs[i]`` is glyph i's contour list."""
    glyf = b""
    loca = [0]
    for contours in glyphs:
        if contours:
            g = _simple_glyph(contours)
            if len(g) % 4:
                g += b"\x00" * (4 - len(g) % 4)
            glyf += g
        loca.append(len(glyf))
    loca_b = b"".join(struct.pack(">I", o) for o in loca)
    all_pts = [p for g in glyphs for c in g for p in c] or [(0, 0, True)]
    xmin = min(p[0] for p in all_pts)
    ymin = min(p[1] for p in all_pts)
    xmax = max(p[0] for p in all_pts)
    ymax = max(p[1] for p in all_pts)
    head = (
        struct.pack(">IIII", 0x00010000, 0, 0, 0x5F0F3CF5)
        + struct.pack(">HH", 0, upem)
        + b"\x00" * 16  # created/modified
        + struct.pack(">hhhh", xmin, ymin, xmax, ymax)
        + struct.pack(">HHhhh", 0, 8, 2, 1, 0)  # macStyle..glyphDataFormat
    )
    maxp = struct.pack(">IH", 0x00010000, len(glyphs)) + b"\x00" * 26
    hhea = (
        struct.pack(">IhhhH", 0x00010000, ymax, min(0, ymin), 0, max(advances))
        + struct.pack(">hhh", xmin, 0, xmax)
        + struct.pack(">hhh", 1, 0, 0)
        + b"\x00" * 8
        + struct.pack(">hH", 0, len(advances))
    )
    hmtx = b"".join(struct.pack(">Hh", a, 0) for a in advances)
    cmap_b = {0: _fmt0_cmap, 4: _fmt4_cmap, 6: _fmt6_cmap, 12: _fmt12_cmap}[
        cmap_format
    ](cmap)
    tables = [
        (b"cmap", cmap_b),
        (b"glyf", glyf),
        (b"head", head),
        (b"hhea", hhea),
        (b"hmtx", hmtx),
        (b"loca", loca_b),
        (b"maxp", maxp),
    ]
    import math

    n = len(tables)
    search = 16 * (2 ** int(math.floor(math.log2(n))))
    out = struct.pack(
        ">IHHHH", 0x00010000, n, search, int(math.log2(search // 16)),
        16 * n - search,
    )
    off = 12 + 16 * n
    dir_b = b""
    body = b""
    for tag, t in tables:
        pad = (-len(t)) % 4
        dir_b += tag + struct.pack(">III", 0, off, len(t))
        body += t + b"\x00" * pad
        off += len(t) + pad
    return out + dir_b + body


# ------------------------------------------- fixture font + PDF writer


def _bitmap_contours(bitmap: np.ndarray) -> list[list[tuple[int, int, bool]]]:
    """Ink bitmap (rows top-down) -> rectangle contours in y-up font
    units, one per maximal horizontal run — winding-fills back to the
    exact pixel set."""
    h, w = bitmap.shape
    contours = []
    for r in range(h):
        row = bitmap[r]
        c = 0
        while c < w:
            if row[c]:
                c2 = c
                while c2 < w and row[c2]:
                    c2 += 1
                y_top = h - r
                y_bot = h - r - 1
                contours.append(
                    [  # counter-clockwise in y-up = positive winding
                        (c, y_bot, True),
                        (c2, y_bot, True),
                        (c2, y_top, True),
                        (c, y_top, True),
                    ]
                )
                c = c2
            else:
                c += 1
    return contours


def make_glyph_ttf() -> tuple[bytes, dict[str, int]]:
    """A real TrueType font whose glyphs are the engine's procedural
    pixel glyphs (doctr_ray.glyphs.FONT) as rectangle outlines, with a
    SUBSET-STYLE scrambled encoding: char -> private code, codes give
    garbage under latin-1 — the text layer is unusable by design, like
    a real subsetted font without /ToUnicode. Returns (ttf bytes,
    char -> code map). upem = GLYPH_H so Tf size CHAR_H renders at
    exactly the recognizer's scale."""
    import hashlib

    from ..glyphs import FONT, GLYPH_H, GLYPH_W, VOCAB

    order = sorted(
        VOCAB, key=lambda ch: hashlib.md5(f"sub:{ch}".encode()).hexdigest()
    )
    glyphs: list[list] = [[]]  # gid 0 = .notdef (empty)
    cmap: dict[int, int] = {}
    char_code: dict[str, int] = {}
    advances = [GLYPH_W + 1]
    for i, ch in enumerate(order):
        gid = i + 1
        code = 0x21 + i  # printable-range but scrambled meaning
        glyphs.append(_bitmap_contours(FONT[ch]))
        cmap[code] = gid
        char_code[ch] = code
        advances.append(GLYPH_W + 1)  # fixed pitch: 6 units = CHAR_PITCH px
    return build_ttf(glyphs, cmap, advances, upem=GLYPH_H), char_code


def make_truetype_pdf(
    pages: list[list[str]], rotate: int = 0, to_unicode: bool = False
) -> bytes:
    """Font-embedded PDF: each page a list of text lines drawn with the
    embedded pixel-glyph TrueType font at the engine's scale — the PDF
    a subsetting producer emits, whose text layer is garbage and whose
    pixels OCR byte-exact. ``rotate=90`` draws every page a quarter
    turn (rotated Tm matrices on a swapped MediaBox)."""
    ttf, char_code = make_glyph_ttf()
    return _make_font_pdf(
        pages, ttf, char_code, "truetype", rotate=rotate,
        to_unicode=to_unicode,
    )


def make_table_pdf(docs: list[tuple[list[str], int, int]]) -> bytes:
    """Vector-content PDF: one page per (cell_words, R, C) doc — an
    R x C bordered grid drawn with ``re``/``f`` rectangle fills (the
    rule/table producer form) and cell words drawn with the embedded
    pixel-glyph font, replicating doctr_ray.media's synthetic table
    geometry exactly (same MARGIN / LINE_T / CELL_PAD / pitch), so the
    lattice table extractor recovers the same logical grid from a REAL
    PDF's pixels."""
    from ..glyphs import CHAR_H, word_width
    from ..media import CELL_PAD, LINE_T, MARGIN

    ttf, char_code = make_glyph_ttf()
    comp = zlib.compress(ttf)
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    ff_id = add(
        b"<< /Filter /FlateDecode /Length " + str(len(comp)).encode()
        + b" /Length1 " + str(len(ttf)).encode() + b" >>\nstream\n"
        + comp + b"\nendstream"
    )
    fd_id = add(
        b"<< /Type /FontDescriptor /FontName /AAAAAA+PixelGlyph /Flags 4 "
        b"/FontBBox [0 0 6 7] /ItalicAngle 0 /Ascent 7 /Descent 0 "
        b"/CapHeight 7 /StemV 1 /FontFile2 " + str(ff_id).encode() + b" 0 R >>"
    )
    font_id = add(
        b"<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+PixelGlyph "
        b"/FontDescriptor " + str(fd_id).encode() + b" 0 R >>"
    )

    content_ids, dims = [], []
    for cell_words, R, C in docs:
        cw_inner = max(
            [word_width(w) for w in cell_words], default=CHAR_H * 4
        )
        cell_w = cw_inner + 2 * CELL_PAD
        cell_h = CHAR_H + 2 * CELL_PAD
        table_w = C * cell_w + (C + 1) * LINE_T
        table_h = R * cell_h + (R + 1) * LINE_T
        W = table_w + 2 * MARGIN
        H = table_h + 2 * MARGIN
        ops = []
        # lattice rules as filled rects (PDF y-up: y = H - img_y - t)
        for i in range(R + 1):
            iy = MARGIN + i * (cell_h + LINE_T)
            ops.append(
                b"%d %d %d %d re" % (MARGIN, H - iy - LINE_T, table_w, LINE_T)
            )
        for j in range(C + 1):
            ix = MARGIN + j * (cell_w + LINE_T)
            ops.append(
                b"%d %d %d %d re" % (ix, H - MARGIN - table_h, LINE_T, table_h)
            )
        ops.append(b"f")
        ops.append(b"BT /F1 " + str(CHAR_H).encode() + b" Tf")
        unk = char_code["?"]
        for i, w in enumerate(cell_words[: R * C]):
            r_, c_ = i // C, i % C
            wx = MARGIN + LINE_T + c_ * (cell_w + LINE_T) + CELL_PAD
            wy = MARGIN + LINE_T + r_ * (cell_h + LINE_T) + CELL_PAD
            codes = bytes(char_code.get(ch, unk) for ch in w)
            ops.append(
                b"1 0 0 1 %d %d Tm <%s> Tj"
                % (wx, H - wy - CHAR_H, codes.hex().encode())
            )
        ops.append(b"ET")
        content = b"\n".join(ops)
        content_ids.append(
            add(
                b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
                + content + b"\nendstream"
            )
        )
        dims.append((W, H))

    pages_id = len(objects) + len(docs) + 1
    page_ids = []
    for (W, H), cid in zip(dims, content_ids):
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
                b"/MediaBox [0 0 " + str(W).encode() + b" " + str(H).encode()
                + b"] /Contents " + str(cid).encode() + b" 0 R "
                b"/Resources << /Font << /F1 " + str(font_id).encode()
                + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    ) == pages_id
    catalog = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d}".encode() + b" 00000 n \n"
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def make_type1c_pdf(pages: list[list[str]]) -> bytes:
    """Same fixture as make_truetype_pdf but with the font embedded as
    bare CFF (/FontFile3 /Subtype /Type1C) — the PostScript-flavoured
    producer output (sources/cfffont renders it)."""
    from .cfffont import make_glyph_cff

    cff, char_code = make_glyph_cff()
    return _make_font_pdf(pages, cff, char_code, "type1c")


def make_cid_pdf(pages: list[list[str]], to_unicode: bool = False) -> bytes:
    """Same fixture as a COMPOSITE font: /Type0 /Identity-H wrapping a
    CIDFontType2 descendant whose 2-byte codes are glyph ids — the
    dominant modern subset-producer output (and the classic case of an
    unusable text layer: the codes are gids, not characters)."""
    ttf, char_code = make_glyph_ttf()
    return _make_font_pdf(pages, ttf, char_code, "cid", to_unicode=to_unicode)


def make_cid0_pdf(pages: list[list[str]]) -> bytes:
    """Composite fixture over a CID-KEYED CFF descendant
    (/CIDFontType0 + /FontFile3 /CIDFontType0C) — the CJK-producer
    form; 2-byte CIDs route through the font's identity charset."""
    from .cfffont import make_glyph_cff_cid

    cff, char_code = make_glyph_cff_cid()
    return _make_font_pdf(pages, cff, char_code, "cid0")


def make_type3_pdf(pages: list[list[str]]) -> bytes:
    """Same fixture as a /Type3 font: every glyph a tiny content
    stream of ``d0`` metrics + row-run ``re``/``f`` rectangle fills in
    a 1/GLYPH_H /FontMatrix glyph space — the bitmap-glyph producer
    form (and, like the other embedded forms, a garbage text layer:
    the /Differences codes are scrambled and there is no /ToUnicode)."""
    import hashlib

    from ..glyphs import VOCAB

    order = sorted(
        VOCAB, key=lambda ch: hashlib.md5(f"sub:{ch}".encode()).hexdigest()
    )
    char_code = {ch: 0x21 + i for i, ch in enumerate(order)}
    return _make_font_pdf(pages, b"", char_code, "type3")


def make_type1_pdf(pages: list[list[str]]) -> bytes:
    """Same fixture with an original Type 1 program (/FontFile with
    Length1/2/3 — the pre-CFF PostScript form; sources/type1font
    decrypts and renders it)."""
    from .type1font import _split_pfb, make_glyph_type1

    pfb, char_code = make_glyph_type1()
    # PDF embeds the bare program (clear + binary + trailer), not the
    # 0x80-framed PFB; record the segment lengths for Length1/2/3
    segs = []
    pos = 0
    while pos < len(pfb) and pfb[pos] == 0x80 and pfb[pos + 1] != 3:
        n = int.from_bytes(pfb[pos + 2 : pos + 6], "little")
        segs.append(pfb[pos + 6 : pos + 6 + n])
        pos += 6 + n
    prog = b"".join(segs)
    lengths = (len(segs[0]), len(segs[1]), len(segs[2]))
    return _make_font_pdf(pages, prog, char_code, "type1", t1_lengths=lengths)


def _make_font_pdf(
    pages: list[list[str]],
    font_prog: bytes,
    char_code: dict[str, int],
    tech: str,
    t1_lengths: tuple[int, int, int] | None = None,
    rotate: int = 0,
    to_unicode: bool = False,
) -> bytes:
    if rotate not in (0, 90):
        raise ValueError("rotate must be 0 or 90")
    from ..glyphs import CHAR_H, CHAR_PITCH, CHAR_SPACE, GLYPH_H, GLYPH_W
    from ..media import MARGIN, WORD_GAP

    comp = zlib.compress(font_prog)
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    tu_ref = b""
    if to_unicode:
        # /ToUnicode CMap: subset code -> UTF-16BE, the tagged-PDF form
        # that makes a private-encoding text layer trustworthy again
        two = tech in ("cid", "cid0")
        width = 4 if two else 2
        pairs = b"\n".join(
            b"<%0*X> <%s>" % (
                width,
                # composite pages code the CID (= subset code - 0x20)
                code - 0x20 if two else code,
                ch.encode("utf-16-be").hex().upper().encode(),
            )
            for ch, code in sorted(char_code.items(), key=lambda kv: kv[1])
        )
        space = b"<0000> <FFFF>" if two else b"<00> <FF>"
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
            b"begincmap\n1 begincodespacerange\n" + space
            + b"\nendcodespacerange\n"
            + str(len(char_code)).encode() + b" beginbfchar\n" + pairs
            + b"\nendbfchar\nendcmap\nend end"
        )
        tu_id = add(
            b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
            + cmap + b"\nendstream"
        )
        tu_ref = b"/ToUnicode " + str(tu_id).encode() + b" 0 R "

    if tech == "type3":
        from ..glyphs import FONT, GLYPH_H, GLYPH_W

        # one content-stream CharProc per glyph: d0 metrics + one
        # re-rect per maximal horizontal ink run (y-up glyph space)
        proc_ids: dict[str, int] = {}
        code_char = {c: ch for ch, c in char_code.items()}
        for code in sorted(code_char):
            bitmap = FONT[code_char[code]]
            ops = [b"%d 0 d0" % (GLYPH_W + 1)]
            h = bitmap.shape[0]
            for r in range(h):
                row = bitmap[r]
                c = 0
                while c < len(row):
                    if row[c]:
                        c2 = c
                        while c2 < len(row) and row[c2]:
                            c2 += 1
                        ops.append(b"%d %d %d 1 re" % (c, h - r - 1, c2 - c))
                        c = c2
                    else:
                        c += 1
            ops.append(b"f")
            body = b"\n".join(ops)
            proc_ids[f"g{code:02X}"] = add(
                b"<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
                + body + b"\nendstream"
            )
        cp_body = b" ".join(
            b"/" + n.encode() + b" " + str(i).encode() + b" 0 R"
            for n, i in proc_ids.items()
        )
        cp_id = add(b"<< " + cp_body + b" >>")
        first = min(code_char)
        last = max(code_char)
        # codes are consecutive from `first`: one base number + names
        diffs = b" ".join(
            [str(first).encode()] + [b"/g%02X" % c for c in sorted(code_char)]
        )
        enc_id = add(
            b"<< /Type /Encoding /Differences [" + diffs + b"] >>"
        )
        widths = b" ".join(
            str(GLYPH_W + 1).encode() for _ in range(first, last + 1)
        )
        fm = repr(1.0 / GLYPH_H).encode()
        font_id = add(
            b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 "
            + str(GLYPH_W).encode() + b" " + str(GLYPH_H).encode() + b"] "
            b"/FontMatrix [" + fm + b" 0 0 " + fm + b" 0 0] "
            b"/CharProcs " + str(cp_id).encode() + b" 0 R "
            + tu_ref +
            b"/Encoding " + str(enc_id).encode() + b" 0 R "
            b"/FirstChar " + str(first).encode()
            + b" /LastChar " + str(last).encode()
            + b" /Widths [" + widths + b"] >>"
        )
    elif tech in ("truetype", "cid"):
        ff_extra = b" /Length1 " + str(len(font_prog)).encode()
        ff_key, subtype = b"/FontFile2", b"/TrueType"
    elif tech == "cid0":
        ff_extra = b" /Subtype /CIDFontType0C"
        ff_key, subtype = b"/FontFile3", b"/Type1"
    elif tech == "type1":
        l1, l2, l3 = t1_lengths
        ff_extra = (
            b" /Length1 " + str(l1).encode()
            + b" /Length2 " + str(l2).encode()
            + b" /Length3 " + str(l3).encode()
        )
        ff_key, subtype = b"/FontFile", b"/Type1"
    else:
        ff_extra = b" /Subtype /Type1C"
        ff_key, subtype = b"/FontFile3", b"/Type1"
    if tech != "type3":
        ff_id = add(
            b"<< /Filter /FlateDecode /Length " + str(len(comp)).encode()
            + ff_extra + b" >>\nstream\n" + comp + b"\nendstream"
        )
        fd_id = add(
            b"<< /Type /FontDescriptor /FontName /AAAAAA+PixelGlyph /Flags 4 "
            b"/FontBBox [0 0 6 7] /ItalicAngle 0 /Ascent 7 /Descent 0 "
            b"/CapHeight 7 /StemV 1 " + ff_key + b" " + str(ff_id).encode()
            + b" 0 R >>"
        )
    if tech == "type3":
        pass  # font_id already built above from CharProcs
    elif tech in ("cid", "cid0"):
        # composite form: Type0 /Identity-H over a CIDFontType2 or
        # CIDFontType0 descendant; CIDs are glyph ids (Identity
        # CIDToGIDMap / identity charset), widths in the /W range form
        w1000 = repr((GLYPH_W + 1) * 1000.0 / GLYPH_H).encode()
        desc_sub = b"/CIDFontType2" if tech == "cid" else b"/CIDFontType0"
        cid2gid = b"/CIDToGIDMap /Identity " if tech == "cid" else b""
        desc_id = add(
            b"<< /Type /Font /Subtype " + desc_sub
            + b" /BaseFont /AAAAAA+PixelGlyph "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> "
            b"/FontDescriptor " + str(fd_id).encode() + b" 0 R "
            + cid2gid + b"/DW " + w1000
            + b" /W [1 " + str(len(char_code)).encode() + b" " + w1000
            + b"] >>"
        )
        font_id = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+PixelGlyph "
            + tu_ref
            + b"/Encoding /Identity-H /DescendantFonts ["
            + str(desc_id).encode() + b" 0 R] >>"
        )
    else:
        font_id = add(
            b"<< /Type /Font /Subtype " + subtype
            + b" /BaseFont /AAAAAA+PixelGlyph " + tu_ref
            + b"/FontDescriptor " + str(fd_id).encode() + b" 0 R >>"
        )

    line_h = CHAR_H + 4 * (CHAR_H // GLYPH_H)  # glyph rows + gap
    content_ids, dims = [], []
    for lines in pages:
        # page sized to content (like make_simple_pdf): fixed width
        W = max(
            2 * MARGIN
            + max(
                (
                    sum(len(w) * CHAR_PITCH - CHAR_SPACE + WORD_GAP for w in ln.split())
                    - WORD_GAP
                    for ln in lines
                    if ln.split()
                ),
                default=0,
            ),
            200,
        )
        H = 2 * MARGIN + line_h * max(len(lines), 1)
        ops = [b"BT /F1 " + str(CHAR_H).encode() + b" Tf"]
        y = H - MARGIN - CHAR_H
        for ln in lines:
            x = MARGIN
            unk = char_code["?"]
            for word in ln.split():
                if tech in ("cid", "cid0"):
                    # Identity-H: 2-byte codes that ARE the glyph ids
                    # (the fixture font's gid = single-byte code - 0x20)
                    codes = b"".join(
                        struct.pack(">H", char_code.get(ch, unk) - 0x20)
                        for ch in word
                    )
                else:
                    codes = bytes(char_code.get(ch, unk) for ch in word)
                if rotate == 90:
                    # page content rotated a quarter turn: user space
                    # (x, y) -> (y, W - x) on a swapped MediaBox
                    ops.append(
                        b"0 -1 1 0 " + str(y).encode() + b" "
                        + str(W - x).encode()
                        + b" Tm <" + codes.hex().encode() + b"> Tj"
                    )
                else:
                    ops.append(
                        b"1 0 0 1 " + str(x).encode() + b" " + str(y).encode()
                        + b" Tm <" + codes.hex().encode() + b"> Tj"
                    )
                x += len(word) * CHAR_PITCH - CHAR_SPACE + WORD_GAP
            y -= line_h
        ops.append(b"ET")
        content = b"\n".join(ops)
        content_ids.append(
            add(
                b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
                + content + b"\nendstream"
            )
        )
        dims.append((W, H) if rotate == 0 else (H, W))

    pages_id = len(objects) + len(pages) + 1
    page_ids = []
    for (W, H), cid in zip(dims, content_ids):
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
                b"/MediaBox [0 0 " + str(W).encode() + b" " + str(H).encode()
                + b"] /Contents " + str(cid).encode() + b" 0 R "
                b"/Resources << /Font << /F1 " + str(font_id).encode()
                + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    ) == pages_id
    catalog = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d}".encode() + b" 00000 n \n"
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)
