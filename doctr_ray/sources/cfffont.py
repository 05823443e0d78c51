"""CFF / Type 2 charstring fonts (PDF ``/FontFile3 /Subtype /Type1C``).

The reference rasterizes CFF-flavoured OpenType and bare-CFF embedded
fonts through pdfium (io/pdf.py:16-43). sources/pdffont covers the
TrueType (``/FontFile2``) half of that surface; this module closes the
PostScript half for the dominant modern form — the compact font format
— with pure stdlib + numpy:

- a CFF parser: header, INDEX structures, Top DICT (CharStrings /
  Encoding / Private / FontMatrix), Private DICT (defaultWidthX /
  nominalWidthX / local Subrs), global subrs, format-0 Encoding;
- a Type 2 charstring interpreter covering the full path-construction
  set (r/h/v moveto-lineto, rr/hh/vv/hv/vh curveto, rcurveline,
  rlinecurve, the four flex escapes, call[g]subr with spec biasing,
  hint operators with hintmask data bytes, width extraction) — cubic
  Béziers are flattened to polylines so the output contours plug
  straight into pdffont's nonzero-winding ``fill_glyph``;
- a CFF WRITER (``build_cff``) mirroring pdffont's ``build_ttf``:
  rectangle-outline glyphs become integer rmoveto/rlineto charstrings,
  so rendering reproduces the engine's procedural pixel font
  bit-exactly (straight edges never flatten).

The ``upem`` is derived from the FontMatrix scale (``round(1/m[0])``)
because 1/7 has no finite decimal BCD form — the integer em square is
what the renderer uses, keeping rectangle fills pixel-exact.

CID-keyed CFF (the /CIDFontType0C payload) parses too: ROS detection,
per-FD Private DICTs routed by FDSelect (formats 0 and 3), charset
formats 0/1/2 building the CID -> gid map consumed by pdffont's Type0
branch; ``build_cff_cid`` writes the Adobe-Identity-0 form.

Predefined STANDARD encoding (the spec default when the Encoding op
is absent) resolves through the charset (SID c-31 for printable
ASCII); ``build_cff(standard_encoding=True)`` writes that form.
Custom encodings parse in BOTH spec formats — format 0 (code list)
and format 1 (code ranges) — plus supplement overrides (high bit of
the format byte; (code, SID) pairs resolved through the charset);
``build_cff(format1_encoding=True, supplement=...)`` writes those
forms for round-trip tests. Out of scope (NotImplementedError naming
the gap): the Expert predefined encoding (offset 1 — the small-caps/
fractions table from the CFF spec appendix; no in-container source of
truth to verify a hand-typed table against, and essentially absent
from real PDFs). seac accent composition (Type 2 Appendix C endchar
form) resolves through Standard codes + charset.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ low level


def _read_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX at ``pos`` -> (items, position after)."""
    (count,) = struct.unpack(">H", data[pos : pos + 2])
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    opos = pos + 3
    offs = []
    for i in range(count + 1):
        chunk = data[opos + i * off_size : opos + (i + 1) * off_size]
        offs.append(int.from_bytes(chunk, "big"))
    dstart = opos + (count + 1) * off_size - 1  # offsets are 1-based
    items = [data[dstart + offs[i] : dstart + offs[i + 1]] for i in range(count)]
    return items, dstart + offs[-1]


def _parse_dict(data: bytes) -> dict[int, list[float]]:
    """CFF DICT -> {op (esc ops as 0x0c00|b1): operands}."""
    out: dict[int, list[float]] = {}
    stack: list[float] = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                out[0x0C00 | data[i + 1]] = stack
                i += 2
            else:
                out[b0] = stack
                i += 1
            stack = []
        elif b0 == 28:
            stack.append(struct.unpack(">h", data[i + 1 : i + 3])[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack(">i", data[i + 1 : i + 5])[0])
            i += 5
        elif b0 == 30:  # real: BCD nibbles
            s = ""
            i += 1
            done = False
            while not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            stack.append(float(s or "0"))
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            raise ValueError(f"bad CFF DICT byte {b0}")
    return out


def _bias(subrs: list[bytes]) -> int:
    n = len(subrs)
    return 107 if n < 1240 else (1131 if n < 33900 else 32768)


# --------------------------------------------------------------- parser


class CFFFont:
    """Minimal bare-CFF font: glyph outlines + encoding + advances.

    Duck-types pdffont.TrueTypeFont's rendering surface: ``upem``,
    ``cmap`` (code -> gid), ``advances`` (font units per gid) and
    ``glyph_contours(gid)`` -> contours of (x, y, on) tuples (already
    flattened: every point on-curve)."""

    #: cubic Béziers are flattened to this many chords per curve
    FLATTEN = 8

    def __init__(self, data: bytes):
        self.data = data
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        _strings, pos = _read_index(data, pos)
        self.gsubrs, pos = _read_index(data, pos)
        top = _parse_dict(top_dicts[0])
        self.cid_keyed = 0x0C1E in top  # ROS
        matrix = top.get(0x0C07, [0.001, 0, 0, 0.001, 0, 0])
        self.upem = int(round(1.0 / matrix[0]))
        self.charstrings, _ = _read_index(data, int(top[17][0]))
        self.num_glyphs = len(self.charstrings)
        # Private DICT(s): widths + local subrs
        self.default_width = 0.0
        self.nominal_width = 0.0
        self.subrs: list[bytes] = []
        self._fd_priv: list[tuple[float, float, list[bytes]]] | None = None
        self._fd_of: np.ndarray | None = None
        self.cid_to_gid: dict[int, int] | None = None

        def read_private(d: dict) -> tuple[float, float, list[bytes]]:
            if 18 not in d:
                return 0.0, 0.0, []
            psize, poff = int(d[18][0]), int(d[18][1])
            priv = _parse_dict(data[poff : poff + psize])
            subrs: list[bytes] = []
            if 19 in priv:
                subrs, _ = _read_index(data, poff + int(priv[19][0]))
            return (
                float(priv.get(20, [0.0])[0]),
                float(priv.get(21, [0.0])[0]),
                subrs,
            )

        if self.cid_keyed:
            # CID-keyed: per-FD privates, FDSelect routing, charset =
            # gid -> CID (no encoding; the consumer maps CID -> gid)
            fd_dicts, _ = _read_index(data, int(top[0x0C24][0]))
            self._fd_priv = [read_private(_parse_dict(fdd)) for fdd in fd_dicts]
            self._fd_of = self._parse_fdselect(
                int(top[0x0C25][0]), self.num_glyphs
            )
            self.cid_to_gid = self._parse_charset(
                int(top.get(15, [0])[0]), self.num_glyphs
            )
            self.cmap = {}
        else:
            if 0x0C24 in top or 0x0C25 in top:
                raise ValueError("FDArray/FDSelect without ROS")
            self.default_width, self.nominal_width, self.subrs = read_private(
                top
            )
            # SID -> gid from the charset (offset 0 = ISOAdobe:
            # SID i = gid i) — used by the predefined Standard
            # encoding AND by seac accent composition
            charset_off = int(top.get(15, [0])[0])
            self._sid_to_gid = (
                {i: i for i in range(self.num_glyphs)}
                if charset_off == 0
                else self._parse_charset(charset_off, self.num_glyphs)
            )
            enc_off = int(top.get(16, [0])[0])
            if enc_off == 0:
                # predefined STANDARD encoding (the spec default when
                # the Encoding op is absent): printable ASCII codes
                # 32..126 carry SIDs 1..95 in order
                self.cmap = {
                    c: self._sid_to_gid[c - 31]
                    for c in range(32, 127)
                    if (c - 31) in self._sid_to_gid
                }
            else:
                self.cmap = self._parse_encoding(enc_off)
        self._widths: dict[int, float] = {}
        self._contour_cache: dict[int, list] = {}

    def _parse_fdselect(self, off: int, n: int) -> np.ndarray:
        fmt = self.data[off]
        out = np.zeros(n, np.int32)
        if fmt == 0:
            out[:] = list(self.data[off + 1 : off + 1 + n])
        elif fmt == 3:
            (nr,) = struct.unpack(">H", self.data[off + 1 : off + 3])
            pos = off + 3
            ranges = []
            for _ in range(nr):
                first, fd = struct.unpack(">HB", self.data[pos : pos + 3])
                ranges.append((first, fd))
                pos += 3
            (sentinel,) = struct.unpack(">H", self.data[pos : pos + 2])
            for i, (first, fd) in enumerate(ranges):
                end = ranges[i + 1][0] if i + 1 < len(ranges) else sentinel
                out[first:end] = fd
        else:
            raise NotImplementedError(f"FDSelect format {fmt}")
        return out

    def _parse_charset(self, off: int, n: int) -> dict[int, int]:
        """charset -> {CID: gid} (gid 0 is always CID 0 / .notdef)."""
        if off == 0:
            # predefined charsets are invalid for CID fonts; treat as
            # identity (what a malformed-but-common producer means)
            return {i: i for i in range(n)}
        fmt = self.data[off]
        out = {0: 0}
        gid = 1
        pos = off + 1
        if fmt == 0:
            while gid < n:
                (sid,) = struct.unpack(">H", self.data[pos : pos + 2])
                out[sid] = gid
                gid += 1
                pos += 2
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while gid < n:
                (first,) = struct.unpack(">H", self.data[pos : pos + 2])
                n_left = (
                    self.data[pos + 2]
                    if fmt == 1
                    else struct.unpack(">H", self.data[pos + 2 : pos + 4])[0]
                )
                for k in range(n_left + 1):
                    if gid >= n:
                        break
                    out[first + k] = gid
                    gid += 1
                pos += step
        else:
            raise NotImplementedError(f"charset format {fmt}")
        return out

    def _glyph_env(self, gid: int) -> tuple[float, float, list[bytes]]:
        if self.cid_keyed:
            return self._fd_priv[int(self._fd_of[gid])]
        return self.default_width, self.nominal_width, self.subrs

    def _parse_encoding(self, off: int) -> dict[int, int]:
        if off in (0, 1):  # offset 0 handled by the branch upstream
            raise NotImplementedError("predefined CFF Expert encoding")
        fmt_byte = self.data[off]
        fmt = fmt_byte & 0x7F
        if fmt == 0:
            n_codes = self.data[off + 1]
            cmap = {
                self.data[off + 2 + i]: i + 1  # glyph i+1 gets code[i]
                for i in range(n_codes)
            }
            sup_pos = off + 2 + n_codes
        elif fmt == 1:
            # ranges: (first code, nLeft) — glyphs 1..n assigned in
            # order across the ranges
            n_ranges = self.data[off + 1]
            cmap = {}
            gid = 1
            pos = off + 2
            for _ in range(n_ranges):
                first, n_left = self.data[pos], self.data[pos + 1]
                for k in range(n_left + 1):
                    if gid < self.num_glyphs:
                        cmap[first + k] = gid
                        gid += 1
                pos += 2
            sup_pos = pos
        else:
            raise NotImplementedError(f"CFF encoding format {fmt}")
        if fmt_byte & 0x80:  # supplements: (code, SID) overrides
            n_sups = self.data[sup_pos]
            pos = sup_pos + 1
            for _ in range(n_sups):
                code = self.data[pos]
                (sid,) = struct.unpack(">H", self.data[pos + 1 : pos + 3])
                if sid in self._sid_to_gid:
                    cmap[code] = self._sid_to_gid[sid]
                pos += 3
        return cmap

    @property
    def advances(self) -> np.ndarray:
        # materialized lazily: widths come from charstring execution
        out = np.empty(len(self.charstrings), np.float64)
        for gid in range(len(self.charstrings)):
            out[gid] = self.glyph_width(gid)
        return out

    def glyph_width(self, gid: int) -> float:
        if gid not in self._widths:
            self.glyph_contours(gid)
        return self._widths.get(gid, self.default_width)

    def glyph_contours(self, gid: int) -> list[list[tuple[float, float, bool]]]:
        hit = self._contour_cache.get(gid)
        if hit is not None:
            return hit
        contours, width = self._run_charstring(
            self.charstrings[gid], self._glyph_env(gid)
        )
        self._widths[gid] = width
        self._contour_cache[gid] = contours
        return contours

    # ---------------------------------------- Type 2 interpreter

    def _run_charstring(self, cs: bytes, env=None):
        """Execute one Type 2 charstring -> (contours, advance width).

        ``env`` = (defaultWidthX, nominalWidthX, local subrs) — the
        glyph's FD private for CID-keyed fonts, the font private
        otherwise (default when omitted). Contours are flattened
        polylines: every emitted point is on-curve, so
        pdffont._contour_segments sees straight edges only (integer
        rectangles stay pixel-exact)."""
        env_default, env_nominal, env_subrs = (
            env
            if env is not None
            else (self.default_width, self.nominal_width, self.subrs)
        )
        contours: list[list[tuple[float, float, bool]]] = []
        cur: list[tuple[float, float, bool]] = []
        x = y = 0.0
        stack: list[float] = []
        width: float | None = None
        n_stems = 0
        ts = np.linspace(0.0, 1.0, self.FLATTEN + 1)[1:]

        def take_width(parity: int) -> None:
            nonlocal width
            if width is None:
                if len(stack) % 2 == parity:
                    width = env_nominal + stack.pop(0)
                else:
                    width = env_default

        def close() -> None:
            nonlocal cur
            if cur:
                contours.append(cur)
                cur = []

        def line_to(nx: float, ny: float) -> None:
            nonlocal x, y
            x, y = nx, ny
            cur.append((x, y, True))

        def curve_to(x1, y1, x2, y2, x3, y3) -> None:
            nonlocal x, y
            mt = 1.0 - ts
            bx = (
                mt**3 * x + 3 * mt**2 * ts * x1 + 3 * mt * ts**2 * x2
                + ts**3 * x3
            )
            by = (
                mt**3 * y + 3 * mt**2 * ts * y1 + 3 * mt * ts**2 * y2
                + ts**3 * y3
            )
            for px, py in zip(bx, by):
                cur.append((float(px), float(py), True))
            x, y = x3, y3

        def run(code: bytes, depth: int) -> bool:
            """Returns True when endchar was reached."""
            nonlocal x, y, n_stems
            if depth > 10:
                raise ValueError("Type2 subr recursion too deep")
            i = 0
            while i < len(code):
                b0 = code[i]
                if b0 >= 32 or b0 == 28:
                    if b0 == 28:
                        stack.append(
                            float(struct.unpack(">h", code[i + 1 : i + 3])[0])
                        )
                        i += 3
                    elif b0 <= 246:
                        stack.append(float(b0 - 139))
                        i += 1
                    elif b0 <= 250:
                        stack.append(float((b0 - 247) * 256 + code[i + 1] + 108))
                        i += 2
                    elif b0 <= 254:
                        stack.append(
                            float(-(b0 - 251) * 256 - code[i + 1] - 108)
                        )
                        i += 2
                    else:  # 255: 16.16 fixed
                        stack.append(
                            struct.unpack(">i", code[i + 1 : i + 5])[0] / 65536.0
                        )
                        i += 5
                    continue
                i += 1
                if b0 in (1, 3, 18, 23):  # h/v stem(hm)
                    take_width(1)
                    n_stems += len(stack) // 2
                    stack.clear()
                elif b0 in (19, 20):  # hintmask / cntrmask
                    take_width(1)
                    n_stems += len(stack) // 2
                    stack.clear()
                    i += (n_stems + 7) // 8
                elif b0 == 21:  # rmoveto
                    take_width(1)
                    close()
                    x_, y_ = x + stack[-2], y + stack[-1]
                    x, y = x_, y_
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 22:  # hmoveto
                    take_width(0)
                    close()
                    x += stack[-1]
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 4:  # vmoveto
                    take_width(0)
                    close()
                    y += stack[-1]
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 5:  # rlineto
                    for j in range(0, len(stack) - 1, 2):
                        line_to(x + stack[j], y + stack[j + 1])
                    stack.clear()
                elif b0 in (6, 7):  # hlineto / vlineto (alternating)
                    horiz = b0 == 6
                    for d in stack:
                        if horiz:
                            line_to(x + d, y)
                        else:
                            line_to(x, y + d)
                        horiz = not horiz
                    stack.clear()
                elif b0 == 8:  # rrcurveto
                    for j in range(0, len(stack) - 5, 6):
                        a = stack[j : j + 6]
                        curve_to(
                            x + a[0], y + a[1],
                            x + a[0] + a[2], y + a[1] + a[3],
                            x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                        )
                    stack.clear()
                elif b0 == 24:  # rcurveline
                    j = 0
                    while len(stack) - j >= 8:
                        a = stack[j : j + 6]
                        curve_to(
                            x + a[0], y + a[1],
                            x + a[0] + a[2], y + a[1] + a[3],
                            x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                        )
                        j += 6
                    line_to(x + stack[j], y + stack[j + 1])
                    stack.clear()
                elif b0 == 25:  # rlinecurve
                    j = 0
                    while len(stack) - j >= 8:
                        line_to(x + stack[j], y + stack[j + 1])
                        j += 2
                    a = stack[j : j + 6]
                    curve_to(
                        x + a[0], y + a[1],
                        x + a[0] + a[2], y + a[1] + a[3],
                        x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                    )
                    stack.clear()
                elif b0 == 26:  # vvcurveto
                    j = 0
                    dx1 = 0.0
                    if len(stack) % 4 == 1:
                        dx1 = stack[0]
                        j = 1
                    while j + 3 < len(stack):
                        x1, y1 = x + dx1, y + stack[j]
                        x2, y2 = x1 + stack[j + 1], y1 + stack[j + 2]
                        curve_to(x1, y1, x2, y2, x2, y2 + stack[j + 3])
                        dx1 = 0.0
                        j += 4
                    stack.clear()
                elif b0 == 27:  # hhcurveto
                    j = 0
                    dy1 = 0.0
                    if len(stack) % 4 == 1:
                        dy1 = stack[0]
                        j = 1
                    while j + 3 < len(stack):
                        x1, y1 = x + stack[j], y + dy1
                        x2, y2 = x1 + stack[j + 1], y1 + stack[j + 2]
                        curve_to(x1, y1, x2, y2, x2 + stack[j + 3], y2)
                        dy1 = 0.0
                        j += 4
                    stack.clear()
                elif b0 in (30, 31):  # vh / hv curveto
                    horiz = b0 == 31
                    j = 0
                    while j + 3 < len(stack):
                        last = len(stack) - j == 5
                        if horiz:
                            x1, y1 = x + stack[j], y
                            x2, y2 = x1 + stack[j + 1], y1 + stack[j + 2]
                            x3 = x2 + (stack[j + 4] if last else 0.0)
                            curve_to(x1, y1, x2, y2, x3, y2 + stack[j + 3])
                        else:
                            x1, y1 = x, y + stack[j]
                            x2, y2 = x1 + stack[j + 1], y1 + stack[j + 2]
                            y3 = y2 + (stack[j + 4] if last else 0.0)
                            curve_to(x1, y1, x2, y2, x2 + stack[j + 3], y3)
                        horiz = not horiz
                        j += 4
                    stack.clear()
                elif b0 == 10:  # callsubr
                    idx = int(stack.pop()) + _bias(env_subrs)
                    if run(env_subrs[idx], depth + 1):
                        return True
                elif b0 == 29:  # callgsubr
                    idx = int(stack.pop()) + _bias(self.gsubrs)
                    if run(self.gsubrs[idx], depth + 1):
                        return True
                elif b0 == 11:  # return
                    return False
                elif b0 == 14:  # endchar
                    take_width(1)
                    if len(stack) >= 4:
                        # seac accent composition (Type 2 Appendix C):
                        # adx ady bchar achar — bchar/achar are
                        # STANDARD encoding codes regardless of the
                        # font's own encoding
                        achar = int(stack.pop())
                        bchar = int(stack.pop())
                        ady = stack.pop()
                        adx = stack.pop()
                        close()

                        def _std_gid(code: int) -> int:
                            if not 32 <= code <= 126:
                                raise NotImplementedError(
                                    "seac with a non-ASCII Standard code"
                                )
                            sid = code - 31
                            m = getattr(self, "_sid_to_gid", None) or {}
                            if sid not in m:
                                raise ValueError(
                                    f"seac: SID {sid} not in charset"
                                )
                            return m[sid]

                        for c in self.glyph_contours(_std_gid(bchar)):
                            contours.append(list(c))
                        for c in self.glyph_contours(_std_gid(achar)):
                            contours.append(
                                [(px + adx, py + ady, on) for px, py, on in c]
                            )
                        return True
                    if stack:
                        raise ValueError("endchar with stray operands")
                    close()
                    return True
                elif b0 == 12:  # escapes: the four flex variants
                    b1 = code[i]
                    i += 1
                    if b1 == 35:  # flex: two cubics + fd (ignored)
                        a = stack
                        curve_to(
                            x + a[0], y + a[1],
                            x + a[0] + a[2], y + a[1] + a[3],
                            x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                        )
                        curve_to(
                            x + a[6], y + a[7],
                            x + a[6] + a[8], y + a[7] + a[9],
                            x + a[6] + a[8] + a[10], y + a[7] + a[9] + a[11],
                        )
                        stack.clear()
                    elif b1 == 34:  # hflex (y returns to start)
                        a = stack
                        y0 = y
                        curve_to(
                            x + a[0], y,
                            x + a[0] + a[1], y + a[2],
                            x + a[0] + a[1] + a[3], y + a[2],
                        )
                        curve_to(
                            x + a[4], y,
                            x + a[4] + a[5], y0,
                            x + a[4] + a[5] + a[6], y0,
                        )
                        stack.clear()
                    elif b1 == 36:  # hflex1
                        a = stack
                        y0 = y
                        curve_to(
                            x + a[0], y + a[1],
                            x + a[0] + a[2], y + a[1] + a[3],
                            x + a[0] + a[2] + a[4], y + a[1] + a[3],
                        )
                        curve_to(
                            x + a[5], y,
                            x + a[5] + a[6], y + a[7],
                            x + a[5] + a[6] + a[8], y0,
                        )
                        stack.clear()
                    elif b1 == 37:  # flex1: d6 is dx6 or dy6 by dominance
                        a = stack
                        x0, y0 = x, y
                        dx = sum(a[k] for k in (0, 2, 4, 6, 8))
                        dy = sum(a[k] for k in (1, 3, 5, 7, 9))
                        curve_to(
                            x + a[0], y + a[1],
                            x + a[0] + a[2], y + a[1] + a[3],
                            x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                        )
                        c2x, c2y = x + a[6] + a[8], y + a[7] + a[9]
                        if abs(dx) > abs(dy):
                            ex, ey = c2x + a[10], y0
                        else:
                            ex, ey = x0, c2y + a[10]
                        curve_to(x + a[6], y + a[7], c2x, c2y, ex, ey)
                        stack.clear()
                    else:
                        raise NotImplementedError(f"Type2 escape op 12 {b1}")
                else:
                    raise NotImplementedError(f"Type2 operator {b0}")
            return False

        done = run(cs, 0)
        if not done:
            close()
        if width is None:
            width = env_default
        return contours, width


# --------------------------------------------------------------- writer


def _dict_int(v: int) -> bytes:
    """Fixed-width (op 29) DICT integer — stable size for offset fixup."""
    return b"\x1d" + struct.pack(">i", v)


def _dict_real(v: str) -> bytes:
    """DICT real from its decimal string, BCD-nibble encoded."""
    nibs = []
    for ch in v:
        if ch == ".":
            nibs.append(0xA)
        elif ch == "-":
            nibs.append(0xE)
        else:
            nibs.append(int(ch))
    nibs.append(0xF)
    if len(nibs) % 2:
        nibs.append(0xF)
    return b"\x1e" + bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
    )


def _make_index(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    out = struct.pack(">HB", len(items), 4)
    out += b"".join(struct.pack(">I", o) for o in offs)
    return out + b"".join(items)


def _cs_num(v: int) -> bytes:
    """Type 2 charstring integer operand."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    return b"\x1c" + struct.pack(">h", v)


def build_cff(
    glyphs: list[list[list[tuple[int, int, bool]]]],
    encoding: dict[int, int],
    default_width: int,
    upem: int,
    standard_encoding: bool = False,
    format1_encoding: bool = False,
    supplement: tuple[int, int] | None = None,
) -> bytes:
    """Minimal valid bare-CFF binary (the /Type1C payload). Mirrors
    pdffont.build_ttf: ``glyphs[i]`` is glyph i's rectangle-contour
    list (glyph 0 = .notdef, empty); ``encoding`` maps byte code ->
    gid (gids must be 1..N in order, the format-0 layout).
    ``standard_encoding=True`` OMITS the Encoding op (the spec default
    = Standard encoding) and instead writes a format-0 charset whose
    SIDs realize the same code->gid mapping — codes must then be
    printable ASCII 32..126."""
    charstrings = []
    for contours in glyphs:
        cs = b""
        x = y = 0
        for cont in contours:
            pts = [(int(px), int(py)) for px, py, _ in cont]
            cs += _cs_num(pts[0][0] - x) + _cs_num(pts[0][1] - y) + b"\x15"
            x, y = pts[0]
            for px, py in pts[1:]:
                cs += _cs_num(px - x) + _cs_num(py - y) + b"\x05"
                x, y = px, py
        charstrings.append(cs + b"\x0e")  # endchar (closes last contour)
    cs_index = _make_index(charstrings)

    # format-0 encoding: code[i] is glyph i+1's code
    by_gid = sorted(encoding.items(), key=lambda kv: kv[1])
    assert [g for _, g in by_gid] == list(range(1, len(by_gid) + 1))
    if standard_encoding:
        if not all(32 <= code <= 126 for code, _ in by_gid):
            raise ValueError("standard_encoding needs codes in 32..126")
        # format-0 charset: glyph i+1 carries SID code_i - 31, so the
        # Standard encoding (code -> SID c-31) lands on the same gid
        enc = b"\x00" + b"".join(
            struct.pack(">H", code - 31) for code, _ in by_gid
        )
    elif format1_encoding:
        # format-1 encoding: consecutive code runs as (first, nLeft)
        # ranges; glyphs 1..n assigned in order across the ranges —
        # requires codes ascending with gids (true for our builders)
        codes = [code for code, _ in by_gid]
        assert codes == sorted(codes)
        ranges: list[tuple[int, int]] = []
        for code in codes:
            if ranges and code == ranges[-1][0] + ranges[-1][1] + 1:
                ranges[-1] = (ranges[-1][0], ranges[-1][1] + 1)
            else:
                ranges.append((code, 0))
        enc = bytes([1, len(ranges)]) + b"".join(
            bytes([first, n_left]) for first, n_left in ranges
        )
        if supplement is not None:
            # high bit flags supplements: (code, SID) overrides — with
            # the identity charset SID == gid
            code, gid = supplement
            enc = bytes([enc[0] | 0x80]) + enc[1:] + bytes([1, code]) + (
                struct.pack(">H", gid)
            )
    else:
        enc = bytes([0, len(by_gid)]) + bytes(code for code, _ in by_gid)

    priv = _dict_int(default_width) + b"\x14"  # defaultWidthX
    priv += _dict_int(0) + b"\x15"  # nominalWidthX

    name_index = _make_index([b"PixelGlyphCFF"])
    string_index = _make_index([])
    gsubr_index = _make_index([])
    scale = repr(1.0 / upem)  # decimal string; parser rounds 1/m[0]

    def top_dict(cs_off: int, enc_off: int, priv_off: int) -> bytes:
        d = (
            _dict_real(scale) + _dict_int(0) + _dict_int(0)
            + _dict_real(scale) + _dict_int(0) + _dict_int(0)
            + b"\x0c\x07"  # FontMatrix
        )
        if standard_encoding:
            d += _dict_int(enc_off) + b"\x0f"  # charset (Encoding absent)
        else:
            d += _dict_int(enc_off) + b"\x10"  # Encoding
        d += _dict_int(cs_off) + b"\x11"  # CharStrings
        d += _dict_int(len(priv)) + _dict_int(priv_off) + b"\x12"  # Private
        return d

    header = bytes([1, 0, 4, 4])
    # two-pass: top dict operands are fixed-width, so sizes are stable
    probe = _make_index([top_dict(0, 0, 0)])
    base = len(header) + len(name_index) + len(probe) + len(string_index) + len(
        gsubr_index
    )
    enc_off = base
    cs_off = enc_off + len(enc)
    priv_off = cs_off + len(cs_index)
    top_index = _make_index([top_dict(cs_off, enc_off, priv_off)])
    assert len(top_index) == len(probe)
    return (
        header + name_index + top_index + string_index + gsubr_index
        + enc + cs_index + priv
    )


def make_glyph_cff() -> tuple[bytes, dict[str, int]]:
    """The engine's procedural pixel font as a bare CFF — the Type1C
    twin of pdffont.make_glyph_ttf (same scrambled subset encoding,
    same rectangle outlines, upem = GLYPH_H)."""
    import hashlib

    from ..glyphs import FONT, GLYPH_H, GLYPH_W, VOCAB
    from .pdffont import _bitmap_contours

    order = sorted(
        VOCAB, key=lambda ch: hashlib.md5(f"sub:{ch}".encode()).hexdigest()
    )
    glyphs: list[list] = [[]]  # gid 0 = .notdef
    encoding: dict[int, int] = {}
    char_code: dict[str, int] = {}
    for i, ch in enumerate(order):
        glyphs.append(_bitmap_contours(FONT[ch]))
        encoding[0x21 + i] = i + 1
        char_code[ch] = 0x21 + i
    return (
        build_cff(glyphs, encoding, default_width=GLYPH_W + 1, upem=GLYPH_H),
        char_code,
    )


def build_cff_cid(
    glyphs: list[list[list[tuple[int, int, bool]]]],
    default_width: int,
    upem: int,
) -> bytes:
    """Minimal valid CID-keyed CFF (the /CIDFontType0C payload):
    ROS Adobe-Identity-0, identity charset (CID i = gid i), one Font
    DICT holding the shared Private, FDSelect format 3 routing every
    glyph to it. Mirrors :func:`build_cff` for the composite form."""
    charstrings = []
    for contours in glyphs:
        cs = b""
        x = y = 0
        for cont in contours:
            pts = [(int(px), int(py)) for px, py, _ in cont]
            cs += _cs_num(pts[0][0] - x) + _cs_num(pts[0][1] - y) + b"\x15"
            x, y = pts[0]
            for px, py in pts[1:]:
                cs += _cs_num(px - x) + _cs_num(py - y) + b"\x05"
                x, y = px, py
        charstrings.append(cs + b"\x0e")
    cs_index = _make_index(charstrings)
    n = len(charstrings)

    priv = _dict_int(default_width) + b"\x14" + _dict_int(0) + b"\x15"
    # identity charset, format 2: gids 1..n-1 carry CIDs 1..n-1
    charset = b"\x02" + struct.pack(">HH", 1, max(0, n - 2))
    # FDSelect format 3: one range, every glyph -> FD 0
    fdselect = b"\x03" + struct.pack(">HHB", 1, 0, 0) + struct.pack(">H", n)

    name_index = _make_index([b"PixelGlyphCIDCFF"])
    # custom strings: SID 391 = "Adobe", 392 = "Identity"
    string_index = _make_index([b"Adobe", b"Identity"])
    gsubr_index = _make_index([])
    scale = repr(1.0 / upem)

    def fd_dict(priv_off: int) -> bytes:
        return _dict_int(len(priv)) + _dict_int(priv_off) + b"\x12"

    def top_dict(cs_off, charset_off, fdarray_off, fdselect_off) -> bytes:
        d = (
            _dict_int(391) + _dict_int(392) + _dict_int(0) + b"\x0c\x1e"  # ROS
        )
        d += (
            _dict_real(scale) + _dict_int(0) + _dict_int(0)
            + _dict_real(scale) + _dict_int(0) + _dict_int(0)
            + b"\x0c\x07"  # FontMatrix
        )
        d += _dict_int(charset_off) + b"\x0f"  # charset
        d += _dict_int(cs_off) + b"\x11"  # CharStrings
        d += _dict_int(fdarray_off) + b"\x0c\x24"  # FDArray
        d += _dict_int(fdselect_off) + b"\x0c\x25"  # FDSelect
        return d

    header = bytes([1, 0, 4, 4])
    probe_fdarray = _make_index([fd_dict(0)])
    probe = _make_index([top_dict(0, 0, 0, 0)])
    base = (
        len(header) + len(name_index) + len(probe) + len(string_index)
        + len(gsubr_index)
    )
    charset_off = base
    fdselect_off = charset_off + len(charset)
    cs_off = fdselect_off + len(fdselect)
    fdarray_off = cs_off + len(cs_index)
    priv_off = fdarray_off + len(probe_fdarray)
    fdarray = _make_index([fd_dict(priv_off)])
    assert len(fdarray) == len(probe_fdarray)
    top_index = _make_index(
        [top_dict(cs_off, charset_off, fdarray_off, fdselect_off)]
    )
    assert len(top_index) == len(probe)
    return (
        header + name_index + top_index + string_index + gsubr_index
        + charset + fdselect + cs_index + fdarray + priv
    )


def make_glyph_cff_cid() -> tuple[bytes, dict[str, int]]:
    """The engine's procedural pixel font as a CID-keyed CFF — the
    /CIDFontType0C twin of make_glyph_cff (identity charset: the
    composite wrapper's 2-byte CIDs are the gids directly)."""
    import hashlib

    from ..glyphs import FONT, GLYPH_H, GLYPH_W, VOCAB
    from .pdffont import _bitmap_contours

    order = sorted(
        VOCAB, key=lambda ch: hashlib.md5(f"sub:{ch}".encode()).hexdigest()
    )
    glyphs: list[list] = [[]]  # gid 0 = .notdef
    char_code: dict[str, int] = {}
    for i, ch in enumerate(order):
        glyphs.append(_bitmap_contours(FONT[ch]))
        char_code[ch] = 0x21 + i  # same scrambled order as the twins
    return (
        build_cff_cid(glyphs, default_width=GLYPH_W + 1, upem=GLYPH_H),
        char_code,
    )
