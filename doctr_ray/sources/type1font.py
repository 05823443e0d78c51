"""Original Adobe Type 1 fonts (PDF ``/FontFile``, PFB/PFA programs).

Closes the last single-byte font technology behind the reference's
pdfium rasterization (io/pdf.py:16-43): the pre-CFF PostScript font —
an eexec-encrypted program whose glyphs are Type 1 charstrings. Pure
stdlib + numpy:

- PFB segmentation (0x80-framed ascii/binary blocks) and raw PFA/PT1
  handling;
- eexec decryption (r=55665) of the Private portion and per-charstring
  decryption (r=4330, lenIV skip);
- /Encoding parsing (``dup <code> /<name> put``), /Subrs and
  /CharStrings extraction (``/name len RD <bin> ND``);
- a Type 1 charstring interpreter: hsbw side-bearing/width, the
  moveto/lineto/curveto families, closepath, callsubr/return, div,
  seac accent composition (Standard-code glyph lookup +
  sidebearing-relative placement), and the standard OtherSubrs
  0/1/2 flex protocol (flex points collected from the seven rmovetos
  and emitted as two cubics) plus OtherSubr 3 hint replacement;
- a WRITER (``build_type1``/``make_glyph_type1``) mirroring
  pdffont.build_ttf: the engine's rectangle pixel glyphs as integer
  rmoveto/rlineto charstrings, properly double-encrypted — rendering
  reproduces the procedural font bit-exactly.

Like cfffont.CFFFont this duck-types TrueTypeFont's rendering surface:
``upem`` / ``cmap`` / ``glyph_contours(gid)`` / ``glyph_width(gid)``
(flattened polyline contours feed pdffont.fill_glyph directly).
"""

from __future__ import annotations

import re

import numpy as np

_EEXEC_R = 55665
_CHARSTRING_R = 4330
_C1, _C2 = 52845, 22719


def _decrypt(data: bytes, r: int, skip: int) -> bytes:
    out = bytearray()
    for c in data:
        out.append(c ^ (r >> 8))
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[skip:])


def _encrypt(data: bytes, r: int, lead: int) -> bytes:
    """Inverse of :func:`_decrypt` — ``lead`` random-looking leading
    bytes (deterministic here) are prepended per the spec."""
    plain = bytes(range(42, 42 + lead)) + data
    out = bytearray()
    for p in plain:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def _split_pfb(data: bytes) -> bytes:
    """PFB 0x80-framed segments -> concatenated program; raw PFA/PT1
    passes through."""
    if not data.startswith(b"\x80"):
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos] == 0x80:
        t = data[pos + 1]
        if t == 3:  # EOF
            break
        n = int.from_bytes(data[pos + 2 : pos + 6], "little")
        out += data[pos + 6 : pos + 6 + n]
        pos += 6 + n
    return bytes(out)


_ENC_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put")
_CS_RE = re.compile(rb"/([^\s/{}()]+)\s+(\d+)\s+(?:RD|-\|)[ ]")
_SUBR_RE = re.compile(rb"dup\s+(\d+)\s+(\d+)\s+(?:RD|-\|)[ ]")


#: Adobe StandardEncoding code -> glyph name (the subset seac uses:
#: letters, digits, and the accent block at 0301-0313 octal)
_STD_ENC_NAMES: dict[int, bytes] = {}
for _i in range(26):
    _STD_ENC_NAMES[65 + _i] = bytes([65 + _i])
    _STD_ENC_NAMES[97 + _i] = bytes([97 + _i])
for _c, _nm in zip(
    range(48, 58),
    (b"zero", b"one", b"two", b"three", b"four", b"five", b"six",
     b"seven", b"eight", b"nine"),
):
    _STD_ENC_NAMES[_c] = _nm
_STD_ENC_NAMES.update({
    193: b"grave", 194: b"acute", 195: b"circumflex", 196: b"tilde",
    197: b"macron", 198: b"breve", 199: b"dotaccent", 200: b"dieresis",
    202: b"ring", 203: b"cedilla", 205: b"hungarumlaut", 206: b"ogonek",
    207: b"caron",
})


class Type1Font:
    """Minimal Type 1 font parser + charstring interpreter."""

    #: cubic Béziers are flattened to this many chords per curve
    FLATTEN = 8

    def __init__(self, data: bytes):
        prog = _split_pfb(data)
        m = re.search(rb"\beexec\b", prog)
        if m is None:
            raise ValueError("not a Type 1 font program (no eexec)")
        clear = prog[: m.start()]
        enc = prog[m.end() :].lstrip(b"\r\n\t ")
        if re.fullmatch(rb"[0-9A-Fa-f\s]{16,}.*", enc[:64], re.S) and all(
            c in b"0123456789ABCDEFabcdef \r\n\t" for c in enc[:64]
        ):
            enc = bytes.fromhex(
                re.sub(rb"[^0-9A-Fa-f]", b"", enc).decode()
            )
        priv = _decrypt(enc, _EEXEC_R, 4)
        lm = re.search(rb"/lenIV\s+(\d+)", priv)
        leniv = int(lm.group(1)) if lm else 4
        # font matrix (cleartext): /FontMatrix [a b c d e f]
        fm = re.search(rb"/FontMatrix\s*\[([^\]]*)\]", clear)
        scale = float(fm.group(1).split()[0]) if fm else 0.001
        self.upem = int(round(1.0 / scale))
        # encoding: code -> glyph name
        self.code_to_name: dict[int, bytes] = {
            int(em.group(1)): em.group(2)
            for em in _ENC_RE.finditer(clear)
        }
        # subrs
        self.subrs: list[bytes] = []
        sm = re.search(rb"/Subrs\s+(\d+)", priv)
        if sm:
            self.subrs = [b""] * int(sm.group(1))
            pos = sm.end()
            for _ in range(len(self.subrs)):
                mm = _SUBR_RE.search(priv, pos)
                if mm is None:
                    break
                n, ln = int(mm.group(1)), int(mm.group(2))
                raw = priv[mm.end() : mm.end() + ln]
                self.subrs[n] = _decrypt(raw, _CHARSTRING_R, leniv)
                pos = mm.end() + ln
        # charstrings: name -> decrypted program
        self.charstrings: dict[bytes, bytes] = {}
        cm = re.search(rb"/CharStrings\s+(\d+)", priv)
        pos = cm.end() if cm else 0
        while True:
            mm = _CS_RE.search(priv, pos)
            if mm is None:
                break
            name, ln = mm.group(1), int(mm.group(2))
            raw = priv[mm.end() : mm.end() + ln]
            self.charstrings[name] = _decrypt(raw, _CHARSTRING_R, leniv)
            pos = mm.end() + ln
        # gid table: stable order, gid 0 = .notdef when present
        names = sorted(self.charstrings)
        if b".notdef" in self.charstrings:
            names.remove(b".notdef")
            names.insert(0, b".notdef")
        self._gid_name = names
        self.cmap: dict[int, int] = {
            code: self._gid_name.index(nm)
            for code, nm in self.code_to_name.items()
            if nm in self.charstrings
        }
        self._contours: dict[int, list] = {}
        self._widths: dict[int, float] = {}

    def glyph_width(self, gid: int) -> float:
        if gid not in self._widths:
            self.glyph_contours(gid)
        return self._widths.get(gid, 0.0)

    def glyph_contours(self, gid: int):
        hit = self._contours.get(gid)
        if hit is not None:
            return hit
        cs = self.charstrings[self._gid_name[gid]]
        contours, width = self._run(cs)
        self._contours[gid] = contours
        self._widths[gid] = width
        return contours

    # ------------------------------------------- charstring interpreter

    def _std_gid(self, code: int) -> int:
        """StandardEncoding code -> gid (seac's bchar/achar operands
        name glyphs through Adobe's STANDARD encoding regardless of
        the font's own /Encoding)."""
        name = _STD_ENC_NAMES.get(code)
        if name is None:
            raise NotImplementedError(
                f"seac with unmapped Standard code {code}"
            )
        try:
            return self._gid_name.index(name)
        except ValueError:
            raise ValueError(f"seac: glyph /{name.decode()} not in font")

    def _run(self, cs: bytes):
        contours: list[list[tuple[float, float, bool]]] = []
        cur: list[tuple[float, float, bool]] = []
        x = y = 0.0
        width = 0.0
        sbx0 = 0.0
        stack: list[float] = []
        ps_stack: list[float] = []  # OtherSubrs interface
        flex_pts: list[tuple[float, float]] = []
        in_flex = False
        ts = np.linspace(0.0, 1.0, self.FLATTEN + 1)[1:]

        def close() -> None:
            nonlocal cur
            if cur:
                contours.append(cur)
                cur = []

        def curve_to(x1, y1, x2, y2, x3, y3) -> None:
            nonlocal x, y
            mt = 1.0 - ts
            bx = mt**3 * x + 3 * mt**2 * ts * x1 + 3 * mt * ts**2 * x2 + ts**3 * x3
            by = mt**3 * y + 3 * mt**2 * ts * y1 + 3 * mt * ts**2 * y2 + ts**3 * y3
            for px, py in zip(bx, by):
                cur.append((float(px), float(py), True))
            x, y = x3, y3

        def run(code: bytes, depth: int) -> bool:
            nonlocal x, y, width, in_flex, sbx0
            if depth > 10:
                raise ValueError("Type1 subr recursion too deep")
            i = 0
            while i < len(code):
                b0 = code[i]
                if b0 >= 32:
                    if b0 <= 246:
                        stack.append(float(b0 - 139))
                        i += 1
                    elif b0 <= 250:
                        stack.append(float((b0 - 247) * 256 + code[i + 1] + 108))
                        i += 2
                    elif b0 <= 254:
                        stack.append(float(-(b0 - 251) * 256 - code[i + 1] - 108))
                        i += 2
                    else:
                        stack.append(
                            float(int.from_bytes(code[i + 1 : i + 5], "big", signed=True))
                        )
                        i += 5
                    continue
                i += 1
                if b0 == 13:  # hsbw: sbx wx
                    sbx, width = stack[0], stack[1]
                    x, y = sbx, 0.0
                    sbx0 = sbx  # kept for seac's accent placement
                    stack.clear()
                elif b0 == 21:  # rmoveto
                    if in_flex:
                        x, y = x + stack[-2], y + stack[-1]
                        flex_pts.append((x, y))
                    else:
                        close()
                        x, y = x + stack[-2], y + stack[-1]
                        cur.append((x, y, True))
                    stack.clear()
                elif b0 == 22:  # hmoveto
                    if in_flex:
                        x += stack[-1]
                        flex_pts.append((x, y))
                    else:
                        close()
                        x += stack[-1]
                        cur.append((x, y, True))
                    stack.clear()
                elif b0 == 4:  # vmoveto
                    if in_flex:
                        y += stack[-1]
                        flex_pts.append((x, y))
                    else:
                        close()
                        y += stack[-1]
                        cur.append((x, y, True))
                    stack.clear()
                elif b0 == 5:  # rlineto
                    x, y = x + stack[0], y + stack[1]
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 6:  # hlineto
                    x += stack[0]
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 7:  # vlineto
                    y += stack[0]
                    cur.append((x, y, True))
                    stack.clear()
                elif b0 == 8:  # rrcurveto
                    a = stack
                    curve_to(
                        x + a[0], y + a[1],
                        x + a[0] + a[2], y + a[1] + a[3],
                        x + a[0] + a[2] + a[4], y + a[1] + a[3] + a[5],
                    )
                    stack.clear()
                elif b0 == 30:  # vhcurveto
                    a = stack
                    curve_to(x, y + a[0], x + a[1], y + a[0] + a[2],
                             x + a[1] + a[3], y + a[0] + a[2])
                    stack.clear()
                elif b0 == 31:  # hvcurveto
                    a = stack
                    curve_to(x + a[0], y, x + a[0] + a[1], y + a[2],
                             x + a[0] + a[1], y + a[2] + a[3])
                    stack.clear()
                elif b0 == 9:  # closepath
                    close()
                    stack.clear()
                elif b0 == 10:  # callsubr
                    n = int(stack.pop())
                    if in_flex and n in (1, 2):
                        pass  # flex bookkeeping subrs: no drawing
                    elif run(self.subrs[n], depth + 1):
                        return True
                elif b0 == 11:  # return
                    return False
                elif b0 in (1, 3):  # hstem / vstem
                    stack.clear()
                elif b0 == 14:  # endchar
                    close()
                    return True
                elif b0 == 12:
                    b1 = code[i]
                    i += 1
                    if b1 == 12:  # div
                        b = stack.pop()
                        a = stack.pop()
                        stack.append(a / b)
                    elif b1 == 16:  # callothersubr
                        othersubr = int(stack.pop())
                        n_args = int(stack.pop())
                        args = [stack.pop() for _ in range(n_args)][::-1]
                        if othersubr == 1:  # flex start
                            in_flex = True
                            flex_pts.clear()
                        elif othersubr == 0:  # flex end: 2 cubics
                            in_flex = False
                            p = flex_pts[1:]  # pts[0] is the reference point
                            # rewind pen to flex origin (pre-collection)
                            if len(p) >= 6:
                                x0, y0 = cur[-1][0], cur[-1][1]
                                sx, sy = x, y
                                x, y = x0, y0
                                curve_to(*p[0], *p[1], *p[2])
                                curve_to(*p[3], *p[4], *p[5])
                            ps_stack.clear()
                            ps_stack.extend([y, x])
                        elif othersubr == 3:  # hint replacement
                            ps_stack.clear()
                            ps_stack.append(3.0)
                        else:
                            ps_stack.clear()
                            ps_stack.extend(args[::-1])
                    elif b1 == 17:  # pop
                        stack.append(ps_stack.pop() if ps_stack else 0.0)
                    elif b1 == 7:  # sbw: sbx sby wx wy
                        x, y, width = stack[0], stack[1], stack[2]
                        stack.clear()
                    elif b1 == 33:  # setcurrentpoint (after flex)
                        stack.clear()
                    elif b1 in (0, 1, 2):  # dotsection / vstem3 / hstem3
                        stack.clear()
                    elif b1 == 6:  # seac: asb adx ady bchar achar
                        asb, adx, ady = stack[0], stack[1], stack[2]
                        bchar, achar = int(stack[3]), int(stack[4])
                        stack.clear()
                        close()
                        for cnt in self.glyph_contours(
                            self._std_gid(bchar)
                        ):
                            contours.append(list(cnt))
                        # Type 1 spec: the accent's sidebearing point
                        # lands at sbx - asb + adx of the composite
                        dx = sbx0 - asb + adx
                        for cnt in self.glyph_contours(
                            self._std_gid(achar)
                        ):
                            contours.append(
                                [(px + dx, py + ady, on)
                                 for px, py, on in cnt]
                            )
                        return True
                    else:
                        raise NotImplementedError(f"Type1 escape op 12 {b1}")
                else:
                    raise NotImplementedError(f"Type1 operator {b0}")
            return False

        run(cs, 0)
        close()
        return contours, width


# --------------------------------------------------------------- writer


def build_type1(
    glyphs: dict[bytes, list[list[tuple[int, int, bool]]]],
    encoding: dict[int, bytes],
    widths: dict[bytes, int],
    upem: int,
) -> bytes:
    """Minimal valid PFB Type 1 program: rectangle-contour glyphs as
    hsbw + rmoveto/rlineto/closepath charstrings, double-encrypted."""
    def cs_num(v: int) -> bytes:
        if -107 <= v <= 107:
            return bytes([v + 139])
        if 108 <= v <= 1131:
            v -= 108
            return bytes([(v >> 8) + 247, v & 0xFF])
        if -1131 <= v <= -108:
            v = -v - 108
            return bytes([(v >> 8) + 251, v & 0xFF])
        return b"\xff" + v.to_bytes(4, "big", signed=True)

    entries = []
    for name, contours in glyphs.items():
        cs = cs_num(0) + cs_num(widths.get(name, 0)) + b"\x0d"  # hsbw
        x = y = 0
        for cont in contours:
            pts = [(int(px), int(py)) for px, py, _ in cont]
            cs += cs_num(pts[0][0] - x) + cs_num(pts[0][1] - y) + b"\x15"
            x, y = pts[0]
            for px, py in pts[1:]:
                cs += cs_num(px - x) + cs_num(py - y) + b"\x05"
                x, y = px, py
            cs += b"\x09"  # closepath
        cs += b"\x0e"  # endchar
        entries.append((name, _encrypt(cs, _CHARSTRING_R, 4)))

    scale = repr(1.0 / upem)
    enc_lines = b"".join(
        b"dup %d /%s put\n" % (code, nm) for code, nm in sorted(encoding.items())
    )
    clear = (
        b"%!PS-AdobeFont-1.0: PixelGlyphT1 001.001\n"
        b"/FontName /PixelGlyphT1 def\n"
        b"/FontMatrix [" + scale.encode() + b" 0 0 " + scale.encode()
        + b" 0 0] def\n"
        b"/FontType 1 def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        + enc_lines
        + b"readonly def\n"
        b"currentdict end\n"
        b"currentfile eexec\n"
    )
    priv = bytearray()
    priv += b"dup /Private 8 dict dup begin\n/lenIV 4 def\n"
    priv += b"/Subrs 0 array ND\n"
    priv += b"/CharStrings %d dict dup begin\n" % (len(entries) + 1)
    notdef = _encrypt(cs_num(0) + cs_num(0) + b"\x0d\x0e", _CHARSTRING_R, 4)
    priv += b"/.notdef %d RD " % len(notdef) + notdef + b" ND\n"
    for name, enc_cs in entries:
        priv += b"/%s %d RD " % (name, len(enc_cs)) + enc_cs + b" ND\n"
    priv += b"end\nend\nmark currentfile closefile\n"
    encrypted = _encrypt(bytes(priv), _EEXEC_R, 4)
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"

    def pfb_seg(t: int, payload: bytes) -> bytes:
        return bytes([0x80, t]) + len(payload).to_bytes(4, "little") + payload

    return (
        pfb_seg(1, clear)
        + pfb_seg(2, encrypted)
        + pfb_seg(1, trailer)
        + b"\x80\x03"
    )


def make_glyph_type1() -> tuple[bytes, dict[str, int]]:
    """The engine's procedural pixel font as a PFB Type 1 program — the
    /FontFile twin of pdffont.make_glyph_ttf (same scrambled subset
    encoding, same rectangle outlines, upem = GLYPH_H)."""
    import hashlib

    from ..glyphs import FONT, GLYPH_H, GLYPH_W, VOCAB
    from .pdffont import _bitmap_contours

    order = sorted(
        VOCAB, key=lambda ch: hashlib.md5(f"sub:{ch}".encode()).hexdigest()
    )
    glyphs: dict[bytes, list] = {}
    encoding: dict[int, bytes] = {}
    widths: dict[bytes, int] = {}
    char_code: dict[str, int] = {}
    for i, ch in enumerate(order):
        nm = b"g%03d" % i
        glyphs[nm] = _bitmap_contours(FONT[ch])
        encoding[0x21 + i] = nm
        widths[nm] = GLYPH_W + 1
        char_code[ch] = 0x21 + i
    return build_type1(glyphs, encoding, widths, upem=GLYPH_H), char_code
