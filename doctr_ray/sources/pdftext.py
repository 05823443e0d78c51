"""Minimal pure-stdlib PDF native-text extraction.

The reference rasterizes PDFs with pypdfium2 and OCRs the pixels
(io/pdf.py:16-43) — that native decoder is absent here. But a huge
share of real-world PDFs carry a NATIVE TEXT LAYER, and a scale
pipeline should read it directly instead of paying OCR: this module
parses the PDF object graph (stdlib ``re`` + ``zlib``) far enough to
pull the text layer out of "well-behaved" PDFs:

- classic cross-referenced bodies (the xref table itself is not needed:
  objects are discovered by scanning ``N G obj`` ... ``endobj`` spans);
- page content streams stored plain or compressed with any standard
  stream filter chain (Flate/LZW/RunLength/ASCIIHex/ASCII85 via
  sources/pdffilters);
- text operators ``Tj`` (show string), ``'`` (next-line show), ``TJ``
  (array show with kerning), ``Td/TD/T*`` (line moves) inside BT/ET
  blocks;
- literal ``(...)`` strings with escape sequences and hex ``<...>``
  strings (Latin-1 / PDFDocEncoding approximation).

- PDF 1.5 compressed object streams (``/ObjStm``): content streams
  stay top-level by spec, and packed dict objects are expanded for
  the embedded-font trust heuristic;
- tagged SUBSET fonts through ``/ToUnicode`` CMaps (bfchar + both
  bfrange forms): the private glyph codes of simple AND composite
  Identity-H fonts map back to text, with Tm-based word/line
  segmentation — the modern producer's text layer reads for real;
  fonts without the map stay refused (rasterize + OCR instead);
- encrypted files through sources/pdfcrypt (standard handler, empty
  user password).

Scale shape: one ``map_batches`` task per document row (bytes in,
span rows out) — embarrassingly parallel, nothing touches the driver.

``make_simple_pdf`` writes the same well-behaved subset (used by the
round-trip tests AND usable as a sink for page reconstitution).
"""

from __future__ import annotations

import re
import zlib

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")
# literal string with escapes, or hex string
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")
_TEXT_OP_RE = re.compile(
    rb"(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|')"  # string show
    rb"|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ"                       # array show
    rb"|(T\*|TD|Td|ET|BT)",                                   # line / block ops
    re.S,
)
_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(tok: bytes) -> str:
    """Decode a single ( ) literal or < > hex string token."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    body = tok[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            i += 1  # lone backslash: skip
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _content_text(stream: bytes) -> list[str]:
    """Text lines of one content stream, honoring Tj/'/TJ/Td/TD/T*."""
    lines: list[str] = []
    cur: list[str] = []

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for m in _TEXT_OP_RE.finditer(stream):
        if m.group(2):  # Tj or '
            if m.group(2) == b"'":
                newline()
            cur.append(_decode_pdf_string(m.group(1)))
        elif m.group(3) is not None:  # TJ array: strings + kerning numbers
            for s in _STR_RE.finditer(m.group(3)):
                cur.append(_decode_pdf_string(s.group(0)))
        else:
            op = m.group(4)
            if op in (b"Td", b"TD", b"T*", b"ET"):
                newline()
    newline()
    return [ln for ln in lines if ln.strip()]


_BF_CHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BF_RANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f\s]+)>")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S
)


def parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """/ToUnicode CMap stream -> (code byte width, {code: text}).

    Covers ``bfchar`` pairs and ``bfrange`` in both the incrementing
    <lo> <hi> <dst> form and the explicit array form (PDF 32000
    9.10.3 / Adobe CMap spec)."""
    def _clean(hx: bytes) -> bytes:
        return re.sub(rb"\s", b"", hx)

    m = _CODESPACE_RE.search(cmap)
    nbytes = (len(_clean(m.group(1))) + 1) // 2 if m else 2
    out: dict[int, str] = {}

    def dst_text(hx: bytes) -> str:
        hx = re.sub(rb"\s", b"", hx)
        return bytes.fromhex(hx.decode()).decode("utf-16-be", "replace")

    for blk in _BF_CHAR_RE.finditer(cmap):
        toks = _HEX_TOK_RE.findall(blk.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out[int(_clean(src), 16)] = dst_text(dst)
    for blk in _BF_RANGE_RE.finditer(cmap):
        body = blk.group(1)
        pos = 0
        while True:
            mm = _HEX_TOK_RE.search(body, pos)
            if mm is None:
                break
            m2 = _HEX_TOK_RE.search(body, mm.end())
            if m2 is None:
                break
            lo = int(_clean(mm.group(1)), 16)
            hi = int(_clean(m2.group(1)), 16)
            nxt = body[m2.end():].lstrip()
            if nxt.startswith(b"["):
                end = body.find(b"]", m2.end())
                dsts = _HEX_TOK_RE.findall(body[m2.end() : end])
                for i, d in enumerate(dsts):
                    out[lo + i] = dst_text(d)
                pos = end + 1
            else:
                m3 = _HEX_TOK_RE.search(body, m2.end())
                if m3 is None:
                    break
                base = bytes.fromhex(_clean(m3.group(1)).decode())
                for i in range(hi - lo + 1):
                    b2 = base[:-2] + (
                        int.from_bytes(base[-2:], "big") + i
                    ).to_bytes(2, "big") if len(base) >= 2 else base
                    out[lo + i] = b2.decode("utf-16-be", "replace")
                pos = m3.end()
    return nbytes, out


_TF_OR_TEXT_RE = re.compile(
    rb"/(\w+)\s+[\d.]+\s+Tf"                                 # font select
    rb"|(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*(Tj|')"    # string show
    rb"|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ"                       # array show
    rb"|([\d.-]+(?:\s+[\d.-]+){5})\s+Tm"                     # text matrix
    rb"|(T\*|TD|Td|ET|BT)",                                   # line ops
    re.S,
)


def _string_bytes(tok: bytes) -> bytes:
    """Raw BYTES of a ( ) literal or < > hex string token."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return _decode_pdf_string(tok).encode("latin-1", "replace")


def _content_text_mapped(stream: bytes, res_fonts: dict[bytes, int],
                         fonts: dict[int, tuple[int, dict]]) -> list[str]:
    """Text lines of one content stream with per-font /ToUnicode
    mapping: Tf switches the active map; strings under a mapped font
    decode code-by-code, others fall back to Latin-1."""
    lines: list[str] = []
    cur: list[str] = []
    active: tuple[int, dict] | None = None

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def show(tok: bytes) -> None:
        if active is None:
            cur.append(_decode_pdf_string(tok))
            return
        nbytes, cmap = active
        raw = _string_bytes(tok)
        for i in range(0, len(raw) - nbytes + 1, nbytes):
            code = int.from_bytes(raw[i : i + nbytes], "big")
            cur.append(cmap.get(code, ""))

    last_ty: float | None = None
    for m in _TF_OR_TEXT_RE.finditer(stream):
        if m.group(1):  # Tf
            num = res_fonts.get(m.group(1))
            active = fonts.get(num) if num is not None else None
        elif m.group(3):  # Tj or '
            if m.group(3) == b"'":
                newline()
            show(m.group(2))
        elif m.group(4) is not None:  # TJ array
            for s in _STR_RE.finditer(m.group(4)):
                show(s.group(0))
        elif m.group(5) is not None:  # Tm: positional segmentation —
            # a vertical move starts a new line, a horizontal jump on
            # the same baseline is a word gap (extractor heuristic)
            ops = m.group(5).split()
            ty = float(ops[5])
            if last_ty is not None and ty != last_ty:
                newline()
            elif last_ty is not None and cur:
                cur.append(" ")
            last_ty = ty
        else:
            op = m.group(6)
            if op in (b"Td", b"TD", b"T*", b"ET"):
                newline()
                last_ty = None
    newline()
    return [ln for ln in lines if ln.strip()]


def _extract_with_tounicode(data: bytes) -> list[str]:
    """Page-walking extraction for PDFs whose fonts carry /ToUnicode
    CMaps — the tagged-subset-font case where the raw string bytes are
    private glyph codes but the producer supplied the mapping back to
    text (reference behavior: pdfium honors ToUnicode)."""
    from .pdffilters import decode_stream
    from .pdfimage import _page_order, _scan_objects

    objs = _scan_objects(data)
    fonts: dict[int, tuple[int, dict]] = {}
    for num, (head, raw) in objs.items():
        if b"/Font" not in head or b"/ToUnicode" not in head:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", head)
        if tm is None:
            continue
        chead, craw = objs.get(int(tm.group(1)), (b"", None))
        if craw is None:
            continue
        nbytes, cmap = parse_tounicode(decode_stream(chead, craw))
        if b"/Type0" in head or b"/Identity-H" in head:
            nbytes = 2
        fonts[num] = (nbytes, cmap)
    if not fonts:
        return []
    lines: list[str] = []
    for pnum in _page_order(data, objs):
        head, _ = objs[pnum]
        rm = re.search(rb"/Resources\s+(\d+)\s+0\s+R", head)
        res = objs[int(rm.group(1))][0] if rm and int(rm.group(1)) in objs else head
        res_fonts: dict[bytes, int] = {}
        fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
        if fm:
            for mm in re.finditer(rb"/(\w+)\s+(\d+)\s+0\s+R", fm.group(1)):
                res_fonts[mm.group(1)] = int(mm.group(2))
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", head)
        if cm is None or int(cm.group(1)) not in objs:
            continue
        chead, craw = objs[int(cm.group(1))]
        if craw is None:
            continue
        stream = decode_stream(chead, craw)
        lines.extend(_content_text_mapped(stream, res_fonts, fonts))
    return lines


def extract_pdf_text(data: bytes) -> list[str]:
    """All text lines of a PDF's native text layer, in stream order.

    Raises ``NotImplementedError`` for encrypted files and non-standard
    stream filters (a full PDF library is needed there).
    Returns [] for PDFs whose text is drawn with an EMBEDDED font and
    no /ToUnicode map: a subsetted font's character codes are private
    glyph indices, so the "text layer" is garbage by construction —
    the standard extractor heuristic — and such pages must be
    rasterized (sources/pdffont) and OCRed instead.
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in data:
        # standard security handler, empty user password (the
        # silent-open case) — raises ValueError('password required')
        # otherwise
        from .pdfcrypt import decrypt_pdf

        data = decrypt_pdf(data)
    if b"/ToUnicode" in data:
        # tagged subset fonts: the string bytes are PRIVATE glyph
        # codes, but the producer supplied the mapping back to text —
        # decode through the CMaps (never latin-1 on subset codes)
        lines = _extract_with_tounicode(data)
        if lines:
            return lines
    if (
        b"/ObjStm" not in data
        and (b"/FontFile" in data or b"/CharProcs" in data)
        and b"/ToUnicode" not in data
    ):
        # embedded (FontFile*) or Type 3 (/CharProcs) font without a
        # /ToUnicode map: private codes, untrustworthy text layer
        # (with /ObjStm present the font dicts may be compressed —
        # the same check re-runs over the expanded bodies below)
        return []

    def _resolve_length(head: bytes) -> int | None:
        lm = _LENGTH_RE.search(head)
        if lm is None:
            return None
        if lm.group(2) is None:
            return int(lm.group(1))
        # indirect /Length N G R: resolve the integer object
        ref = re.search(
            rb"\b" + lm.group(1) + rb"\s+0\s+obj\s*(\d+)\s*endobj", data
        )
        return int(ref.group(1)) if ref else None

    lines: list[str] = []
    aux = b""  # decoded /ObjStm bodies (compressed dict objects)
    pos = 0
    while True:
        om = _OBJ_HEAD_RE.search(data, pos)
        if om is None:
            break
        sm = _STREAM_START_RE.search(data, om.end())
        em = data.find(b"endobj", om.end())
        if sm is None or (em != -1 and em < sm.start()):
            pos = em + 6 if em != -1 else len(data)
            continue
        head = data[om.end() : sm.start()]
        # slice the stream by its declared /Length — scanning for the
        # literal 'endstream' corrupts parsing when compressed bytes
        # happen to contain it (observed on real deflate output)
        length = _resolve_length(head)
        if length is not None:
            raw = data[sm.end() : sm.end() + length]
            endpos = sm.end() + length
        else:
            t = data.find(b"endstream", sm.end())
            if t == -1:
                break
            raw = data[sm.end() : t].rstrip(b"\r\n")
            endpos = t
        nxt = data.find(b"endobj", endpos)
        pos = nxt + 6 if nxt != -1 else endpos

        if b"/ObjStm" in head:
            # PDF 1.5 compressed object stream: only DICT objects live
            # inside (streams are forbidden there), so content streams
            # are still found by this scan — but the expanded bodies
            # must join the font-trust heuristic below
            from .pdffilters import decode_stream

            try:
                aux += decode_stream(head, raw)
            except (zlib.error, ValueError):
                pass
            continue
        if b"/Subtype" in head and b"/Image" in head:
            continue
        if b"/Filter" in head:
            from .pdffilters import decode_stream

            try:
                raw = decode_stream(head, raw)
            except (zlib.error, ValueError):
                continue
        if b"BT" not in raw:
            continue
        lines.extend(_content_text(raw))
    if b"/ObjStm" in data:
        blob = data + aux
        if (
            b"/FontFile" in blob or b"/CharProcs" in blob
        ) and b"/ToUnicode" not in blob:
            return []  # same embedded-font trust rule, ObjStm-packed dicts
    return lines


def pdf_escape(text: str) -> bytes:
    out = text.encode("latin-1", "replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_simple_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Write a minimal single-font PDF with one content stream per page
    — the same well-behaved subset :func:`extract_pdf_text` reads."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        parts = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        for i, ln in enumerate(lines):
            if i:
                parts.append(b"T*")
            parts.append(b"(" + pdf_escape(ln) + b") Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            z = zlib.compress(content)
            body = (
                b"<< /Length " + str(len(z)).encode() + b" /Filter /FlateDecode >>"
                b"\nstream\n" + z + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length " + str(len(content)).encode() + b" >>"
                b"\nstream\n" + content + b"\nendstream"
            )
        content_ids.append(add(body))

    pages_id = len(objects) + len(pages) + 1  # forward reference
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
                b"/MediaBox [0 0 612 792] /Contents " + str(cid).encode() + b" 0 R "
                b"/Resources << /Font << /F1 " + str(font).encode() + b" 0 R >> >> >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(len(page_ids)).encode() + b" >>"
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")

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
