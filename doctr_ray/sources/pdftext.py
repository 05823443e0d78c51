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
  the embedded-font trust heuristic.

Out of scope (raise ``NotImplementedError`` naming the dependency):
encrypted files, CID/Type0 composite fonts needing ToUnicode CMaps.
Those genuinely need a full PDF library; the point here is that the
COMMON digital-PDF case works for real with zero native dependencies.

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
