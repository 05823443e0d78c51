"""Scanned-image PDF rasterization — pure stdlib + the in-repo codecs.

The reference rasterizes every PDF with pypdfium2 (io/pdf.py:16-43).
That native decoder is absent here, but the dominant OCR input in
practice — the SCANNED PDF a copier produces — is just a container:
one full-page image XObject per page, stored as baseline/progressive
JPEG (``/DCTDecode``) or deflated raw samples (``/FlateDecode``).
Both now decode in-repo (sources/jpegcodec, zlib), so these PDFs
rasterize for real with zero native dependencies:

- classic cross-referenced object graphs (same subset as
  sources/pdftext — objects discovered by scanning, streams sliced by
  their declared ``/Length``);
- page ORDER from the document catalog: ``/Root -> /Pages -> /Kids``
  walked recursively (the authoritative order), each page's
  ``/Resources /XObject`` image refs resolved in dict order;
- image XObjects: ``/DeviceGray`` and ``/DeviceRGB`` at 1/2/4/8/16
  bits per component (sub-byte gray upscaled by the exact
  255/(2^b-1) multipliers — 1-bit is THE bilevel archival scan
  format; 16-bit keeps the high byte) and ``/Indexed`` palettes
  (hex / literal / stream lookup), filters ``/DCTDecode`` (JPEG —
  baseline AND progressive) and ``/FlateDecode`` (optionally with PNG
  ``/Predictor`` 10-15 at the spec's byte stride);
- fallback when the catalog walk fails: images in object order.

- ``/CCITTFaxDecode`` bilevel fax images (K < 0 Group 4, K = 0
  Group 3 1-D, K > 0 Group 3 2-D mixed, with ``/EncodedByteAlign``,
  honouring /Columns /Rows /BlackIs1) via the in-repo T.4/T.6 codec
  (sources/ccittcodec) — the archival scanner format;
- ``/JBIG2Decode`` (sources/jbig2codec) and ``/JPXDecode``
  (sources/jpxcodec) via the in-repo arithmetic/wavelet codecs;
- the legacy/transport filters ``/LZWDecode``, ``/RunLengthDecode``,
  ``/ASCIIHexDecode``, ``/ASCII85Decode`` (sources/pdffilters),
  including array chains ``/Filter [/ASCII85Decode /FlateDecode]`` —
  every standard stream filter of PDF 32000 §7.4 decodes in-repo.

Encrypted files decrypt through sources/pdfcrypt (standard security
handler, empty user password); PDF 1.5 compressed object streams
expand through ``_expand_objstm``.

``make_scanned_pdf`` writes the same subset (one full-page image per
page) — the round-trip fixture generator AND a usable archival sink.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from .pdffilters import decode_stream as _decode_stream
from .pdffilters import filter_chain as _filter_chain
from .pdffilters import lzw_early as _lzw_early
from .pdftext import _LENGTH_RE, _OBJ_HEAD_RE, _STREAM_START_RE

_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_NUM_ENTRY = {
    b"Width": re.compile(rb"/Width\s+(\d+)"),
    b"Height": re.compile(rb"/Height\s+(\d+)"),
    b"BitsPerComponent": re.compile(rb"/BitsPerComponent\s+(\d+)"),
    b"Predictor": re.compile(rb"/Predictor\s+(\d+)"),
    b"Columns": re.compile(rb"/Columns\s+(\d+)"),
    b"Colors": re.compile(rb"/Colors\s+(\d+)"),
}


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """objnum -> (header dict bytes, raw stream bytes or None)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        om = _OBJ_HEAD_RE.search(data, pos)
        if om is None:
            break
        num = int(om.group(1))
        em = data.find(b"endobj", om.end())
        sm = _STREAM_START_RE.search(data, om.end())
        if sm is None or (em != -1 and em < sm.start()):
            head = data[om.end() : em if em != -1 else len(data)]
            objs[num] = (head, None)
            pos = em + 6 if em != -1 else len(data)
            continue
        head = data[om.end() : sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm is not None and lm.group(2) is None:
            length = int(lm.group(1))
            raw = data[sm.end() : sm.end() + length]
            endpos = sm.end() + length
        else:
            if lm is not None:  # indirect /Length: resolve integer object
                ref = re.search(
                    rb"\b" + lm.group(1) + rb"\s+0\s+obj\s*(\d+)\s*endobj", data
                )
                if ref is not None:
                    length = int(ref.group(1))
                    raw = data[sm.end() : sm.end() + length]
                    endpos = sm.end() + length
                else:
                    lm = None
            if lm is None:
                t = data.find(b"endstream", sm.end())
                if t == -1:
                    break
                raw = data[sm.end() : t].rstrip(b"\r\n")
                endpos = t
        objs[num] = (head, raw)
        nxt = data.find(b"endobj", endpos)
        pos = nxt + 6 if nxt != -1 else endpos
    _expand_objstm(objs)
    return objs


def _expand_objstm(objs: dict[int, tuple[bytes, bytes | None]]) -> None:
    """Expand PDF 1.5 compressed object streams (``/Type /ObjStm``,
    PDF 32000 7.5.7) in place: the stream body holds ``/N`` non-stream
    objects at byte offsets listed in its header, ``/First`` bytes in.
    Embedded objects (page dicts, font dicts, catalogs...) join the
    object map so the catalog walk and resource resolution see them;
    top-level definitions win on number collision (an updated object
    supersedes its compressed copy)."""
    for head, raw in [v for v in objs.values()]:
        if raw is None or b"/ObjStm" not in head:
            continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if nm is None or fm is None:
            continue
        try:
            body = _decode_stream(head, raw)
        except Exception:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        nums = [int(x) for x in re.findall(rb"\d+", body[:first])]
        pairs = list(zip(nums[0::2], nums[1::2]))[:n]
        for i, (onum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(body)
            objs.setdefault(onum, (body[first + off : end], None))


def _unpredict_png(raw: bytes, stride: int, bpp: int) -> bytes:
    """Reverse PNG row predictors (/Predictor >= 10) on decoded bytes.

    ``stride`` is the row byte length (``ceil(Columns * Colors *
    BitsPerComponent / 8)``) and ``bpp`` the per-pixel byte distance
    (``max(1, Colors * BitsPerComponent // 8)``) — the PNG spec's
    filter unit, which lets the same code cover sub-byte and 16-bit
    samples."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    while pos + 1 + stride <= len(raw) + stride and pos < len(raw):
        ft = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter {ft}")
        out += row
        prev = row
    return bytes(out)


_CS_INDEXED_RE = re.compile(
    rb"/ColorSpace\s*\[\s*/(?:Indexed|I)\b(.*?)\]", re.S
)
_CS_REF_RE = re.compile(rb"/ColorSpace\s+(\d+)\s+0\s+R")
_CS_ICC_RE = re.compile(rb"/ColorSpace\s*\[\s*/ICCBased\s+(\d+)\s+0\s+R")


def _ncomp_of(head: bytes, objs: dict | None) -> int:
    """Component count of a non-indexed image ColorSpace: direct
    /DeviceGray//DeviceRGB names, ``[/ICCBased N 0 R]`` arrays (the
    stream's ``/N``), and indirect ColorSpace object refs — real
    producers overwhelmingly use ICCBased, which without resolution
    would be misread as 1-component gray."""
    if b"/DeviceRGB" in head:
        return 3
    if b"/DeviceGray" in head or b"/CalGray" in head:
        return 1
    m = _CS_ICC_RE.search(head)
    if m is None and objs is not None:
        rm = _CS_REF_RE.search(head)
        if rm is not None:
            target = objs.get(int(rm.group(1)))
            if target is not None:
                ihead = target[0]
                if b"/DeviceRGB" in ihead or b"/CalRGB" in ihead:
                    return 3
                m = re.search(rb"/ICCBased\s+(\d+)\s+0\s+R", ihead)
    if m is not None and objs is not None:
        icc = objs.get(int(m.group(1)))
        if icc is not None:
            nm = re.search(rb"/N\s+(\d+)", icc[0])
            if nm is not None:
                return 3 if int(nm.group(1)) == 3 else 1
    if b"/CalRGB" in head:
        return 3
    return 1


def _parse_palette(head: bytes, objs: dict | None):
    """``/ColorSpace [/Indexed base hival lookup]`` -> (H*3,) uint8
    RGB palette or None. Lookup may be a hex string ``<...>``, a
    simple literal string ``(...)``, or a stream object reference."""
    m = _CS_INDEXED_RE.search(head)
    if m is None:
        return None
    body = m.group(1)
    base_rgb = b"/DeviceRGB" in body
    hm = re.search(rb"\s(\d+)\s*(?=<|\(|\d)", body)
    hival = int(hm.group(1)) if hm else 255
    lookup: bytes | None = None
    xm = re.search(rb"<([0-9A-Fa-f\s]*)>", body)
    if xm is not None:
        lookup = bytes.fromhex(xm.group(1).decode().replace("\n", "").replace(" ", ""))
    else:
        lm = re.search(rb"\((.*?)\)", body, re.S)
        if lm is not None:
            lookup = lm.group(1)
        else:
            rm = _REF_RE.search(body)
            if rm is not None and objs is not None:
                lhead, lraw = objs.get(int(rm.group(1)), (b"", None))
                if lraw is not None:
                    lookup = _decode_stream(lhead, lraw)
    if lookup is None:
        raise NotImplementedError("unsupported /Indexed palette lookup form")
    n = 3 if base_rgb else 1
    pal = np.frombuffer(lookup[: (hival + 1) * n], np.uint8)
    if pal.size < (hival + 1) * n:  # short lookup: pad with black
        pal = np.concatenate([pal, np.zeros((hival + 1) * n - pal.size, np.uint8)])
    if not base_rgb:  # gray base -> expand to RGB for a uniform return
        pal = np.repeat(pal, 3)
    return pal.reshape(hival + 1, 3)


def _unpack_samples(raw: bytes, h: int, w: int, ncomp: int, bits: int) -> np.ndarray:
    """Packed big-endian samples -> (h, w*ncomp) uint8 component values
    (16-bit keeps the high byte; sub-byte rows are byte-aligned per the
    PDF spec)."""
    if bits == 8:
        need = h * w * ncomp
        arr = np.frombuffer(raw[:need], np.uint8)
        if arr.size < need:
            raise ValueError("PDF image stream shorter than Width*Height")
        return arr.reshape(h, w * ncomp)
    if bits == 16:
        need = h * w * ncomp * 2
        if len(raw) < need:
            raise ValueError("PDF image stream shorter than Width*Height")
        return (
            np.frombuffer(raw[:need], ">u2").reshape(h, w * ncomp) >> 8
        ).astype(np.uint8)
    # 1 / 2 / 4 bit: unpack bit-planes row by row (vectorized over rows)
    stride = (w * ncomp * bits + 7) // 8
    need = h * stride
    if len(raw) < need:
        raise ValueError("PDF image stream shorter than Width*Height")
    rows = np.frombuffer(raw[:need], np.uint8).reshape(h, stride)
    bits_arr = np.unpackbits(rows, axis=1)[:, : w * ncomp * bits]
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
    return bits_arr.reshape(h, w * ncomp, bits).dot(weights).astype(np.uint8)


#: exact 8-bit upscale multipliers for 1/2/4-bit gray samples
#: (255 / (2^bits - 1) is integral for these depths)
_GRAY_SCALE = {1: 255, 2: 85, 4: 17, 8: 1}


def _decode_image_obj(head: bytes, raw: bytes, objs: dict | None = None) -> np.ndarray:
    """One /Subtype /Image stream object -> (H,W) or (H,W,3) uint8.

    Covers 8-bit DeviceGray/DeviceRGB, 16-bit samples (high byte),
    1/2/4-bit gray (exact 255/(2^b-1) upscale — the bilevel archival
    scan format), and /Indexed palettes (hex/literal/stream lookup)
    over any of those depths. The full ``/Filter`` chain is walked in
    array order: ASCIIHex/ASCII85/RunLength transport wrappers first,
    then ONE terminal filter — /DCTDecode, /CCITTFaxDecode,
    /JPXDecode, /JBIG2Decode, /FlateDecode or /LZWDecode (the last two
    with PNG predictors at the spec's byte stride)."""
    from .pdffilters import ascii85_decode, ascii_hex_decode, lzw_decode, rle_decode

    chain = _filter_chain(head)
    transports = {
        b"ASCIIHexDecode": ascii_hex_decode,
        b"ASCII85Decode": ascii85_decode,
        b"RunLengthDecode": rle_decode,
    }
    primary = None
    for i, name in enumerate(chain):
        if name in transports:
            raw = transports[name](raw)
        elif name == b"LZWDecode" and i < len(chain) - 1:
            raw = lzw_decode(raw, _lzw_early(head))
        else:
            if i < len(chain) - 1:
                raise NotImplementedError(
                    f"PDF image filter /{name.decode()} wrapping another filter"
                )
            primary = name
    if primary == b"DCTDecode":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(raw)
    w = int(_NUM_ENTRY[b"Width"].search(head).group(1))
    h = int(_NUM_ENTRY[b"Height"].search(head).group(1))
    bm = _NUM_ENTRY[b"BitsPerComponent"].search(head)
    bits = int(bm.group(1)) if bm else 8
    if bits not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"{bits}-bit PDF image samples")
    if primary == b"CCITTFaxDecode":
        from .ccittcodec import decode_g3, decode_g3_2d, decode_g4

        km = re.search(rb"/K\s+(-?\d+)", head)
        k = int(km.group(1)) if km else 0
        cm = _NUM_ENTRY[b"Columns"].search(head)
        cols = int(cm.group(1)) if cm else 1728
        rm = re.search(rb"/Rows\s+(\d+)", head)
        nrows = int(rm.group(1)) if rm else h
        align = b"/EncodedByteAlign true" in head
        codec = decode_g4 if k < 0 else (decode_g3_2d if k > 0 else decode_g3)
        black = codec(raw, cols, nrows, byte_align=align)
        # map pixels to 1-bit samples per /BlackIs1 (default false:
        # black pixels are 0 bits = DeviceGray black)
        if b"/BlackIs1 true" in head:
            return np.where(black, np.uint8(255), np.uint8(0))
        return np.where(black, np.uint8(0), np.uint8(255))
    if primary == b"JPXDecode":
        from .jpxcodec import decode_jpx

        # the JPEG 2000 stream is self-describing (PDF 32000 7.4.9:
        # Width/Height/BPC in the dict are advisory for JPX)
        return decode_jpx(raw)
    if primary == b"JBIG2Decode":
        from .jbig2codec import decode_jbig2

        globals_data = b""
        if objs is not None:
            gm = re.search(rb"/JBIG2Globals\s+(\d+)\s+\d+\s+R", head)
            if gm:
                g = objs.get(int(gm.group(1)))
                globals_data = (g[1] or b"") if g else b""
        black = decode_jbig2(raw, globals_data, width=w, height=h)
        # JBIG2 bit 1 = black pixel -> DeviceGray 0 (same orientation
        # as CCITT /BlackIs1 false)
        return np.where(black, np.uint8(0), np.uint8(255))
    palette = _parse_palette(head, objs)
    ncomp = 1 if palette is not None else _ncomp_of(head, objs)
    if primary in (b"FlateDecode", b"LZWDecode"):
        raw = (
            zlib.decompress(raw)
            if primary == b"FlateDecode"
            else lzw_decode(raw, _lzw_early(head))
        )
        pm = _NUM_ENTRY[b"Predictor"].search(head)
        if pm and int(pm.group(1)) >= 10:
            stride = (w * ncomp * bits + 7) // 8
            bpp = max(1, ncomp * bits // 8)
            raw = _unpredict_png(raw, stride, bpp)
    elif primary is not None:
        raise NotImplementedError(
            f"unsupported PDF image filter /{primary.decode()}"
        )
    # /Decode [1 0]: inverted component range — the stencil-mask
    # default flip and the fax-without-BlackIs1 convention. (Word-
    # bounded so /DecodeParms never matches.)
    inverted = (
        re.search(rb"/Decode\s*\[\s*1(?:\.0*)?\s+0(?:\.0*)?\s*\]", head)
        is not None
    )
    if b"/ImageMask true" in head:
        # stencil mask: 1-bit, no ColorSpace; sample 0 = paint (black
        # on the page), 1 = leave white — /Decode [1 0] flips
        bits = 1
        samples = _unpack_samples(raw, h, w, 1, 1)
        if inverted:
            samples = samples ^ 1
        return (samples.reshape(h, w) * np.uint8(255)).astype(np.uint8)
    samples = _unpack_samples(raw, h, w, ncomp, bits)  # (h, w*ncomp) uint8
    if inverted and ncomp == 1:
        samples = (
            (2 ** min(bits, 8) - 1) - samples
            if bits != 16
            else 255 - samples  # 16-bit already collapsed to high byte
        ).astype(np.uint8)
    if palette is not None:
        idx = np.minimum(samples, len(palette) - 1)
        rgb = palette[idx.reshape(h, w)]
        # collapse an achromatic palette to gray (matches the writer)
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
            rgb[:, :, 1] == rgb[:, :, 2]
        ).all():
            return np.ascontiguousarray(rgb[:, :, 0])
        return rgb
    if bits in _GRAY_SCALE and bits != 8 and ncomp == 1:
        samples = samples * np.uint8(_GRAY_SCALE[bits])
    arr = samples.reshape(h, w, ncomp)
    return arr[:, :, 0] if ncomp == 1 else arr


def _decode_with_smask(head: bytes, raw: bytes, objs: dict | None) -> np.ndarray:
    """Decode one image XObject and composite its ``/SMask`` soft mask
    (a gray alpha image) over the white page background — what a
    rasterizer shows for transparent images: out = img*a + 255*(1-a),
    integer-rounded."""
    img = _decode_image_obj(head, raw, objs)
    sm = re.search(rb"/SMask\s+(\d+)\s+0\s+R", head)
    if sm is None or objs is None:
        return img
    tgt = objs.get(int(sm.group(1)))
    if tgt is None or tgt[1] is None:
        return img
    alpha = _decode_image_obj(tgt[0], tgt[1], objs)
    if alpha.ndim == 3:
        alpha = alpha[:, :, 0]
    if alpha.shape != img.shape[:2]:
        return img  # mismatched mask geometry: show the image plain
    a = alpha.astype(np.uint16)
    if img.ndim == 2:
        comp = (img.astype(np.uint16) * a + 255 * (255 - a) + 127) // 255
        return comp.astype(np.uint8)
    a3 = a[..., None]
    comp = (img.astype(np.uint16) * a3 + 255 * (255 - a3) + 127) // 255
    return comp.astype(np.uint8)


#: inline-image abbreviation -> XObject-vocabulary key/value (PDF
#: 8.9.7 table 93); word-bounded so /Fl is never eaten by /F and full
#: names pass through unchanged
_INLINE_ABBREV = [
    (re.compile(rb"/W(?![A-Za-z])"), b"/Width"),
    (re.compile(rb"/H(?![A-Za-z])"), b"/Height"),
    (re.compile(rb"/BPC(?![A-Za-z])"), b"/BitsPerComponent"),
    (re.compile(rb"/CS(?![A-Za-z])"), b"/ColorSpace"),
    (re.compile(rb"/Fl(?![A-Za-z])"), b"/FlateDecode"),
    (re.compile(rb"/DCT(?![A-Za-z])"), b"/DCTDecode"),
    (re.compile(rb"/CCF(?![A-Za-z])"), b"/CCITTFaxDecode"),
    (re.compile(rb"/AHx(?![A-Za-z])"), b"/ASCIIHexDecode"),
    (re.compile(rb"/A85(?![A-Za-z])"), b"/ASCII85Decode"),
    (re.compile(rb"/LZW(?![A-Za-z])"), b"/LZWDecode"),
    (re.compile(rb"/RL(?![A-Za-z])"), b"/RunLengthDecode"),
    (re.compile(rb"/F(?![A-Za-z])"), b"/Filter"),
    (re.compile(rb"/G(?![A-Za-z])"), b"/DeviceGray"),
    (re.compile(rb"/RGB(?![A-Za-z])"), b"/DeviceRGB"),
    (re.compile(rb"/IM(?![A-Za-z])"), b"/ImageMask"),
    (re.compile(rb"/DP(?![A-Za-z])"), b"/DecodeParms"),
    (re.compile(rb"/D(?![A-Za-z])"), b"/Decode"),
    (re.compile(rb"/I(?![A-Za-z])"), b"/Interpolate"),
]
_BI_RE = re.compile(rb"(?<![A-Za-z])BI(?![A-Za-z])")
_ID_RE = re.compile(rb"(?<![A-Za-z])ID")


def _inline_images(content: bytes) -> list[np.ndarray]:
    """All ``BI <dict> ID <data> EI`` inline images of one content
    stream, in stream order (PDF 8.9.7) — the small-image form some
    producers emit instead of XObjects. Abbreviated keys/filters are
    normalized into the XObject vocabulary and decoded by the shared
    :func:`_decode_image_obj`. The binary segment's end is found
    per-filter (Flate: decompressobj EOF; DCT: the EOI marker; raw:
    the computed row-stride length)."""
    out: list[np.ndarray] = []
    pos = 0
    while True:
        m = _BI_RE.search(content, pos)
        if m is None:
            return out
        idm = _ID_RE.search(content, m.end())
        if idm is None:
            return out
        head = content[m.end() : idm.start()]
        for pat, full in _INLINE_ABBREV:
            head = pat.sub(full, head)
        if b"/Width" not in head or b"/Height" not in head:
            # not an inline-image dict (a stray "BI" inside text ops)
            pos = m.end()
            continue
        if b"[" in head:
            # array ColorSpace (inline /Indexed) — /I is ambiguous with
            # /Interpolate in the abbreviation table; stay honest
            raise NotImplementedError("inline image array ColorSpace")
        data_start = idm.end() + 1  # exactly one whitespace after ID
        chain = _filter_chain(head)
        first = chain[0] if chain else None
        # the binary segment's end is found per-FIRST-filter: the
        # ASCII transports have explicit terminators, DCT its EOI
        # marker, Flate its deflate EOF
        if first == b"ASCIIHexDecode":
            end = content.find(b">", data_start)
            if end < 0:
                raise ValueError("inline AHx image without > terminator")
            raw = content[data_start : end + 1]
        elif first == b"ASCII85Decode":
            end = content.find(b"~>", data_start)
            if end < 0:
                raise ValueError("inline A85 image without ~> terminator")
            raw = content[data_start : end + 2]
        elif first == b"DCTDecode":
            end = content.find(b"\xff\xd9", data_start)
            if end < 0:
                raise ValueError("inline DCT image without EOI marker")
            raw = content[data_start : end + 2]
        elif first == b"FlateDecode":
            d = zlib.decompressobj()
            d.decompress(content[data_start:])
            if not d.eof:
                raise ValueError("truncated inline Flate image")
            raw = content[data_start : len(content) - len(d.unused_data)]
        elif first is not None:
            raise NotImplementedError(
                "inline image whose first filter has no delimiter "
                f"(/{first.decode()}): end of binary data is ambiguous"
            )
        else:
            w = int(_NUM_ENTRY[b"Width"].search(head).group(1))
            h = int(_NUM_ENTRY[b"Height"].search(head).group(1))
            bm = _NUM_ENTRY[b"BitsPerComponent"].search(head)
            bits = int(bm.group(1)) if bm else 8
            ncomp = 3 if b"/DeviceRGB" in head else 1
            raw = content[data_start : data_start + ((w * ncomp * bits + 7) // 8) * h]
        out.append(_decode_image_obj(head, raw))
        em = re.compile(rb"\s*EI(?![A-Za-z])").match(content, data_start + len(raw))
        pos = em.end() if em else data_start + len(raw)


def _page_order(data: bytes, objs: dict) -> list[int]:
    """Page object numbers in catalog /Kids order (recursive)."""
    root = None
    for num, (head, _) in objs.items():
        if b"/Type" in head and b"/Catalog" in head:
            m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", head)
            if m:
                root = int(m.group(1))
                break
    if root is None:
        return []
    order: list[int] = []

    def walk(num: int) -> None:
        head, _ = objs.get(num, (b"", None))
        if b"/Kids" in head:
            km = re.search(rb"/Kids\s*\[(.*?)\]", head, re.S)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)))
        elif b"/Page" in head:
            order.append(num)

    walk(root)
    return order


def extract_pdf_page_images(data: bytes) -> list[np.ndarray]:
    """All page images of a scanned PDF, in page order.

    Raises ``ValueError`` for non-PDFs and ``NotImplementedError`` for
    image encodings that genuinely need a native codec.
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in data:
        from .pdfcrypt import decrypt_pdf

        data = decrypt_pdf(data)
    objs = _scan_objects(data)
    smask_nums = {
        int(m.group(1))
        for head, raw in objs.values()
        if raw is not None
        for m in [re.search(rb"/SMask\s+(\d+)\s+0\s+R", head)]
        if m is not None
    }
    image_nums = [
        num
        for num, (head, raw) in objs.items()
        if raw is not None
        and b"/Subtype" in head
        and b"/Image" in head
        and num not in smask_nums  # alpha masks are not page images
    ]
    out: list[np.ndarray] = []
    seen: set[int] = set()

    def _walk_xobjects(head: bytes, depth: int = 0) -> None:
        """Collect images from a /Resources /XObject dict, recursing
        into /Form XObjects (whose own resources carry the images real
        producers nest one level down)."""
        if depth > 8:
            return
        xm = re.search(rb"/XObject\s*<<(.*?)>>", head, re.S)
        if xm is None:
            return
        for rm in _REF_RE.finditer(xm.group(1)):
            n = int(rm.group(1))
            if n in seen or n not in objs:
                continue
            xhead, xraw = objs[n]
            if n in image_nums:
                seen.add(n)
                out.append(_decode_with_smask(xhead, xraw, objs=objs))
            elif b"/Form" in xhead and b"/Subtype" in xhead:
                seen.add(n)
                _walk_xobjects(xhead, depth + 1)
                if xraw is not None:
                    fstream = _decode_stream(xhead, xraw)
                    if _BI_RE.search(fstream):
                        out.extend(_inline_images(fstream))

    for pnum in _page_order(data, objs):
        head, _ = objs[pnum]
        _walk_xobjects(head)
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", head)
        if cm and int(cm.group(1)) in objs:
            chead, craw = objs[int(cm.group(1))]
            if craw is not None:
                stream = _decode_stream(chead, craw)
                if _BI_RE.search(stream):
                    out.extend(_inline_images(stream))
    if out:
        return out
    if not image_nums:
        return []
    # catalog walk found nothing: fall back to object order
    return [_decode_with_smask(*objs[n], objs=objs) for n in sorted(image_nums)]


def _pack_rows(samples: np.ndarray, bits: int) -> bytes:
    """(h, w) small-int samples -> byte-aligned big-endian packed rows."""
    h, w = samples.shape
    if bits == 8:
        return samples.astype(np.uint8).tobytes()
    per_sample = np.unpackbits(
        samples.astype(np.uint8).reshape(h, w, 1), axis=2
    )[:, :, 8 - bits :]
    flat = per_sample.reshape(h, w * bits)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros((h, pad), np.uint8)], axis=1)
    return np.packbits(flat, axis=1).tobytes()


def make_scanned_pdf(
    images: list[np.ndarray],
    image_format: str = "flate",
    quality: int = 95,
    bits: int = 8,
    palette: np.ndarray | None = None,
    transport: str | None = None,
    ccitt_byte_align: bool = False,
) -> bytes:
    """One full-page image per page — what a scanner/copier emits.

    ``image_format``: 'flate' (lossless deflated samples), 'jpeg'
    (DCTDecode via the in-repo encoder), or 'ccitt_g4' / 'ccitt_g3'
    (CCITTFaxDecode — lossless bilevel fax coding of 0/255 gray
    pages, the archival scanner format). Gray (H,W) or RGB (H,W,3)
    uint8, or uint16 gray when ``bits=16``. ``bits`` in {1, 2, 4}
    writes sub-byte gray (values must sit on the 255/(2^b-1) grid —
    the bilevel/4-gray archival formats); ``palette`` (K, 3) uint8
    writes /Indexed images whose (H, W) inputs are palette indices.
    Also 'lzw' / 'rle' (LZW- / RunLength-compressed raw samples, the
    legacy lossless filters) and 'inline_ahx' (BI/ID/EI with
    hex-armoured samples). ``transport`` ('ahx' or 'a85') wraps the
    XObject payload in an ASCII transport filter, emitting the array
    form ``/Filter [/ASCII85Decode /FlateDecode]``.
    """
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    img_ids, content_ids, dims = [], [], []
    for img in images:
        h, w = img.shape[:2]
        gray = img.ndim == 2
        if image_format in ("inline_flate", "inline_jpeg", "inline_ahx"):
            # BI/ID/EI inline image: the content stream IS the image
            if image_format == "inline_jpeg":
                from .jpegcodec import encode_jpeg

                payload, filt = encode_jpeg(img, quality), b"/DCT"
            elif image_format == "inline_ahx":
                from .pdffilters import ascii_hex_encode

                if img.dtype != np.uint8:
                    raise ValueError("inline_ahx expects uint8 images")
                payload, filt = ascii_hex_encode(img.tobytes()), b"/AHx"
            else:
                if img.dtype != np.uint8:
                    raise ValueError("inline_flate expects uint8 images")
                payload, filt = zlib.compress(img.tobytes()), b"/Fl"
            content = (
                b"q " + str(w).encode() + b" 0 0 " + str(h).encode()
                + b" 0 0 cm BI /W " + str(w).encode()
                + b" /H " + str(h).encode()
                + b" /CS " + (b"/G" if gray else b"/RGB")
                + b" /BPC 8 /F " + filt + b" ID\n" + payload + b"\nEI Q"
            )
            img_ids.append(None)
            content_ids.append(
                add(
                    b"<< /Length " + str(len(content)).encode()
                    + b" >>\nstream\n" + content + b"\nendstream"
                )
            )
            dims.append((w, h))
            continue
        if palette is not None:
            if not gray:
                raise ValueError("palette images must be (H,W) index arrays")
            hexpal = palette.astype(np.uint8).tobytes().hex().encode()
            cs = (
                b"[/Indexed /DeviceRGB " + str(len(palette) - 1).encode()
                + b" <" + hexpal + b">]"
            )
        else:
            cs = b"/DeviceGray" if gray else b"/DeviceRGB"
        extra = b""
        if image_format == "jpeg":
            from .jpegcodec import encode_jpeg

            payload = encode_jpeg(img, quality)
            filt = b"/DCTDecode"
            sample_bits = 8
        elif image_format in ("ccitt_g4", "ccitt_g3", "ccitt_g3_2d"):
            from .ccittcodec import encode_g3, encode_g3_2d, encode_g4

            if not gray:
                raise ValueError(f"{image_format} expects gray bilevel images")
            black = img == 0
            if not ((img == 0) | (img == 255)).all():
                raise ValueError(f"{image_format} gray values must be 0 or 255")
            if image_format == "ccitt_g4":
                k = -1
                payload = encode_g4(black, byte_align=ccitt_byte_align)
            elif image_format == "ccitt_g3_2d":
                k = 4
                payload = encode_g3_2d(black, k=4, byte_align=ccitt_byte_align)
            else:
                k = 0
                payload = encode_g3(black, byte_align=ccitt_byte_align)
            filt = b"/CCITTFaxDecode"
            sample_bits = 1
            extra = (
                b" /DecodeParms << /K " + str(k).encode()
                + b" /Columns " + str(w).encode()
                + b" /Rows " + str(h).encode()
                + (b" /EncodedByteAlign true" if ccitt_byte_align else b"")
                + b" >>"
            )
        elif image_format in ("jpx", "jpx_lossy"):
            from .jpxcodec import encode_jp2

            payload = encode_jp2(img, lossy=image_format == "jpx_lossy")
            filt = b"/JPXDecode"
            sample_bits = 8
        elif image_format in ("jbig2", "jbig2_sym"):
            if not gray:
                raise ValueError(f"{image_format} expects gray bilevel images")
            if not ((img == 0) | (img == 255)).all():
                raise ValueError(f"{image_format} gray values must be 0 or 255")
            if image_format == "jbig2_sym":
                from .jbig2symbol import encode_jbig2_symbolic as _enc
            else:
                from .jbig2codec import encode_jbig2 as _enc
            payload = _enc(img == 0)
            filt = b"/JBIG2Decode"
            sample_bits = 1
        elif bits == 16:
            if img.dtype != np.uint16 or not gray:
                raise ValueError("bits=16 expects uint16 gray images")
            payload = zlib.compress(img.astype(">u2").tobytes())
            filt = b"/FlateDecode"
            sample_bits = 16
        elif bits in (1, 2, 4):
            if not gray:
                raise ValueError(f"bits={bits} expects gray images")
            scale = _GRAY_SCALE[bits]
            samples = img if palette is not None else img // scale
            if palette is None and not (samples * scale == img).all():
                raise ValueError(
                    f"bits={bits} gray values must be multiples of {scale}"
                )
            payload = zlib.compress(_pack_rows(samples, bits))
            filt = b"/FlateDecode"
            sample_bits = bits
        elif image_format == "mask":
            # /ImageMask true stencil: bit 0 = paint black
            if not gray or not ((img == 0) | (img == 255)).all():
                raise ValueError("mask expects gray bilevel 0/255 images")
            payload = zlib.compress(_pack_rows((img == 255).astype(np.uint8), 1))
            filt = b"/FlateDecode"
            sample_bits = 1
            extra = b" /ImageMask true"
            cs = None
        elif image_format in ("lzw", "rle"):
            from .pdffilters import lzw_encode, rle_encode

            if img.dtype != np.uint8:
                raise ValueError(f"{image_format} expects uint8 images")
            if image_format == "lzw":
                payload = lzw_encode(img.tobytes())
                filt = b"/LZWDecode"
            else:
                payload = rle_encode(img.tobytes())
                filt = b"/RunLengthDecode"
            sample_bits = 8
        else:
            if img.dtype != np.uint8:
                raise ValueError("make_scanned_pdf expects uint8 images")
            payload = zlib.compress(img.tobytes())
            filt = b"/FlateDecode"
            sample_bits = 8
        if transport is not None:
            from .pdffilters import ascii85_encode, ascii_hex_encode

            tenc, tname = {
                "ahx": (ascii_hex_encode, b"/ASCIIHexDecode"),
                "a85": (ascii85_encode, b"/ASCII85Decode"),
            }[transport]
            payload = tenc(payload)
            filt = b"[" + tname + b" " + filt + b"]"
        img_ids.append(
            add(
                b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
                + b" /Height " + str(h).encode()
                + (b" /ColorSpace " + cs if cs is not None else b"")
                + b" /BitsPerComponent " + str(sample_bits).encode()
                + b" /Filter " + filt + extra
                + b" /Length " + str(len(payload)).encode() + b" >>\nstream\n"
                + payload + b"\nendstream"
            )
        )
        content = (
            b"q " + str(w).encode() + b" 0 0 " + str(h).encode()
            + b" 0 0 cm /Im0 Do Q"
        )
        content_ids.append(
            add(
                b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
                + content + b"\nendstream"
            )
        )
        dims.append((w, h))

    pages_id = len(objects) + len(images) + 1
    page_ids = []
    for (w, h), iid, cid in zip(dims, img_ids, content_ids):
        res = (
            b"/Resources << >>"
            if iid is None  # inline image: no XObject resource
            else b"/Resources << /XObject << /Im0 " + str(iid).encode() + b" 0 R >> >>"
        )
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode() + b" 0 R "
                b"/MediaBox [0 0 " + str(w).encode() + b" " + str(h).encode() + b"] "
                b"/Contents " + str(cid).encode() + b" 0 R " + res + b" >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
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


def repack_with_objstm(pdf: bytes) -> bytes:
    """Rewrite a classic PDF into the PDF 1.5 compressed form: every
    NON-stream object (page dicts, font dicts, the catalog...) moves
    into one Flate-compressed ``/ObjStm``; stream objects stay
    top-level (the spec forbids streams inside object streams); the
    cross-reference table becomes an ``/XRef`` STREAM with ``/W [1 4
    2]`` entries (type 2 rows pointing into the object stream). This
    is the layout every modern producer emits — the round-trip fixture
    for :func:`_expand_objstm`."""
    objs = {}
    pos = 0
    while True:  # re-scan WITHOUT ObjStm expansion: raw object spans
        om = _OBJ_HEAD_RE.search(pdf, pos)
        if om is None:
            break
        num = int(om.group(1))
        em = pdf.find(b"endobj", om.end())
        sm = _STREAM_START_RE.search(pdf, om.end())
        if sm is None or (em != -1 and em < sm.start()):
            objs[num] = (pdf[om.end() : em].strip(), None)
            pos = em + 6 if em != -1 else len(pdf)
            continue
        head = pdf[om.end() : sm.start()]
        lm = _LENGTH_RE.search(head)
        length = int(lm.group(1)) if lm and lm.group(2) is None else None
        if length is None:
            t = pdf.find(b"endstream", sm.end())
            raw = pdf[sm.end() : t].rstrip(b"\r\n")
            endpos = t
        else:
            raw = pdf[sm.end() : sm.end() + length]
            endpos = sm.end() + length
        objs[num] = (head.strip(), raw)
        pos = pdf.find(b"endobj", endpos)
        pos = pos + 6 if pos != -1 else endpos
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", pdf)
    if rm is None:
        raise ValueError("PDF without /Root in trailer")
    root = int(rm.group(1))

    packed = sorted(n for n, (h, r) in objs.items() if r is None)
    kept = sorted(n for n, (h, r) in objs.items() if r is not None)
    stm_num = max(objs) + 1
    xref_num = stm_num + 1

    bodies = [objs[n][0] for n in packed]
    joined = b" ".join(bodies) + b"\n"
    offs, at = [], 0
    for b in bodies:
        offs.append(at)
        at += len(b) + 1
    header = b" ".join(
        str(n).encode() + b" " + str(o).encode() for n, o in zip(packed, offs)
    ) + b" "
    payload = zlib.compress(header + joined)
    first = len(header)

    out = bytearray(b"%PDF-1.5\n")
    positions: dict[int, int] = {}
    for n in kept:
        head, raw = objs[n]
        positions[n] = len(out)
        out += (
            str(n).encode() + b" 0 obj\n" + head + b"\nstream\n"
            + raw + b"\nendstream\nendobj\n"
        )
    positions[stm_num] = len(out)
    out += (
        str(stm_num).encode() + b" 0 obj\n<< /Type /ObjStm /N "
        + str(len(packed)).encode() + b" /First " + str(first).encode()
        + b" /Filter /FlateDecode /Length " + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    # /XRef stream: W [1 4 2]; one row per object 0..xref_num
    size = xref_num + 1
    rows = bytearray()
    inside = {n: i for i, n in enumerate(packed)}
    xref_at = len(out)
    positions[xref_num] = xref_at
    for n in range(size):
        if n in positions:
            rows += b"\x01" + positions[n].to_bytes(4, "big") + b"\x00\x00"
        elif n in inside:
            rows += b"\x02" + stm_num.to_bytes(4, "big") + inside[n].to_bytes(2, "big")
        else:
            rows += b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
    xpayload = zlib.compress(bytes(rows))
    out += (
        str(xref_num).encode() + b" 0 obj\n<< /Type /XRef /Size "
        + str(size).encode() + b" /W [1 4 2] /Root " + str(root).encode()
        + b" 0 R /Filter /FlateDecode /Length " + str(len(xpayload)).encode()
        + b" >>\nstream\n" + xpayload + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    return bytes(out)
