"""The remaining standard PDF stream filters (PDF 32000 §7.4):
``/LZWDecode``, ``/RunLengthDecode``, ``/ASCIIHexDecode`` and
``/ASCII85Decode`` — with these, every standard stream filter a PDF
can carry decodes in-container (Flate/DCT/CCITT/JBIG2/JPX live in
their own modules).

The reference reads all of them through pypdfium2 (io/pdf.py:16-43).
Both directions are implemented so fixture writers can emit legacy
and transport-encoded streams:

- **LZW** is the TIFF flavour PDF uses: variable 9-12 bit codes,
  Clear=256 / EOD=257, code width growing one step EARLY by default
  (``/EarlyChange 1``) — the off-by-one that distinguishes it from
  GIF LZW (gifcodec implements that one).
- **ASCII85** honours the ``z`` all-zero shortcut and the ``~>``
  terminator; partial final groups per spec.
- Filter CHAINS (``/Filter [/ASCII85Decode /FlateDecode]``) are the
  reason these are exposed as plain bytes->bytes functions: callers
  apply them in array order.
"""

from __future__ import annotations

import re
import struct
import zlib


# --- LZW (PDF/TIFF flavour) ---------------------------------------------


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """``/LZWDecode``: 9-12 bit variable codes, MSB-first bit packing."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:  # Clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Mirror of lzw_decode (always emits Clear first, EOD last)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(256, width)
    run = b""
    for i in range(len(data)):
        cand = run + data[i:i + 1]
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = nxt
        nxt += 1
        # the DECODER grows its read width when ITS table (one entry
        # behind ours) reaches the boundary; mirror that timing
        if nxt + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            put(256, width)
            table = {bytes([b]): b for b in range(256)}
            nxt = 258
            width = 9
        run = data[i:i + 1]
    if run:
        put(table[run], width)
    put(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- RunLength -----------------------------------------------------------


def rle_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i:i + length + 1]
            i += length + 1
        else:
            out += data[i:i + 1] * (257 - length)
            i += 1
    return bytes(out)


def rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run until the next >=3 repeat (2-repeats not worth it)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    out.append(128)
    return bytes(out)


# --- ASCIIHex / ASCII85 ----------------------------------------------------


def ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">")[0]
    hexchars = bytes(c for c in body if not chr(c).isspace())
    if len(hexchars) % 2:
        hexchars += b"0"
    return bytes.fromhex(hexchars.decode("ascii"))


def ascii_hex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def ascii85_decode(data: bytes) -> bytes:
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if chr(c).isspace():
            continue
        if c == 0x7A:  # 'z' = four zero bytes (only between groups)
            if group:
                raise ValueError("ASCII85: z inside group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("ASCII85: character out of range")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += struct.pack(">I", v)
            group = []
    if group:
        k = len(group)
        if k == 1:
            raise ValueError("ASCII85: single trailing character")
        v = 0
        for g in group + [84] * (5 - k):
            v = v * 85 + g
        out += struct.pack(">I", v)[: k - 1]
    return bytes(out)


def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data) - len(data) % 4, 4):
        (v,) = struct.unpack_from(">I", data, i)
        if v == 0:
            out.append(0x7A)
            continue
        chunk = bytearray(5)
        for k in range(4, -1, -1):
            chunk[k] = 0x21 + v % 85
            v //= 85
        out += chunk
    rem = len(data) % 4
    if rem:
        (v,) = struct.unpack(">I", data[-rem:] + b"\x00" * (4 - rem))
        chunk = bytearray(5)
        for k in range(4, -1, -1):
            chunk[k] = 0x21 + v % 85
            v //= 85
        out += chunk[: rem + 1]
    return bytes(out) + b"~>"


#: PDF name -> decoder, for transport filters that wrap another filter
TRANSPORT_DECODERS = {
    b"ASCIIHexDecode": ascii_hex_decode,
    b"ASCII85Decode": ascii85_decode,
    b"RunLengthDecode": rle_decode,
    b"LZWDecode": lzw_decode,
}


# --- /Filter chain helpers -------------------------------------------------

_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def filter_chain(head: bytes) -> list[bytes]:
    """``/Filter`` entry of a stream dict -> filter names in
    application order (PDF 32000 7.4: ``[/ASCII85Decode /FlateDecode]``
    means the stored bytes were flated FIRST then 85-armoured, so
    decoding applies the array left to right). Empty when unfiltered."""
    m = _FILTER_RE.search(head)
    if m is None:
        return []
    return _NAME_RE.findall(m.group(1))


def lzw_early(head: bytes) -> int:
    """``/DecodeParms << /EarlyChange n >>`` (default 1 per spec)."""
    m = re.search(rb"/EarlyChange\s+(\d)", head)
    return int(m.group(1)) if m else 1


def decode_stream(head: bytes, raw: bytes) -> bytes:
    """A NON-image stream payload through its full ``/Filter`` chain
    (content streams, palette lookups, font programs): Flate/LZW plus
    the transport filters. Image-codec filters are not legal here."""
    for name in filter_chain(head):
        if name == b"FlateDecode":
            raw = zlib.decompress(raw)
        elif name == b"LZWDecode":
            raw = lzw_decode(raw, lzw_early(head))
        elif name in TRANSPORT_DECODERS:
            raw = TRANSPORT_DECODERS[name](raw)
        else:
            raise NotImplementedError(
                f"PDF stream filter /{name.decode()} on a non-image stream"
            )
    return raw
