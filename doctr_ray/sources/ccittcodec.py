"""CCITT Group 4 (ITU-T T.6 / MMR) and Group 3 1-D (T.4 / MH) fax codec.

The reference rasterizes every PDF through pypdfium2 (io/pdf.py:16-43),
whose bundled codecs include CCITT fax — THE compression of bilevel
archival scans (``/CCITTFaxDecode`` is what a document scanner's
"TIFF G4 in PDF" output uses). No native codec exists in this
container, so this module implements the two dominant variants in pure
Python + numpy:

- **Group 4 (K < 0)** — 2-D MMR coding: every row coded against the
  previous row via pass / horizontal / vertical modes, run lengths in
  the T.4 modified-Huffman tables, terminated by EOFB.
- **Group 3 1-D (K = 0)** — each row is an independent sequence of
  alternating white/black modified-Huffman run lengths (with or
  without EOLs; the PDF default ``EndOfLine false`` writes none).

Both directions are provided: ``decode_g4`` / ``decode_g3`` /
``decode_g3_2d`` (K > 0 mixed coding: EOL + tag bit per row, T.4
§4.2.1) for reading scanner output, ``encode_g4`` / ``encode_g3`` /
``encode_g3_2d`` so ``make_scanned_pdf`` can produce real archival
fixtures; all honour ``/EncodedByteAlign`` (row starts padded to byte
boundaries). Pixels are booleans with **True = black** (the caller
maps to sample bits per ``/BlackIs1``).

Out of scope (``NotImplementedError`` raised by the pdfimage caller):
uncompressed-mode extensions — vanishingly rare in PDF practice.

Code tables are the published ITU-T T.4 §2.3.1 tables; tests assert
prefix-freeness, the codeword-length envelope, and round-trips.
"""

from __future__ import annotations

import bisect

import numpy as np

# --- ITU-T T.4 modified-Huffman run-length tables ----------------------
# value -> code bit-string: terminating codes 0-63 and makeup codes
# 64-1728 per colour, plus the shared extended makeups 1792-2560.

WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

#: extended makeup codes 1792-2560 (T.4 §2.3.1.2, same for both colours)
EXT_MAKEUP: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2-D mode codes (T.4 table 4)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
_EOL = "000000000001"


def _decode_map(codes: dict[int, str]) -> dict[str, int]:
    m = {s: run for run, s in codes.items()}
    m.update({s: run for run, s in EXT_MAKEUP.items()})
    return m


_WHITE_DEC = _decode_map(WHITE_CODES)
_BLACK_DEC = _decode_map(BLACK_CODES)
_MAX_CODE_LEN = 13  # longest run code (black extended makeups)


def _bitstring(data: bytes) -> str:
    """Whole stream as an MSB-first '0'/'1' string — one numpy pass, so
    every subsequent peek is a plain slice."""
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    return (bits + np.uint8(ord("0"))).tobytes().decode("ascii")


def _read_run(s: str, pos: int, dec: dict[str, int]) -> tuple[int, int]:
    """One complete run length (zero or more makeups + a terminator)
    starting at bit ``pos``; returns (run, new_pos)."""
    total = 0
    while True:
        for ln in range(2, _MAX_CODE_LEN + 1):
            run = dec.get(s[pos : pos + ln])
            if run is not None:
                pos += ln
                total += run
                if run < 64:
                    return total, pos
                break
        else:
            raise ValueError(f"invalid CCITT run code at bit {pos}")


def _row_from_transitions(trans: list[int], columns: int) -> np.ndarray:
    """Changing-element positions -> bool row (True = black). Rows
    start white; transitions alternate white->black, black->white."""
    row = np.zeros(columns, bool)
    for i in range(0, len(trans) - 1, 2):
        a, b = trans[i], trans[i + 1]
        if a >= columns:
            break
        row[a : min(b, columns)] = True
    if len(trans) % 2 == 1 and trans[-1] < columns:
        row[trans[-1] :] = True  # row ends black
    return row


def _transitions_of(row: np.ndarray) -> list[int]:
    """Bool row -> changing-element positions (first is white->black)."""
    t = (np.flatnonzero(row[1:] != row[:-1]) + 1).tolist()
    if row[0]:
        t.insert(0, 0)
    return t


def _b1_index(ref: list[int], a0: int, color: int) -> int:
    """Index into ``ref`` of b1: the first changing element strictly
    right of ``a0`` whose NEW colour is opposite to the current run
    colour. ``ref`` alternates starting white->black, so the required
    index parity equals ``color``."""
    i = bisect.bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    return i


def _decode_2d_row(
    s: str, pos: int, ref: list[int], columns: int
) -> tuple[list[int], int, bool]:
    """One 2-D coded row (T.6 / T.4 2-D — same mode codes) against the
    reference row's changing elements; returns (transitions, new_pos,
    hit_eol)."""
    a0, color = -1, 0
    cur: list[int] = []
    hit_eol = False
    guard = 0
    while a0 < columns:
        guard += 1
        if guard > 4 * columns + 8:
            raise ValueError("CCITT 2-D row failed to terminate")
        w = s[pos : pos + 7]
        if w.startswith("1"):
            d, pos = 0, pos + 1
        elif w.startswith("011"):
            d, pos = 1, pos + 3
        elif w.startswith("010"):
            d, pos = -1, pos + 3
        elif w.startswith("001"):  # horizontal
            pos += 3
            start = max(a0, 0)
            r1, pos = _read_run(s, pos, _BLACK_DEC if color else _WHITE_DEC)
            r2, pos = _read_run(s, pos, _WHITE_DEC if color else _BLACK_DEC)
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
            continue
        elif w.startswith("0001"):  # pass
            pos += 4
            i1 = _b1_index(ref, a0, color)
            a0 = ref[i1 + 1] if i1 + 1 < len(ref) else columns
            continue
        elif w.startswith("000011"):
            d, pos = 2, pos + 6
        elif w.startswith("000010"):
            d, pos = -2, pos + 6
        elif w == "0000011":
            d, pos = 3, pos + 7
        elif w == "0000010":
            d, pos = -3, pos + 7
        elif not w.strip("0"):
            hit_eol = True  # EOL / EOFB / padding reached mid-scan
            break
        else:
            raise ValueError(f"invalid CCITT 2-D mode code at bit {pos}")
        i1 = _b1_index(ref, a0, color)  # vertical mode
        b1 = ref[i1] if i1 < len(ref) else columns
        a1 = b1 + d
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur, pos, hit_eol


def decode_g4(
    data: bytes, columns: int, rows: int | None = None, byte_align: bool = False
) -> np.ndarray:
    """Group 4 (T.6 MMR) stream -> (rows, columns) bool, True = black.

    Decodes until EOFB, end of data, or ``rows`` rows when given.
    ``byte_align`` = PDF ``/EncodedByteAlign true``: each coded row
    starts on a byte boundary."""
    s = _bitstring(data)
    pos = 0
    ref: list[int] = []  # imaginary all-white row above the first
    out: list[np.ndarray] = []
    while rows is None or len(out) < rows:
        if len(s) - pos < 4 or s[pos : pos + 24] == _EOL + _EOL:
            break
        cur, pos, hit_eol = _decode_2d_row(s, pos, ref, columns)
        if hit_eol and not cur:
            break
        out.append(_row_from_transitions(cur, columns))
        ref = _transitions_of(out[-1])
        if byte_align:
            pos = (pos + 7) // 8 * 8
    if rows is not None and len(out) < rows:
        raise ValueError(f"CCITT G4 stream ended at row {len(out)} of {rows}")
    return np.stack(out) if out else np.zeros((0, columns), bool)


def decode_g3_2d(
    data: bytes, columns: int, rows: int | None = None, byte_align: bool = False
) -> np.ndarray:
    """Group 3 2-D mixed coding (T.4 §4.2, PDF ``/K > 0``): every row
    is preceded by an EOL whose trailing TAG bit says whether the next
    row is 1-D (MH) or 2-D coded against the row above."""
    s = _bitstring(data)
    pos = 0
    ref: list[int] = []
    out: list[np.ndarray] = []
    while rows is None or len(out) < rows:
        # find the next EOL (11+ zeros then a 1); K>0 rows REQUIRE it
        nz = s.find("1", pos)
        if nz == -1 or nz + 1 >= len(s):
            break
        if nz - pos < 11:
            if pos == 0:
                raise ValueError("CCITT K>0 stream must start with EOL")
            break  # fill/padding exhausted: end of data
        pos = nz + 1
        tag, pos = s[pos], pos + 1
        if tag == "1":  # 1-D MH row
            p, color = 0, 0
            trans: list[int] = []
            while p < columns:
                run, pos = _read_run(s, pos, _BLACK_DEC if color else _WHITE_DEC)
                p += run
                trans.append(p)
                color ^= 1
            cur = trans
        else:  # 2-D row against the previous one
            cur, pos, hit = _decode_2d_row(s, pos, ref, columns)
            if hit and not cur:
                break
        out.append(_row_from_transitions(cur, columns))
        ref = _transitions_of(out[-1])
        if byte_align:
            pos = (pos + 7) // 8 * 8
    if rows is not None and len(out) < rows:
        raise ValueError(f"CCITT K>0 stream ended at row {len(out)} of {rows}")
    return np.stack(out) if out else np.zeros((0, columns), bool)


def decode_g3(
    data: bytes, columns: int, rows: int | None = None, byte_align: bool = False
) -> np.ndarray:
    """Group 3 1-D (T.4 MH) stream -> (rows, columns) bool, True=black.

    Accepts streams with or without per-row EOL codes (PDF default is
    ``EndOfLine false``: none). ``byte_align`` = ``/EncodedByteAlign
    true``: each coded row starts on a byte boundary."""
    s = _bitstring(data)
    pos = 0
    out: list[np.ndarray] = []
    while rows is None or len(out) < rows:
        # skip EOLs (>= 11 zeros then a 1, possibly fill-padded)
        while True:
            nz = s.find("1", pos)
            if nz != -1 and nz - pos >= 11:
                pos = nz + 1
            else:
                break
        # trailing byte-pad is < 8 zero bits and no valid code starts
        # with 8+ zeros, so an all-zero (or empty) tail means end
        if nz == -1 or len(s) - pos < 2:
            break
        p, color = 0, 0
        trans: list[int] = []
        while p < columns:
            run, pos = _read_run(s, pos, _BLACK_DEC if color else _WHITE_DEC)
            p += run
            trans.append(p)
            color ^= 1
        out.append(_row_from_transitions(trans, columns))
        if byte_align:
            pos = (pos + 7) // 8 * 8
    if rows is not None and len(out) < rows:
        raise ValueError(f"CCITT G3 stream ended at row {len(out)} of {rows}")
    return np.stack(out) if out else np.zeros((0, columns), bool)


class _BitWriter:
    def __init__(self):
        self.parts: list[str] = []
        self.nbits = 0

    def put(self, bits: str) -> None:
        self.parts.append(bits)
        self.nbits += len(bits)

    def align(self) -> None:
        pad = -self.nbits % 8
        if pad:
            self.put("0" * pad)

    def tobytes(self) -> bytes:
        s = "".join(self.parts)
        arr = np.frombuffer(s.encode("ascii"), np.uint8) - np.uint8(ord("0"))
        return np.packbits(arr).tobytes()  # packbits zero-pads the tail


def _put_run(bw: _BitWriter, run: int, codes: dict[int, str]) -> None:
    while run >= 2624:  # chain max makeups for very long runs
        bw.put(EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        make = (run // 64) * 64
        bw.put(codes[make] if make <= 1728 else EXT_MAKEUP[make])
        run -= make
    bw.put(codes[run])


def _encode_2d_row(bw: _BitWriter, cur: list[int], ref: list[int], w: int) -> None:
    a0, color, ci = -1, 0, 0
    while a0 < w:
        a1 = cur[ci] if ci < len(cur) else w
        i1 = _b1_index(ref, a0, color)
        b1 = ref[i1] if i1 < len(ref) else w
        b2 = ref[i1 + 1] if i1 + 1 < len(ref) else w
        if b2 < a1:
            bw.put(_MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.put(_MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            start = max(a0, 0)
            bw.put(_MODE_HORIZ)
            _put_run(bw, a1 - start, BLACK_CODES if color else WHITE_CODES)
            _put_run(bw, a2 - a1, WHITE_CODES if color else BLACK_CODES)
            a0 = a2
            ci += 2


def _encode_1d_row(bw: _BitWriter, row: np.ndarray, w: int) -> None:
    pos, color = 0, 0
    for t in _transitions_of(row) + [w]:
        _put_run(bw, t - pos, BLACK_CODES if color else WHITE_CODES)
        pos = t
        color ^= 1


def encode_g4(image: np.ndarray, byte_align: bool = False) -> bytes:
    """(H, W) bool/0-1 array (True = black) -> Group 4 stream + EOFB."""
    img = np.ascontiguousarray(image).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        cur = _transitions_of(img[y])
        _encode_2d_row(bw, cur, ref, w)
        if byte_align:
            bw.align()
        ref = cur
    bw.put(_EOL + _EOL)  # EOFB
    return bw.tobytes()


def encode_g3(image: np.ndarray, byte_align: bool = False) -> bytes:
    """(H, W) bool/0-1 array (True = black) -> Group 3 1-D stream
    (no EOLs — the PDF ``EndOfLine false`` default)."""
    img = np.ascontiguousarray(image).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    for y in range(h):
        _encode_1d_row(bw, img[y], w)
        if byte_align:
            bw.align()
    return bw.tobytes()


def encode_g3_2d(image: np.ndarray, k: int = 4, byte_align: bool = False) -> bytes:
    """(H, W) bool/0-1 (True = black) -> Group 3 2-D mixed stream
    (PDF ``/K > 0``): every row EOL-prefixed with a tag bit; each
    k-th row is 1-D coded, the rows between are 2-D coded against
    the row above (T.4 §4.2.1)."""
    img = np.ascontiguousarray(image).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        one_d = y % max(k, 1) == 0
        bw.put(_EOL + ("1" if one_d else "0"))
        cur = _transitions_of(img[y])
        if one_d:
            _encode_1d_row(bw, img[y], w)
        else:
            _encode_2d_row(bw, cur, ref, w)
        if byte_align:
            bw.align()
        ref = cur
    return bw.tobytes()
