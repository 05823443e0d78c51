"""MQ arithmetic coder (ITU-T T.88 Annex E / T.800 Annex C).

The adaptive binary arithmetic coder shared by JBIG2 (generic/symbol
region coding — what ``/JBIG2Decode`` streams in PDFs contain) and
JPEG 2000 (EBCOT tier-1 block coding behind ``/JPXDecode``). The
reference rasterizes PDFs through pypdfium2 (io/pdf.py:16-43) whose
bundled codecs implement this; no native codec exists in this
container, so this is a from-the-spec pure-Python transcription.

Both directions are implemented from the published pseudocode
(T.88 Annex E figures E.5-E.10: INITENC / CODEMPS / CODELPS /
BYTEOUT / FLUSH and INITDEC / DECODE / BYTEIN):

- 47-state Qe probability table with NMPS / NLPS transitions and
  conditional MPS/LPS exchange,
- byte-stuffing after 0xFF so a carry never propagates more than one
  byte (the decoder's BYTEIN treats 0xFF followed by a byte > 0x8F as
  end-of-data and feeds 1-bits, which is how the terminating
  0xFF 0xAC marker written by FLUSH is absorbed),
- per-context adaptive state kept OUTSIDE the coder (callers pass
  ``bytearray`` index/MPS tables sized to their context space), so a
  region decoder can run several context sets over one coder.

The hot per-pixel loops in jbig2codec inline this state machine for
speed; these classes are the readable contract the inlined loops are
differential-tested against.
"""

from __future__ import annotations

# --- T.88 Table E.1: the 47-entry Qe probability-state machine -------
# (Qe, NMPS, NLPS, SWITCH) per state index.
QE_TABLE: tuple[tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# flat tuples for the inlined loops (index once, no tuple unpack)
QE = tuple(r[0] for r in QE_TABLE)
NMPS = tuple(r[1] for r in QE_TABLE)
NLPS = tuple(r[2] for r in QE_TABLE)
SWITCH = tuple(r[3] for r in QE_TABLE)


class MQDecoder:
    """T.88 Annex E.3.2-E.3.4 decoder over one byte string.

    Context state lives in caller-owned ``icx`` (state index) and
    ``mps`` (most-probable-symbol bit) bytearrays indexed by the
    caller's context label.
    """

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        n = len(data)
        cur = data[bp] if bp < n else 0xFF
        if cur == 0xFF:
            nxt = data[bp + 1] if bp + 1 < n else 0xFF
            if nxt > 0x8F:
                # marker / end of data: feed 1-bits forever
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = data[bp + 1] if bp + 1 < n else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, icx: bytearray, mps: bytearray, cx: int) -> int:
        """DECODE one decision in context ``cx`` (T.88 figure E.17)."""
        i = icx[cx]
        qe = QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS subinterval selected (with conditional exchange)
            if self.a < qe:
                d = mps[cx]
                icx[cx] = NMPS[i]
            else:
                d = mps[cx] ^ 1
                if SWITCH[i]:
                    mps[cx] ^= 1
                icx[cx] = NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps[cx]
            if self.a < qe:
                d = mps[cx] ^ 1
                if SWITCH[i]:
                    mps[cx] ^= 1
                icx[cx] = NLPS[i]
            else:
                d = mps[cx]
                icx[cx] = NMPS[i]
        # RENORMD
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                self.c, self.ct = c, 0
                self._bytein()
                c, ct = self.c, self.ct
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct
        return d


class MQEncoder:
    """T.88 Annex E.3.5-E.3.8 encoder.

    Output bytes accumulate in ``self.out`` behind one dummy slot at
    index 0 (the spec's BP = BPST - 1 convention: a carry out of the
    first code byte increments the dummy; ``flush`` asserts it stayed
    0 and strips it).
    """

    __slots__ = ("a", "c", "ct", "out")

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # dummy byte at BPST - 1

    def encode(self, icx: bytearray, mps: bytearray, cx: int, d: int) -> None:
        i = icx[cx]
        qe = QE[i]
        if d == mps[cx]:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = NMPS[i]
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if SWITCH[i]:
                mps[cx] ^= 1
            icx[cx] = NLPS[i]
        # RENORME
        a, c, ct = self.a, self.c, self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.a, self.c = a, c
                self._byteout()
                c, ct = self.c, self.ct
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def _byteout(self) -> None:
        out = self.out
        c = self.c
        if out[-1] == 0xFF:
            out.append((c >> 20) & 0xFF)
            self.c = c & 0xFFFFF
            self.ct = 7
            return
        if c < 0x8000000:
            out.append((c >> 19) & 0xFF)
            self.c = c & 0x7FFFF
            self.ct = 8
            return
        out[-1] += 1  # carry into the previous byte
        if out[-1] == 0xFF:
            c &= 0x7FFFFFF
            out.append((c >> 20) & 0xFF)
            self.c = c & 0xFFFFF
            self.ct = 7
        else:
            out.append((c >> 19) & 0xFF)
            self.c = c & 0x7FFFF
            self.ct = 8

    def flush(self) -> bytes:
        """FLUSH (T.88 figure E.11): SETBITS, drain C, 0xFF 0xAC marker."""
        # SETBITS: force the low 16 bits of C to ones so the untransmitted
        # tail matches the decoder's 1-bit stuffing beyond the stream end
        # (BYTEIN feeds 0xFF forever); if that pushed C to or past the top
        # of the interval [C, C + A), step back half a unit.
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        out = self.out
        if out[-1] != 0xFF:
            out.append(0xFF)
        out.append(0xAC)
        if out[0] != 0:
            # Carry into the dummy byte would mean a code value >= 1.0
            # (the coded interval always sits inside [0, 1)).
            raise AssertionError("MQ carry escaped the code stream")
        return bytes(out[1:])
