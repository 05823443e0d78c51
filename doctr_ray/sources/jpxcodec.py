"""JPEG 2000 (ITU-T T.800) codec — the ``/JPXDecode`` PDF filter.

The reference rasterizes PDFs through pypdfium2 (io/pdf.py:16-43)
whose bundled OpenJPEG implements this; no native codec exists in
this container. This module implements the lossless profile PDFs
actually embed, in pure Python + numpy, both directions:

- **5/3 reversible DWT** (Annex F): integer lifting with symmetric
  extension, arbitrary decomposition levels, exact round-trip;
- **EBCOT tier-1 code-block coding** (Annex D): the three coding
  passes (significance propagation / magnitude refinement / cleanup)
  per bit-plane over the 4-row stripe scan, zero/sign/magnitude
  context formation per subband orientation and the run-length mode,
  driven by the shared MQ coder (sources/mqcoder);
- **tier-2 packet headers** (Annex B): inclusion + missing-bit-plane
  tag trees, coding-pass counts, Lblock length coding, bit-stuffed
  header read/write;
- **codestream syntax** (Annex A): SOC/SIZ/COD/QCD/SOT/SOD/EOC, one
  tile, single quality layer, CPRL progression, RCT for RGB — the
  shape a lossless encoder emits; plus the JP2 box container both
  ways (PDFs embed either raw codestreams or JP2 files).

Both profiles are implemented: the lossless one above (5/3
reversible, RCT) and the LOSSY delivery profile — **9/7 irreversible
DWT** (Annex F lifting with the K scaling), **ICT** (G.3 float
YCbCr) and **scalar-expounded quantization** (E.4/E.5: per-subband
(epsilon, mu) steps in QCD, deadzone quantizer, mid-point
reconstruction). Out of scope (honest ``NotImplementedError`` naming
the gap): multiple tiles / layers / precinct partitions, ROI
shifting, and scalar-DERIVED quantization signaling (Sqcd style 1).

Bit depths up to 16 per component, 1 or 3 components.
"""

from __future__ import annotations

import struct

import numpy as np

from .mqcoder import NLPS, NMPS, QE, SWITCH, MQEncoder

# --- 5/3 reversible DWT (T.800 Annex F) --------------------------------


def _fwd_53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One lifting step along the last axis: x -> (low, high).

    Whole-sample symmetric extension at both ends; under it the detail
    sequence satisfies d[-1] = d[0] and d[no] = d[no-1], which is how
    the boundary terms below are formed.
    """
    n = x.shape[-1]
    if n == 1:
        return x.astype(np.int64), x[..., :0].astype(np.int64)
    even = x[..., 0::2].astype(np.int64)
    odd = x[..., 1::2].astype(np.int64)
    ne, no = even.shape[-1], odd.shape[-1]
    # d[i] = odd[i] - floor((x[2i] + x[2i+2]) / 2); x[n] reflects to
    # x[n-2] = even[ne-1] when n is even
    nxt = np.concatenate([even[..., 1:], even[..., ne - 1:ne]],
                         axis=-1)[..., :no]
    d = odd - ((even[..., :no] + nxt) >> 1)
    # s[i] = even[i] + floor((d[i-1] + d[i] + 2) / 4)
    dpre = np.concatenate([d[..., 0:1], d], axis=-1)[..., :ne]
    dcur = np.concatenate([d, d[..., no - 1:no]], axis=-1)[..., :ne]
    s = even + ((dpre + dcur + 2) >> 2)
    return s, d


def _inv_53_1d(s: np.ndarray, d: np.ndarray, n: int) -> np.ndarray:
    """Inverse of _fwd_53_1d along the last axis, output length n."""
    if n == 1:
        return s.copy()
    s = s.astype(np.int64)
    d = d.astype(np.int64)
    ne, no = s.shape[-1], d.shape[-1]
    dpre = np.concatenate([d[..., 0:1], d], axis=-1)[..., :ne]
    dcur = np.concatenate([d, d[..., no - 1:no]], axis=-1)[..., :ne]
    even = s - ((dpre + dcur + 2) >> 2)
    nxt = np.concatenate([even[..., 1:], even[..., ne - 1:ne]],
                         axis=-1)[..., :no]
    odd = d + ((even[..., :no] + nxt) >> 1)
    out = np.empty(s.shape[:-1] + (n,), dtype=np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def dwt53_forward(img: np.ndarray, levels: int):
    """(H, W) int array -> [LL_n, (HL_n, LH_n, HH_n), ..., (HL_1, ...)].

    Row transform then column transform per level (mirrored exactly by
    dwt53_inverse; subbands laid out LL=top-left convention).
    """
    cur = img.astype(np.int64)
    bands = []
    for _ in range(levels):
        lo, hi = _fwd_53_1d(cur)  # rows
        ll, lh = _fwd_53_1d(np.swapaxes(lo, -1, -2))  # cols of low half
        hl, hh = _fwd_53_1d(np.swapaxes(hi, -1, -2))
        ll = np.swapaxes(ll, -1, -2)
        lh = np.swapaxes(lh, -1, -2)
        hl = np.swapaxes(hl, -1, -2)
        hh = np.swapaxes(hh, -1, -2)
        bands.append((hl, lh, hh))
        cur = ll
    bands.append(cur)
    return bands[::-1]  # [LL, (HL,LH,HH) coarsest..finest]


def dwt53_inverse(bands, shape: tuple[int, int]) -> np.ndarray:
    """Inverse of dwt53_forward back to ``shape``."""
    # reconstruct the level-by-level shapes from the full image shape
    shapes = [shape]
    for _ in range(len(bands) - 1):
        h, w = shapes[-1]
        shapes.append(((h + 1) // 2, (w + 1) // 2))
    shapes = shapes[::-1]  # coarsest LL first
    cur = np.asarray(bands[0], dtype=np.int64)
    for lev in range(1, len(bands)):
        hl, lh, hh = (np.asarray(b, dtype=np.int64) for b in bands[lev])
        h, w = shapes[lev]
        lo = _inv_53_1d(np.swapaxes(cur, -1, -2), np.swapaxes(lh, -1, -2), h)
        lo = np.swapaxes(lo, -1, -2)
        hi = _inv_53_1d(np.swapaxes(hl, -1, -2), np.swapaxes(hh, -1, -2), h)
        hi = np.swapaxes(hi, -1, -2)
        cur = _inv_53_1d(lo, hi, w)
    return cur


# --- 9/7 irreversible DWT (T.800 Annex F, the lossy profile) ------------

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _fwd_97_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """9/7 lifting along the last axis: x -> (low, high) floats.

    Same whole-sample symmetric extension as the 5/3 (d[-1]=d[0],
    even[ne]=even[ne-1] mirrors), four lifting steps + the K scaling."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(np.float64), x[..., :0].astype(np.float64)
    even = x[..., 0::2].astype(np.float64)
    odd = x[..., 1::2].astype(np.float64)
    ne, no = even.shape[-1], odd.shape[-1]

    def nxt(ev):
        return np.concatenate([ev[..., 1:], ev[..., ne - 1 : ne]], axis=-1)[
            ..., :no
        ]

    def pre(d):
        return np.concatenate([d[..., 0:1], d], axis=-1)[..., :ne]

    def cur(d):
        return np.concatenate([d, d[..., no - 1 : no]], axis=-1)[..., :ne]

    odd = odd + _A97 * (even[..., :no] + nxt(even))
    even = even + _B97 * (pre(odd) + cur(odd))
    odd = odd + _G97 * (even[..., :no] + nxt(even))
    even = even + _D97 * (pre(odd) + cur(odd))
    return even / _K97, odd * _K97


def _inv_97_1d(s: np.ndarray, d: np.ndarray, n: int) -> np.ndarray:
    """Inverse of _fwd_97_1d along the last axis, output length n."""
    if n == 1:
        return s.astype(np.float64).copy()
    even = s.astype(np.float64) * _K97
    odd = d.astype(np.float64) / _K97
    ne, no = even.shape[-1], odd.shape[-1]

    def nxt(ev):
        return np.concatenate([ev[..., 1:], ev[..., ne - 1 : ne]], axis=-1)[
            ..., :no
        ]

    def pre(dd):
        return np.concatenate([dd[..., 0:1], dd], axis=-1)[..., :ne]

    def cur(dd):
        return np.concatenate([dd, dd[..., no - 1 : no]], axis=-1)[..., :ne]

    even = even - _D97 * (pre(odd) + cur(odd))
    odd = odd - _G97 * (even[..., :no] + nxt(even))
    even = even - _B97 * (pre(odd) + cur(odd))
    odd = odd - _A97 * (even[..., :no] + nxt(even))
    out = np.empty(s.shape[:-1] + (n,), dtype=np.float64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def dwt97_forward(img: np.ndarray, levels: int):
    """Float twin of dwt53_forward (same band layout)."""
    cur = img.astype(np.float64)
    bands = []
    for _ in range(levels):
        lo, hi = _fwd_97_1d(cur)
        ll, lh = _fwd_97_1d(np.swapaxes(lo, -1, -2))
        hl, hh = _fwd_97_1d(np.swapaxes(hi, -1, -2))
        bands.append(
            (
                np.swapaxes(hl, -1, -2),
                np.swapaxes(lh, -1, -2),
                np.swapaxes(hh, -1, -2),
            )
        )
        cur = np.swapaxes(ll, -1, -2)
    bands.append(cur)
    return bands[::-1]


def dwt97_inverse(bands, shape: tuple[int, int]) -> np.ndarray:
    """Float twin of dwt53_inverse."""
    shapes = [shape]
    for _ in range(len(bands) - 1):
        h, w = shapes[-1]
        shapes.append(((h + 1) // 2, (w + 1) // 2))
    shapes = shapes[::-1]
    cur = np.asarray(bands[0], dtype=np.float64)
    for lev in range(1, len(bands)):
        hl, lh, hh = (np.asarray(b, dtype=np.float64) for b in bands[lev])
        h, w = shapes[lev]
        lo = _inv_97_1d(np.swapaxes(cur, -1, -2), np.swapaxes(lh, -1, -2), h)
        lo = np.swapaxes(lo, -1, -2)
        hi = _inv_97_1d(np.swapaxes(hl, -1, -2), np.swapaxes(hh, -1, -2), h)
        hi = np.swapaxes(hi, -1, -2)
        cur = _inv_97_1d(lo, hi, w)
    return cur


# --- EBCOT tier-1 (T.800 Annex D) ---------------------------------------

#: context indices: 0-8 zero coding, 9-13 sign, 14-16 magnitude
#: refinement, 17 run-length, 18 uniform
_CTX_RL = 17
_CTX_UNI = 18
_N_CTX = 19

#: zero-coding context lookup tables, indexed [h][v][d] (h,v in 0-2,
#: d in 0-4), per subband orientation
def _zc_tables():
    lh = np.zeros((3, 3, 5), np.uint8)  # LL and LH bands
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                else:
                    if v == 2:
                        c = 4
                    elif v == 1:
                        c = 3
                    elif d >= 2:
                        c = 2
                    else:
                        c = d  # 1 or 0
                lh[h, v, d] = c
    hl = np.swapaxes(lh, 0, 1).copy()  # H and V roles swap
    hh = np.zeros((3, 3, 5), np.uint8)
    for h in range(3):
        for v in range(3):
            hv = h + v
            for d in range(5):
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else hv  # 2 / 1 / 0
                hh[h, v, d] = c
    return lh, hl, hh


_ZC_LH, _ZC_HL, _ZC_HH = _zc_tables()

#: sign-coding context + xor, indexed [hc+1][vc+1] with hc,vc in -1..1
_SC_CTX = np.array([[13, 12, 11], [10, 9, 10], [11, 12, 13]], np.uint8)
_SC_XOR = np.array([[1, 1, 1], [1, 0, 0], [0, 0, 0]], np.uint8)


class _BlockCoder:
    """Shared stripe-scan state for one code-block.

    All state lives in flat Python bytearrays over a (h+2) x (w+2)
    padded grid (numpy scalar indexing costs ~2us per access — 10x the
    whole per-coefficient budget here). ``nbr`` counts significant
    8-neighbors and is maintained incrementally on each significance
    event, making the SPP membership test and the cleanup run-length
    precondition O(1) reads.
    """

    __slots__ = ("h", "w", "stride", "zc", "sig", "sgn", "nbr",
                 "visited", "refined")

    def __init__(self, h: int, w: int, band: str):
        self.h, self.w = h, w
        self.stride = w + 2
        self.zc = {"LL": _ZC_LH_F, "LH": _ZC_LH_F, "HL": _ZC_HL_F,
                   "HH": _ZC_HH_F}[band]
        n = (h + 2) * (w + 2)
        self.sig = bytearray(n)
        self.sgn = bytearray(n)  # 1 = negative
        self.nbr = bytearray(n)  # significant 8-neighbor count
        self.visited = bytearray(n)
        self.refined = bytearray(n)

    def set_sig(self, p: int, negative: int) -> None:
        """Mark position ``p`` (padded index) significant."""
        self.sig[p] = 1
        self.sgn[p] = negative
        st, nbr = self.stride, self.nbr
        for q in (p - st - 1, p - st, p - st + 1, p - 1, p + 1,
                  p + st - 1, p + st, p + st + 1):
            nbr[q] += 1

    def zc_ctx(self, p: int) -> int:
        s, st = self.sig, self.stride
        return self.zc[
            (s[p - 1] + s[p + 1])
            | ((s[p - st] + s[p + st]) << 2)
            | ((s[p - st - 1] + s[p - st + 1] + s[p + st - 1]
                + s[p + st + 1]) << 4)
        ]

    def sc_ctx(self, p: int) -> int:
        """Packed (ctx << 1) | xor for sign coding."""
        s, g, st = self.sig, self.sgn, self.stride
        hc = ((s[p - 1] & ~g[p - 1] & 1) + (s[p + 1] & ~g[p + 1] & 1)
              - (s[p - 1] & g[p - 1]) - (s[p + 1] & g[p + 1]))
        vc = ((s[p - st] & ~g[p - st] & 1) + (s[p + st] & ~g[p + st] & 1)
              - (s[p - st] & g[p - st]) - (s[p + st] & g[p + st]))
        if hc > 1:
            hc = 1
        elif hc < -1:
            hc = -1
        if vc > 1:
            vc = 1
        elif vc < -1:
            vc = -1
        return _SC_PACKED[(hc + 1) * 3 + (vc + 1)]

    def mr_ctx(self, p: int) -> int:
        if self.refined[p]:
            return 16
        return 15 if self.nbr[p] else 14


def _zc_flat(table):
    """(3,3,5) table -> flat list indexed h | v<<2 | d<<4."""
    out = [0] * (5 << 4 | 3 << 2 | 3)
    flat = [0] * 80
    flat = [0] * ((4 << 4) + (2 << 2) + 2 + 1)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                flat[h | (v << 2) | (d << 4)] = int(table[h, v, d])
    return flat


_ZC_LH_F = _zc_flat(_ZC_LH)
_ZC_HL_F = _zc_flat(_ZC_HL)
_ZC_HH_F = _zc_flat(_ZC_HH)

#: packed sign-coding (ctx << 1) | xor, indexed (hc+1)*3 + (vc+1)
_SC_PACKED = [int(_SC_CTX[h, v]) << 1 | int(_SC_XOR[h, v])
              for h in range(3) for v in range(3)]


def encode_block(coeffs: np.ndarray, band: str) -> tuple[bytes, int, int]:
    """EBCOT-encode one code-block of signed coefficients.

    Returns (codeword, number_of_bitplanes, number_of_passes). The
    caller signals ``missing = Mb - number_of_bitplanes`` zero
    bit-planes through the packet-header tag tree.
    """
    h, w = coeffs.shape
    mag = np.abs(coeffs).astype(np.int64)
    maxmag = int(mag.max()) if mag.size else 0
    nplanes = maxmag.bit_length()
    if nplanes == 0:
        return b"", 0, 0
    st = _BlockCoder(h, w, band)
    stride = st.stride
    # padded flat planes of magnitude bits (per bit-plane) and sign
    negpad = bytearray((h + 2) * stride)
    for y in range(h):
        row = (coeffs[y] < 0)
        base = (y + 1) * stride + 1
        negpad[base:base + w] = row.astype(np.uint8).tobytes()
    enc = MQEncoder()
    icx = bytearray(_N_CTX)
    mps = bytearray(_N_CTX)
    icx[_CTX_UNI] = 46
    icx[_CTX_RL] = 3
    icx[0] = 4

    def put(cx, bit):
        enc.encode(icx, mps, cx, bit)

    npasses = 0
    for p in range(nplanes - 1, -1, -1):
        bitpad = bytearray((h + 2) * stride)
        plane = ((mag >> p) & 1).astype(np.uint8)
        for y in range(h):
            base = (y + 1) * stride + 1
            bitpad[base:base + w] = plane[y].tobytes()
        first = p == nplanes - 1
        if not first:
            _spp(st, bitpad, negpad, put, None)
            npasses += 1
            _mrp(st, bitpad, put, None)
            npasses += 1
        _cup(st, bitpad, negpad, put, None)
        npasses += 1
        st.visited = bytearray(len(st.visited))
    return enc.flush(), nplanes, npasses


def decode_block(data: bytes, h: int, w: int, band: str, nplanes: int,
                 npasses: int) -> np.ndarray:
    """Inverse of encode_block.

    The three coding passes run in ONE frame with the MQ state machine
    and context formation inlined over locals (the jbig2codec
    pattern), eliminating ~3.4M method/attribute dispatches per
    megapixel of tier-1 decode. Measured honestly (interleaved A/B,
    6 rounds, glyph page): min-of-runs ~equal, medians ~1.15x faster
    and much tighter — the remaining cost is bytearray scan work, not
    dispatch. Bit-exact with the encoder-side pass functions below
    (round-trip asserted across the test matrix)."""
    out_mag = np.zeros((h, w), np.int64)
    if nplanes == 0 or npasses == 0:
        return out_mag
    stride = w + 2
    npad = (h + 2) * stride
    sig = bytearray(npad)
    sgn = bytearray(npad)
    nbr = bytearray(npad)
    visited = bytearray(npad)
    refined = bytearray(npad)
    negpad = bytearray(npad)
    zc = {"LL": _ZC_LH_F, "LH": _ZC_LH_F, "HL": _ZC_HL_F,
          "HH": _ZC_HH_F}[band]
    sc_packed = _SC_PACKED
    icx = bytearray(_N_CTX)
    mps = bytearray(_N_CTX)
    icx[_CTX_UNI] = 46
    icx[_CTX_RL] = 3
    icx[0] = 4
    qe_t, nmps_t, nlps_t, sw_t = QE, NMPS, NLPS, SWITCH

    # --- inline INITDEC (mirrors mqcoder.MQDecoder.__init__) ---
    n = len(data)
    bp = 0
    c = (data[0] if n else 0xFF) << 16
    cur = data[bp] if bp < n else 0xFF
    if cur == 0xFF:
        nxt = data[bp + 1] if bp + 1 < n else 0xFF
        if nxt > 0x8F:
            c += 0xFF00
            ct = 8
        else:
            bp += 1
            c += nxt << 9
            ct = 7
    else:
        bp += 1
        c += (data[bp] if bp < n else 0xFF) << 8
        ct = 8
    c = (c << 7) & 0xFFFFFFFF
    ct -= 7
    a = 0x8000

    def mqd(cx: int) -> int:
        """One MQ decision — locals + cells only (no method dispatch)."""
        nonlocal a, c, ct, bp
        i = icx[cx]
        qe = qe_t[i]
        a -= qe
        if ((c >> 16) & 0xFFFF) < qe:
            if a < qe:
                d = mps[cx]
                icx[cx] = nmps_t[i]
            else:
                d = mps[cx] ^ 1
                if sw_t[i]:
                    mps[cx] ^= 1
                icx[cx] = nlps_t[i]
            a = qe
        else:
            c -= qe << 16
            if a & 0x8000:
                return mps[cx]
            if a < qe:
                d = mps[cx] ^ 1
                if sw_t[i]:
                    mps[cx] ^= 1
                icx[cx] = nlps_t[i]
            else:
                d = mps[cx]
                icx[cx] = nmps_t[i]
        while True:
            if ct == 0:
                cur2 = data[bp] if bp < n else 0xFF
                if cur2 == 0xFF:
                    nxt2 = data[bp + 1] if bp + 1 < n else 0xFF
                    if nxt2 > 0x8F:
                        c += 0xFF00
                        ct = 8
                    else:
                        bp += 1
                        c += nxt2 << 9
                        ct = 7
                else:
                    bp += 1
                    c += (data[bp] if bp < n else 0xFF) << 8
                    ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        return d

    def sig_event(p: int, neg: int) -> None:
        sig[p] = 1
        sgn[p] = neg
        nbr[p - stride - 1] += 1
        nbr[p - stride] += 1
        nbr[p - stride + 1] += 1
        nbr[p - 1] += 1
        nbr[p + 1] += 1
        nbr[p + stride - 1] += 1
        nbr[p + stride] += 1
        nbr[p + stride + 1] += 1

    def sc_of(p: int) -> int:
        sl, sr = sig[p - 1], sig[p + 1]
        gl, gr = sgn[p - 1], sgn[p + 1]
        su, sd = sig[p - stride], sig[p + stride]
        gu, gd = sgn[p - stride], sgn[p + stride]
        hc = (sl & ~gl & 1) + (sr & ~gr & 1) - (sl & gl) - (sr & gr)
        vc = (su & ~gu & 1) + (sd & ~gd & 1) - (su & gu) - (sd & gd)
        if hc > 1:
            hc = 1
        elif hc < -1:
            hc = -1
        if vc > 1:
            vc = 1
        elif vc < -1:
            vc = -1
        return sc_packed[(hc + 1) * 3 + (vc + 1)]

    def harvest(bitpad, p):
        arr = np.frombuffer(bytes(bitpad), np.uint8).reshape(h + 2, stride)
        out_mag.__iadd__(arr[1:h + 1, 1:w + 1].astype(np.int64) << p)

    s2, s3 = 2 * stride, 3 * stride
    left = npasses
    p = nplanes - 1
    while left > 0 and p >= 0:
        bitpad = bytearray(npad)
        first = p == nplanes - 1
        if not first:
            # --- significance propagation pass ---
            for y0 in range(0, h, 4):
                ymax = min(y0 + 4, h)
                rowbase = (y0 + 1) * stride
                for x in range(1, w + 1):
                    q = rowbase + x
                    for _y in range(y0, ymax):
                        if not sig[q] and nbr[q]:
                            sq = (
                                (sig[q - 1] + sig[q + 1])
                                | ((sig[q - stride] + sig[q + stride]) << 2)
                                | ((sig[q - stride - 1] + sig[q - stride + 1]
                                    + sig[q + stride - 1]
                                    + sig[q + stride + 1]) << 4)
                            )
                            b = mqd(zc[sq])
                            bitpad[q] = b
                            if b:
                                cv = sc_of(q)
                                negpad[q] = mqd(cv >> 1) ^ (cv & 1)
                                sig_event(q, negpad[q])
                            visited[q] = 1
                        q += stride
            left -= 1
            if left == 0:
                harvest(bitpad, p)
                break
            # --- magnitude refinement pass ---
            for y0 in range(0, h, 4):
                ymax = min(y0 + 4, h)
                rowbase = (y0 + 1) * stride
                for x in range(1, w + 1):
                    q = rowbase + x
                    for _y in range(y0, ymax):
                        if sig[q] and not visited[q]:
                            cx = (
                                16 if refined[q]
                                else (15 if nbr[q] else 14)
                            )
                            bitpad[q] = mqd(cx)
                            refined[q] = 1
                            visited[q] = 1
                        q += stride
            left -= 1
            if left == 0:
                harvest(bitpad, p)
                break
        # --- cleanup pass with run-length mode ---
        for y0 in range(0, h, 4):
            stripe_h = min(4, h - y0)
            rowbase = (y0 + 1) * stride
            for x in range(1, w + 1):
                p0 = rowbase + x
                start = 0
                if stripe_h == 4:
                    p1, p2, p3 = p0 + stride, p0 + s2, p0 + s3
                    if not (sig[p0] | nbr[p0] | visited[p0]
                            | sig[p1] | nbr[p1] | visited[p1]
                            | sig[p2] | nbr[p2] | visited[p2]
                            | sig[p3] | nbr[p3] | visited[p3]):
                        if mqd(_CTX_RL) == 0:
                            continue
                        r = (mqd(_CTX_UNI) << 1) | mqd(_CTX_UNI)
                        pp = p0 + r * stride
                        bitpad[pp] = 1
                        cv = sc_of(pp)
                        negpad[pp] = mqd(cv >> 1) ^ (cv & 1)
                        sig_event(pp, negpad[pp])
                        start = r + 1
                q = p0 + start * stride
                for _y in range(start, stripe_h):
                    if not sig[q] and not visited[q]:
                        sq = (
                            (sig[q - 1] + sig[q + 1])
                            | ((sig[q - stride] + sig[q + stride]) << 2)
                            | ((sig[q - stride - 1] + sig[q - stride + 1]
                                + sig[q + stride - 1]
                                + sig[q + stride + 1]) << 4)
                        )
                        b = mqd(zc[sq])
                        bitpad[q] = b
                        if b:
                            cv = sc_of(q)
                            negpad[q] = mqd(cv >> 1) ^ (cv & 1)
                            sig_event(q, negpad[q])
                    q += stride
        left -= 1
        harvest(bitpad, p)
        visited = bytearray(npad)
        p -= 1
    neg = np.frombuffer(bytes(negpad), np.uint8).reshape(h + 2, stride)
    negmask = neg[1:h + 1, 1:w + 1].astype(bool)
    return np.where(negmask, -out_mag, out_mag)


def _spp(st: _BlockCoder, bitpad, negpad, put, get) -> None:
    """Significance propagation pass."""
    h, w, stride = st.h, st.w, st.stride
    sig, nbr, visited = st.sig, st.nbr, st.visited
    for y0 in range(0, h, 4):
        ymax = min(y0 + 4, h)
        rowbase = (y0 + 1) * stride
        for x in range(1, w + 1):
            p = rowbase + x
            for _y in range(y0, ymax):
                if not sig[p] and nbr[p]:
                    if put is not None:
                        b = bitpad[p]
                        put(st.zc_ctx(p), b)
                        if b:
                            cv = st.sc_ctx(p)
                            put(cv >> 1, negpad[p] ^ (cv & 1))
                            st.set_sig(p, negpad[p])
                    else:
                        b = get(st.zc_ctx(p))
                        bitpad[p] = b
                        if b:
                            cv = st.sc_ctx(p)
                            negpad[p] = get(cv >> 1) ^ (cv & 1)
                            st.set_sig(p, negpad[p])
                    visited[p] = 1
                p += stride


def _mrp(st: _BlockCoder, bitpad, put, get) -> None:
    """Magnitude refinement pass."""
    h, w, stride = st.h, st.w, st.stride
    sig, visited, refined = st.sig, st.visited, st.refined
    for y0 in range(0, h, 4):
        ymax = min(y0 + 4, h)
        rowbase = (y0 + 1) * stride
        for x in range(1, w + 1):
            p = rowbase + x
            for _y in range(y0, ymax):
                if sig[p] and not visited[p]:
                    cx = st.mr_ctx(p)
                    if put is not None:
                        put(cx, bitpad[p])
                    else:
                        bitpad[p] = get(cx)
                    refined[p] = 1
                    visited[p] = 1
                p += stride


def _cup(st: _BlockCoder, bitpad, negpad, put, get) -> None:
    """Cleanup pass with run-length mode."""
    h, w, stride = st.h, st.w, st.stride
    sig, nbr, visited = st.sig, st.nbr, st.visited
    for y0 in range(0, h, 4):
        stripe_h = min(4, h - y0)
        rowbase = (y0 + 1) * stride
        for x in range(1, w + 1):
            p0 = rowbase + x
            start = 0
            # run-length mode: full stripe, all four insignificant and
            # neighbor-free, none visited this plane
            if stripe_h == 4:
                p1, p2, p3 = p0 + stride, p0 + 2 * stride, p0 + 3 * stride
                if not (sig[p0] | nbr[p0] | visited[p0]
                        | sig[p1] | nbr[p1] | visited[p1]
                        | sig[p2] | nbr[p2] | visited[p2]
                        | sig[p3] | nbr[p3] | visited[p3]):
                    if put is not None:
                        r = -1
                        for i, pp in enumerate((p0, p1, p2, p3)):
                            if bitpad[pp]:
                                r = i
                                break
                        if r < 0:
                            put(_CTX_RL, 0)
                            continue
                        put(_CTX_RL, 1)
                        put(_CTX_UNI, (r >> 1) & 1)
                        put(_CTX_UNI, r & 1)
                        pp = p0 + r * stride
                        cv = st.sc_ctx(pp)
                        put(cv >> 1, negpad[pp] ^ (cv & 1))
                        st.set_sig(pp, negpad[pp])
                        start = r + 1
                    else:
                        if get(_CTX_RL) == 0:
                            continue
                        r = (get(_CTX_UNI) << 1) | get(_CTX_UNI)
                        pp = p0 + r * stride
                        bitpad[pp] = 1
                        cv = st.sc_ctx(pp)
                        negpad[pp] = get(cv >> 1) ^ (cv & 1)
                        st.set_sig(pp, negpad[pp])
                        start = r + 1
            p = p0 + start * stride
            for _y in range(start, stripe_h):
                if not sig[p] and not visited[p]:
                    if put is not None:
                        b = bitpad[p]
                        put(st.zc_ctx(p), b)
                        if b:
                            cv = st.sc_ctx(p)
                            put(cv >> 1, negpad[p] ^ (cv & 1))
                            st.set_sig(p, negpad[p])
                    else:
                        b = get(st.zc_ctx(p))
                        bitpad[p] = b
                        if b:
                            cv = st.sc_ctx(p)
                            negpad[p] = get(cv >> 1) ^ (cv & 1)
                            st.set_sig(p, negpad[p])
                p += stride




# --- tag trees (T.800 B.10.2) -------------------------------------------


class _TagTree:
    """2-D tag tree: per-node lower bounds refined by emitted bits.

    Shared by encoder and decoder; ``values`` are set by the encoder
    (min over subtree is computed internally), the decoder leaves them
    None and learns bounds from the bit source.
    """

    def __init__(self, w: int, h: int):
        self.dims = [(w, h)]
        while self.dims[-1] != (1, 1):
            lw, lh = self.dims[-1]
            self.dims.append(((lw + 1) // 2, (lh + 1) // 2))
        self.low = [np.zeros((lh, lw), np.int64) for lw, lh in self.dims]
        self.known = [np.zeros((lh, lw), bool) for lw, lh in self.dims]
        self.value = [None] * len(self.dims)  # encoder-side true values

    def set_values(self, leaf_values: np.ndarray) -> None:
        v = leaf_values.astype(np.int64)
        self.value = [v]
        for _ in self.dims[1:]:
            h, w = v.shape
            pw, ph = (w + 1) // 2, (h + 1) // 2
            pad = np.full((ph * 2, pw * 2), np.iinfo(np.int64).max, np.int64)
            pad[:h, :w] = v
            v = np.minimum.reduce([pad[0::2, 0::2], pad[0::2, 1::2],
                                   pad[1::2, 0::2], pad[1::2, 1::2]])
            self.value.append(v)

    def _path(self, x: int, y: int):
        out = []
        for lvl in range(len(self.dims) - 1, -1, -1):
            out.append((lvl, x >> lvl, y >> lvl))
        return out  # root .. leaf

    def encode(self, x: int, y: int, threshold: int, putbit) -> None:
        """Emit bits so a decoder at ``threshold`` resolves the leaf."""
        low = 0
        for lvl, nx, ny in self._path(x, y):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            true = int(self.value[lvl][ny, nx])
            while not self.known[lvl][ny, nx] \
                    and self.low[lvl][ny, nx] < threshold:
                if self.low[lvl][ny, nx] < true:
                    putbit(0)
                    self.low[lvl][ny, nx] += 1
                else:
                    putbit(1)
                    self.known[lvl][ny, nx] = True
            low = int(self.low[lvl][ny, nx])

    def decode(self, x: int, y: int, threshold: int, getbit):
        """Returns the leaf value if determined and < threshold,
        else None (meaning value >= threshold so far)."""
        low = 0
        for lvl, nx, ny in self._path(x, y):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            while not self.known[lvl][ny, nx] \
                    and self.low[lvl][ny, nx] < threshold:
                if getbit():
                    self.known[lvl][ny, nx] = True
                else:
                    self.low[lvl][ny, nx] += 1
            low = int(self.low[lvl][ny, nx])
            if not self.known[lvl][ny, nx]:
                return None
        return low


# --- packet-header bit I/O with 0xFF stuffing (B.10.1) ------------------


class _HeaderWriter:
    def __init__(self):
        self.out = bytearray()
        self.byte = 0
        self.nbits = 0

    def put(self, bit: int) -> None:
        self.byte = (self.byte << 1) | bit
        self.nbits += 1
        # a byte following 0xFF carries 7 bits (stuffed 0 in the MSB)
        cap = 7 if self.out and self.out[-1] == 0xFF else 8
        if self.nbits == cap:
            self.out.append(self.byte)
            self.byte = 0
            self.nbits = 0

    def put_bits(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((value >> k) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            cap = 7 if self.out and self.out[-1] == 0xFF else 8
            self.out.append(self.byte << (cap - self.nbits))
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)  # never end a header on 0xFF
        return bytes(self.out)


class _HeaderReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.byte = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            self.prev_ff = self.pos > 0 and \
                self.data[self.pos - 1] == 0xFF
            self.byte = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.prev_ff else 8
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Byte-align (consuming the stuff byte after a trailing 0xFF)
        and return the next read position."""
        self.nbits = 0
        if self.pos > 0 and self.data[self.pos - 1] == 0xFF:
            self.pos += 1  # stuffed 0x00 after 0xFF at header end
        return self.pos


def _put_npasses(w: _HeaderWriter, n: int) -> None:
    if n == 1:
        w.put(0)
    elif n == 2:
        w.put(1)
        w.put(0)
    elif n <= 5:
        w.put_bits(0b11, 2)
        w.put_bits(n - 3, 2)
    elif n <= 36:
        w.put_bits(0b1111, 4)
        w.put_bits(n - 6, 5)
    else:
        w.put_bits(0b111111111, 9)
        w.put_bits(n - 37, 7)


def _get_npasses(r: _HeaderReader) -> int:
    if not r.get():
        return 1
    if not r.get():
        return 2
    v = r.get_bits(2)
    if v < 3:
        return 3 + v
    v = r.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.get_bits(7)


# --- subband / code-block geometry --------------------------------------

_CB_EXP = 6  # 64x64 code-blocks (exponent)


def _band_dims(h: int, w: int, levels: int):
    """Per-resolution subband dims: [(('LL',h,w),)] + [(HL,LH,HH)...]."""
    dims = [(h, w)]
    for _ in range(levels):
        hh, ww = dims[-1]
        dims.append(((hh + 1) // 2, (ww + 1) // 2))
    out = [[("LL", dims[levels][0], dims[levels][1])]]
    for lev in range(levels, 0, -1):
        ph, pw = dims[lev - 1]
        out.append([
            ("HL", (ph + 1) // 2, pw // 2),
            ("LH", ph // 2, (pw + 1) // 2),
            ("HH", ph // 2, pw // 2),
        ])
    return out


def _blocks_of(bh: int, bw: int):
    """Code-block pixel rects of a subband, raster order."""
    size = 1 << _CB_EXP
    out = []
    for y0 in range(0, max(bh, 1), size):
        for x0 in range(0, max(bw, 1), size):
            if bh == 0 or bw == 0:
                continue
            out.append((y0, x0, min(size, bh - y0), min(size, bw - x0)))
    return out


_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


# --- codestream encode ---------------------------------------------------


def _encode_component(
    bands, h: int, w: int, levels: int, mb_of
) -> bytes:
    """One component's int64 subbands -> concatenated packets (LRCP,
    single layer). ``mb_of(r, bname)`` gives the per-subband Mb —
    constant for the reversible profile, epsilon-derived per band for
    scalar-quantized lossy streams."""
    res_bands = _band_dims(h, w, levels)
    out = bytearray()
    for r, banddefs in enumerate(res_bands):
        arrays = [bands[0]] if r == 0 else list(bands[r])
        # code every block first: an all-zero block is signaled as
        # "not included" through the inclusion tag tree
        per_band = []
        any_included = False
        for (bname, bh, bw), arr in zip(banddefs, arrays):
            blocks = _blocks_of(bh, bw)
            coded = [encode_block(
                np.asarray(arr)[y0:y0 + ch, x0:x0 + cw], bname
            ) for (y0, x0, ch, cw) in blocks]
            per_band.append((bname, bh, bw, blocks, coded))
            any_included |= any(c[1] > 0 for c in coded)
        hdr = _HeaderWriter()
        bodies = []
        hdr.put(1 if any_included else 0)
        if any_included:
            for bname, bh, bw, blocks, coded in per_band:
                if not blocks:
                    continue
                mb = mb_of(r, bname)
                ncx = (bw + (1 << _CB_EXP) - 1) >> _CB_EXP
                ncy = (bh + (1 << _CB_EXP) - 1) >> _CB_EXP
                incl = _TagTree(ncx, ncy)
                zbp = _TagTree(ncx, ncy)
                incl.set_values(np.array(
                    [[0 if coded[cy * ncx + cx][1] > 0 else 1
                      for cx in range(ncx)] for cy in range(ncy)],
                    np.int64))
                zbp.set_values(np.array(
                    [[max(mb - coded[cy * ncx + cx][1], 0)
                      for cx in range(ncx)] for cy in range(ncy)],
                    np.int64))
                for i in range(len(blocks)):
                    cy, cx = i // ncx, i % ncx
                    data, nplanes, npasses = coded[i]
                    incl.encode(cx, cy, 1, hdr.put)
                    if nplanes == 0:
                        continue  # not included: nothing else signaled
                    missing = mb - nplanes
                    if missing < 0:
                        raise ValueError(
                            f"subband needs {nplanes} bit-planes > Mb={mb}"
                        )
                    zbp.encode(cx, cy, missing + 1, hdr.put)
                    _put_npasses(hdr, npasses)
                    lblock = 3
                    nlen = len(data)
                    passbits = npasses.bit_length() - 1
                    while lblock + passbits < nlen.bit_length():
                        hdr.put(1)
                        lblock += 1
                    hdr.put(0)
                    hdr.put_bits(nlen, lblock + passbits)
                    bodies.append(data)
        out += hdr.flush()
        for b in bodies:
            out += b
    return bytes(out)


def _decode_component(stream: bytes, pos: int, h: int, w: int,
                      levels: int, mb_of):
    """Inverse of _encode_component; returns (bands, new_pos)."""
    res_bands = _band_dims(h, w, levels)
    bands: list = []
    for r, banddefs in enumerate(res_bands):
        arrays = [np.zeros((bh, bw), np.int64) for _, bh, bw in banddefs]
        rd = _HeaderReader(stream, pos)
        pending = []
        if rd.get():
            for (bname, bh, bw), arr in zip(banddefs, arrays):
                blocks = _blocks_of(bh, bw)
                if not blocks:
                    continue
                mb = mb_of(r, bname)
                ncx = (bw + (1 << _CB_EXP) - 1) >> _CB_EXP
                ncy = (bh + (1 << _CB_EXP) - 1) >> _CB_EXP
                incl = _TagTree(ncx, ncy)
                zbp = _TagTree(ncx, ncy)
                for i, (y0, x0, ch, cw) in enumerate(blocks):
                    cy, cx = i // ncx, i % ncx
                    if incl.decode(cx, cy, 1, rd.get) is None:
                        continue  # not included -> stays zero
                    k = 1
                    while True:
                        missing = zbp.decode(cx, cy, k, rd.get)
                        if missing is not None:
                            break
                        k += 1
                    nplanes = mb - missing
                    npasses = _get_npasses(rd)
                    lblock = 3
                    while rd.get():
                        lblock += 1
                    nlen = rd.get_bits(lblock + npasses.bit_length() - 1)
                    pending.append((arr, bname, y0, x0, ch, cw,
                                    nplanes, npasses, nlen))
        pos = rd.align()
        for arr, bname, y0, x0, ch, cw, nplanes, npasses, nlen in pending:
            cb = decode_block(stream[pos:pos + nlen], ch, cw, bname,
                              nplanes, npasses)
            arr[y0:y0 + ch, x0:x0 + cw] = cb
            pos += nlen
        bands.append(arrays[0] if r == 0 else tuple(arrays))
    return bands, pos


# --- reversible component transform (G.2) --------------------------------


def _rct_forward(rgb: np.ndarray):
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    y = (r + 2 * g + b) >> 2
    return y, b - g, r - g


def _rct_inverse(y, cb, cr) -> np.ndarray:
    g = y - ((cb + cr) >> 2)
    r = cr + g
    b = cb + g
    return np.stack([r, g, b], axis=-1)


def _ict_forward(rgb: np.ndarray):
    """Irreversible component transform (G.3) — float YCbCr."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.16875 * r - 0.33126 * g + 0.5 * b
    cr = 0.5 * r - 0.41869 * g - 0.08131 * b
    return y, cb, cr


def _ict_inverse(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# --- scalar quantization (E.4 / E.5, lossy profile) ------------------------


def _delta_of(eps: int, mu: int, rb: int) -> float:
    """Quantizer step: 2^(R_b - eps) * (1 + mu / 2^11)."""
    return (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)


def _quantize_band(arr: np.ndarray, delta: float) -> np.ndarray:
    """Deadzone quantizer: q = sign(c) * floor(|c| / delta)."""
    return (np.sign(arr) * np.floor(np.abs(arr) / delta)).astype(np.int64)


def _dequantize_band(q: np.ndarray, delta: float) -> np.ndarray:
    """Mid-point reconstruction (r = 0.5) of nonzero coefficients."""
    return np.where(q == 0, 0.0, np.sign(q) * (np.abs(q) + 0.5) * delta)


# --- codestream (Annex A) -------------------------------------------------

_SOC, _SIZ, _COD, _QCD, _SOT, _SOD, _EOC = (
    0xFF4F, 0xFF51, 0xFF52, 0xFF5C, 0xFF90, 0xFF93, 0xFFD9)
_GUARD = 2
_PROG_CPRL = 4


def encode_jpx(
    img: np.ndarray,
    levels: int | None = None,
    lossy: bool = False,
    precision: int = 2,
    qcd_style: str = "expounded",
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8/uint16 -> raw JPEG 2000
    codestream (single tile + layer). Default is the lossless profile
    (5/3 reversible DWT, RCT for RGB); ``lossy=True`` emits the lossy
    delivery profile — 9/7 irreversible DWT, ICT, scalar quantization
    with LL step 2^-precision (bigger ``precision`` = finer steps =
    closer round-trip). ``qcd_style``: 'expounded' (per-band pairs,
    every band at step 2^-precision) or 'derived' (one base pair,
    steps doubling per finer decomposition level per E.5)."""
    if img.ndim == 2:
        comps = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        comps = 3
    else:
        raise ValueError("encode_jpx expects (H,W) gray or (H,W,3) RGB")
    h, w = img.shape[:2]
    depth = 16 if img.dtype == np.uint16 else 8
    if levels is None:
        levels = max(0, min(5, min(h, w).bit_length() - 1))
    shift = 1 << (depth - 1)
    mct = 0 if comps == 1 else 1
    if lossy:
        if comps == 1:
            planes = [img.astype(np.float64) - shift]
        else:
            planes = list(_ict_forward(img.astype(np.float64) - shift))
        if qcd_style == "expounded":
            # eps_b = R_b + precision, mu = 0 -> delta_b =
            # 2^-precision for every band
            def eps_of(r, bname):
                return depth + mct + _BAND_GAIN[bname] + precision
        elif qcd_style == "derived":
            # E.5: eps_b = eps_0 - NL + n_b (steps double per finer
            # decomposition level); eps_0 puts the LL at 2^-precision
            def eps_of(r, bname):
                base = depth + mct + precision
                return base if r == 0 else base - r + 1
        else:
            raise ValueError("qcd_style must be 'expounded' or 'derived'")

        def mb_of(r, bname):
            return eps_of(r, bname) + _GUARD - 1

        def step_of(r, bname):
            rb = depth + mct + _BAND_GAIN[bname]
            return _delta_of(eps_of(r, bname), 0, rb)

        body = bytearray()
        for plane in planes:
            fb = dwt97_forward(plane, levels)
            qb = [_quantize_band(fb[0], step_of(0, "LL"))]
            for r in range(1, len(fb)):
                qb.append(
                    tuple(
                        _quantize_band(b, step_of(r, n))
                        for b, n in zip(fb[r], ("HL", "LH", "HH"))
                    )
                )
            body += _encode_component(qb, h, w, levels, mb_of)
    else:
        if comps == 1:
            planes = [img.astype(np.int64) - shift]
        else:
            y, cb, cr = _rct_forward(img.astype(np.int64) - shift)
            planes = [y, cb, cr]
        eps = depth + mct  # worst-case component range (chroma +1 bit)
        body = bytearray()
        for plane in planes:
            # Mb identical for every subband here: gains absorbed by
            # the guard bits
            bands = dwt53_forward(plane, levels)
            body += _encode_component(
                bands, h, w, levels, lambda r, b: eps + _GUARD - 1
            )
    out = bytearray()
    out += struct.pack(">H", _SOC)
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, comps)
    for _ in range(comps):
        siz += struct.pack(">BBB", depth - 1, 1, 1)
    out += struct.pack(">HH", _SIZ, len(siz) + 2) + siz
    spcod = struct.pack(
        ">BBBBB", levels, _CB_EXP - 2, _CB_EXP - 2, 0, 0 if lossy else 1
    )
    cod = struct.pack(">BBHB", 0, _PROG_CPRL, 1, mct) + spcod
    out += struct.pack(">HH", _COD, len(cod) + 2) + cod
    nsub = 3 * levels + 1
    if lossy and qcd_style == "derived":
        qcd = struct.pack(">B", (_GUARD << 5) | 1)  # scalar derived
        qcd += struct.pack(">H", ((depth + mct + precision) << 11) | 0)
    elif lossy:
        qcd = struct.pack(">B", (_GUARD << 5) | 2)  # scalar expounded
        for i in range(nsub):
            bname = "LL" if i == 0 else ("HL", "LH", "HH")[(i - 1) % 3]
            e = depth + mct + _BAND_GAIN[bname] + precision
            qcd += struct.pack(">H", (e << 11) | 0)
    else:
        qcd = struct.pack(">B", (_GUARD << 5) | 0)
        for i in range(nsub):
            gain = 0 if i == 0 else _BAND_GAIN[("HL", "LH", "HH")[(i - 1) % 3]]
            qcd += struct.pack(">B", min(depth + mct + gain, 31) << 3)
    out += struct.pack(">HH", _QCD, len(qcd) + 2) + qcd
    psot = 12 + 2 + len(body) + 2  # SOT..EOC inclusive minus EOC? see below
    # Psot = length from the first byte of SOT to the end of the tile
    # part data (EOC excluded)
    psot = 12 + 2 + len(body)
    out += struct.pack(">HHHIBB", _SOT, 10, 0, psot, 0, 1)
    out += struct.pack(">H", _SOD)
    out += body
    out += struct.pack(">H", _EOC)
    return bytes(out)


def decode_jpx(data: bytes) -> np.ndarray:
    """JPEG 2000 codestream or JP2 file -> (H, W) or (H, W, 3) array."""
    if data[:2] != b"\xff\x4f":
        data = _jp2_codestream(data)
    pos = 2  # past SOC
    w = h = comps = depth = levels = mct = None
    transform = 1
    qcd_payload = None
    while pos + 4 <= len(data):
        (marker, length) = struct.unpack_from(">HH", data, pos)
        if marker == _SIZ:
            (_, w, h, x0, y0, tw, th, tx0, ty0, comps) = struct.unpack_from(
                ">HIIIIIIIIH", data, pos + 4)
            if x0 or y0 or tx0 or ty0 or tw != w or th != h:
                raise NotImplementedError("JPX multi-tile / offset grid")
            ss = data[pos + 4 + 36]
            if ss & 0x80:
                raise NotImplementedError("JPX signed source components")
            depth = (ss & 0x7F) + 1
            if data[pos + 4 + 37] != 1 or data[pos + 4 + 38] != 1:
                raise NotImplementedError("JPX subsampled components")
        elif marker == _COD:
            scod = data[pos + 4]
            if scod & 0x01:
                raise NotImplementedError("JPX custom precinct sizes")
            if scod & 0x06:
                raise NotImplementedError("JPX SOP/EPH markers")
            prog, nlayers = data[pos + 5], struct.unpack_from(
                ">H", data, pos + 6)[0]
            if nlayers != 1:
                raise NotImplementedError("JPX multiple quality layers")
            if prog != _PROG_CPRL:
                raise NotImplementedError(f"JPX progression order {prog}")
            mct = data[pos + 8]
            levels = data[pos + 9]
            if data[pos + 10] != _CB_EXP - 2 or data[pos + 11] != _CB_EXP - 2:
                raise NotImplementedError("JPX non-64x64 code-blocks")
            if data[pos + 12] != 0:
                raise NotImplementedError("JPX code-block style flags")
            transform = data[pos + 13]  # 1 = 5/3 reversible, 0 = 9/7
        elif marker == _QCD:
            qcd_payload = data[pos + 4 : pos + 2 + length]
        elif marker == _SOT:
            # tile part: data follows SOD until EOC
            if qcd_payload is None:
                raise ValueError("JPX: missing QCD marker")
            guard = qcd_payload[0] >> 5
            qstyle = qcd_payload[0] & 0x1F
            if qstyle == 0:  # no quantization (reversible)
                eps0 = qcd_payload[1] >> 3
                mbv = eps0 + guard - 1

                def mb_of(r, bname):
                    return mbv

                deltas = None
            elif qstyle == 1:  # scalar derived (lossy, one base pair)
                v0 = struct.unpack_from(">H", qcd_payload, 1)[0]
                eps0, mu0 = v0 >> 11, v0 & 0x7FF

                def _eps_derived(r):
                    # E.5: eps_b = eps_0 - NL + n_b; n_b = NL for the
                    # LL band, NL - r + 1 for resolution r >= 1
                    return eps0 if r == 0 else eps0 - r + 1

                def mb_of(r, bname):
                    return _eps_derived(r) + guard - 1

                def deltas(r, bname):
                    rb = depth + mct + _BAND_GAIN[bname]
                    return _delta_of(_eps_derived(r), mu0, rb)

            elif qstyle == 2:  # scalar expounded (lossy)
                vals = [
                    struct.unpack_from(">H", qcd_payload, 1 + 2 * i)[0]
                    for i in range((len(qcd_payload) - 1) // 2)
                ]

                def _band_index(r, bname):
                    return 0 if r == 0 else 1 + 3 * (r - 1) + (
                        "HL", "LH", "HH"
                    ).index(bname)

                def mb_of(r, bname):
                    return (vals[_band_index(r, bname)] >> 11) + guard - 1

                def deltas(r, bname):
                    v = vals[_band_index(r, bname)]
                    rb = depth + mct + _BAND_GAIN[bname]
                    return _delta_of(v >> 11, v & 0x7FF, rb)

            else:
                raise NotImplementedError(f"JPX quantization style {qstyle}")
            sod_at = pos + 12
            if struct.unpack_from(">H", data, sod_at)[0] != _SOD:
                raise ValueError("JPX: SOD not found after SOT")
            body_pos = sod_at + 2
            planes = []
            for _ in range(comps):
                bands, body_pos = _decode_component(
                    data, body_pos, h, w, levels, mb_of)
                if transform == 1:  # 5/3 reversible, integer path
                    planes.append(dwt53_inverse(bands, (h, w)))
                else:  # 9/7: dequantize, float inverse
                    if deltas is None:
                        raise NotImplementedError(
                            "JPX 9/7 wavelet without quantization values"
                        )
                    fb = [_dequantize_band(bands[0], deltas(0, "LL"))]
                    for r in range(1, len(bands)):
                        fb.append(
                            tuple(
                                _dequantize_band(b, deltas(r, n))
                                for b, n in zip(
                                    bands[r], ("HL", "LH", "HH")
                                )
                            )
                        )
                    planes.append(dwt97_inverse(fb, (h, w)))
            shiftv = 1 << (depth - 1)
            if comps == 1:
                out = planes[0] + shiftv
            elif mct and transform == 1:
                out = _rct_inverse(*planes) + shiftv
            elif mct:
                out = _ict_inverse(*planes) + shiftv
            else:
                out = np.stack(planes, axis=-1) + shiftv
            dtype = np.uint16 if depth > 8 else np.uint8
            if transform == 0:
                out = np.rint(out)
            return np.clip(out, 0, (1 << depth) - 1).astype(dtype)
        elif marker == _EOC:
            break
        if marker in (_SOC, _EOC):
            pos += 2
        else:
            pos += 2 + length
    raise ValueError("JPX: no tile found in codestream")


# --- JP2 container (T.800 Annex I) ----------------------------------------

_JP2_SIG = bytes.fromhex("0000000C6A5020200D0A870A")


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_jp2(
    img: np.ndarray,
    levels: int | None = None,
    lossy: bool = False,
    precision: int = 2,
) -> bytes:
    """Image -> JP2 file (signature/ftyp/jp2h boxes + codestream)."""
    comps = 1 if img.ndim == 2 else img.shape[2]
    depth = 16 if img.dtype == np.uint16 else 8
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIHBBBB", h, w, comps, depth - 1, 7, 0, 0)
    colr = struct.pack(">BBBI", 1, 0, 0, 17 if comps == 1 else 16)
    jp2h = _box(b"ihdr", ihdr) + _box(b"colr", colr)
    return (_JP2_SIG
            + _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
            + _box(b"jp2h", jp2h)
            + _box(b"jp2c", encode_jpx(img, levels, lossy, precision)))


def _jp2_codestream(data: bytes) -> bytes:
    """Walk JP2 boxes to the contiguous codestream box."""
    if data[:12] != _JP2_SIG:
        raise ValueError("not a JPEG 2000 codestream or JP2 file")
    pos = 12
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        if length == 1:  # extended 64-bit length
            (xlen,) = struct.unpack_from(">Q", data, pos + 8)
            payload = data[pos + 16:pos + xlen]
            nxt = pos + xlen
        elif length == 0:
            payload = data[pos + 8:]
            nxt = len(data)
        else:
            payload = data[pos + 8:pos + length]
            nxt = pos + length
        if btype == b"jp2c":
            return payload
        pos = nxt
    raise ValueError("JP2: no codestream box")
