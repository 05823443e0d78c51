"""FLAC audio codec — pure stdlib + numpy decoder and encoder.

Closes the last honestly-stubbed multimodal branch with a REAL
compressed-audio codec: FLAC is lossless, so unlike mp3/aac the full
encode -> Arrow binary column -> decode chain can be oracled
sample-exactly by SQL (the same ``generate_series`` pattern as the WAV
oracle in ``__ray_entry__.q_audio_decode``).

Reference semantics: the public FLAC format spec (RFC 9639 /
xiph.org/flac/format.html). The reference repo (mindee/doctr) has no
audio surface — this module serves the north brief's multimodal
training-data operators (``functions/multimodal.decode_audio_real``).

Decoder coverage:
- ``fLaC`` marker + metadata blocks (STREAMINFO parsed; others skipped
  by length, last-block flag honored);
- frame headers: both blocking strategies, all block-size and
  sample-rate codes (incl. end-of-header 8/16-bit forms), UTF-8-coded
  frame/sample number, CRC-8 verified;
- channel assignments: independent (any count), left/side,
  right/side, mid/side;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficient precision + shift), wasted bits;
- residuals: Rice partition methods 0 (4-bit) and 1 (5-bit) with any
  partition order, including the escape-to-verbatim code;
- frame CRC-16 verified.

Encoder (fixture-grade but spec-valid, producing REAL compression):
16-bit mono/stereo, fixed block size, per-subframe choice of
CONSTANT / FIXED order 0-2 / a verbatim fallback, single-partition
Rice residuals with a per-subframe parameter estimate, correct CRC-8 /
CRC-16 and STREAMINFO (MD5 of the raw samples included). Sawtooth-ish
fixture waveforms compress ~2-4x, so the decoder's Rice/fixed paths
are exercised by every round-trip, not just the verbatim path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------- CRC

def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, np.uint32)
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if (crc & top) else (crc << 1)
        table[byte] = crc & mask
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (int(_CRC16_TABLE[(crc >> 8) ^ b]) ^ ((crc << 8) & 0xFFFF))
    return crc


# ---------------------------------------------------------- bit reader


class _BitReader:
    """MSB-first bit reader over a byte buffer, with a precomputed
    set-bit position index so unary (Rice quotient) runs read in
    O(log n) via searchsorted instead of bit-at-a-time."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.nonzero(self.bits)[0]
        # popcount prefix: ones inside any window in O(1), so the Rice
        # loop advances through `ones` without re-searching
        self.cum = np.concatenate(
            [[0], np.cumsum(self.bits, dtype=np.int64)]
        )
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("FLAC bitstream truncated")
        chunk = self.bits[self.pos : end]
        self.pos = end
        val = 0
        for b in chunk.tolist():
            val = (val << 1) | b
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            raise ValueError("FLAC bitstream truncated in unary run")
        stop = int(self.ones[i])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3

    def read_rice_block(self, param: int, n: int) -> np.ndarray:
        """n Rice(param) codes -> signed int64 residuals (zig-zag).

        The quotient stop bits are walked through the precomputed
        set-bit index (each step advances past the ones inside the
        remainder window via the popcount prefix — no per-bit work in
        the loop); the fixed-width remainders are then gathered and
        packed in one vectorized pass."""
        bits, ones, cum = self.bits, self.ones, self.cum
        pos = self.pos
        n_ones = len(ones)
        stops = np.empty(n, np.int64)
        starts = np.empty(n, np.int64)
        j = int(np.searchsorted(ones, pos))
        for i in range(n):
            if j >= n_ones:
                raise ValueError("FLAC bitstream truncated in Rice run")
            stop = int(ones[j])
            stops[i] = stop
            starts[i] = pos
            pos = stop + 1 + param
            if pos > len(bits):
                raise ValueError("FLAC bitstream truncated")
            j += 1 + (int(cum[pos] - cum[stop + 1]) if param else 0)
        self.pos = pos
        u = stops - starts  # unary quotients
        if param:
            idx = stops[:, None] + np.arange(1, param + 1)
            rem = bits[idx].astype(np.int64) @ (
                1 << np.arange(param - 1, -1, -1, dtype=np.int64)
            )
            u = (u << param) | rem
        return (u >> 1) ^ -(u & 1)  # zig-zag to signed


# ------------------------------------------------------------- decode

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0:
        raise ValueError("invalid FLAC UTF-8 coded number")
    val = first & (mask - 1)
    for _ in range(n_extra):
        byte = br.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation byte")
        val = (val << 6) | (byte & 0x3F)
    return val


def _decode_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("invalid subframe sync bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits flag: unary count-1
        wasted = br.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(n)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = _predict(warm, _FIXED_COEFFS[order], 0, resid, n)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision escape")
        shift = br.read_signed(5)
        coeffs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = _predict(warm, coeffs, shift, resid, n)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def _predict(warm, coeffs, shift, resid, n) -> np.ndarray:
    out = np.empty(n, np.int64)
    order = len(warm)
    out[:order] = warm
    if order == 0:
        out[:] = resid
        return out
    # FIXED predictors are low-order polynomial extrapolations: the
    # recurrence is sequential (each sample feeds the next) but order
    # <= 32 keeps the inner dot product tiny.
    o = out
    for i in range(order, n):
        acc = 0
        for j, c in enumerate(coeffs):
            acc += c * int(o[i - 1 - j])
        o[i] = resid[i - order] + (acc >> shift)
    return out


def _decode_residual(br: _BitReader, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if n % n_part:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(n - order, np.int64)
    at = 0
    for p in range(n_part):
        count = (n >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            vals = np.array(
                [br.read_signed(raw_bits) if raw_bits else 0 for _ in range(count)],
                np.int64,
            )
            out[at : at + count] = vals
        else:
            out[at : at + count] = br.read_rice_block(param, count)
        at += count
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n_frames, channels) int16 samples, sample_rate).

    Verifies every frame's CRC-8 (header) and CRC-16 (frame); raises
    ``ValueError`` on any structural corruption (never hangs — the
    truncation-robustness suite covers this codec too). Sample sizes
    over 16 bits return the top 16 (matching decode_wav's contract).
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        header = struct.unpack_from(">I", data, pos)[0]
        last = header >> 31
        btype = (header >> 24) & 0x7F
        length = header & 0xFFFFFF
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("truncated STREAMINFO")
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = (
                ((body[13] & 0x0F) << 32)
                | (body[14] << 24) | (body[15] << 16)
                | (body[16] << 8) | body[17]
            )
            info = (sr, channels, bps, total)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    stream_rate, stream_channels, stream_bps, total = info

    frames = []
    while pos < len(data):
        chans, rate = _decode_frame(data, pos, stream_bps)
        pos = rate[1]
        frames.append(chans)
    if not frames:
        samples = np.zeros((0, stream_channels), np.int16)
        return samples, stream_rate
    out = np.concatenate(frames, axis=0)
    if total:
        out = out[:total]
    if stream_bps > 16:
        out = out >> (stream_bps - 16)
    elif stream_bps < 16:
        out = out << (16 - stream_bps)
    return out.astype(np.int16), stream_rate


def _decode_frame(data: bytes, pos: int, stream_bps: int):
    br = _BitReader(data[pos:])
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("bad FLAC frame sync")
    if br.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan_code = br.read(4)
    size_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    _read_utf8_number(br)
    if bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    elif bs_code in _BLOCK_SIZE_CODES:
        block_size = _BLOCK_SIZE_CODES[bs_code]
    else:
        raise ValueError(f"reserved FLAC block size code {bs_code}")
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise ValueError("invalid FLAC sample rate code")
    bps = _SAMPLE_SIZE_CODES.get(size_code, stream_bps)
    header_crc = crc8(data[pos : pos + br.byte_pos()])
    if br.read(8) != header_crc:
        raise ValueError("FLAC frame header CRC-8 mismatch")

    if chan_code < 8:
        n_ch = chan_code + 1
        chans = [_decode_subframe(br, block_size, bps) for _ in range(n_ch)]
    elif chan_code == 8:  # left/side
        left = _decode_subframe(br, block_size, bps)
        side = _decode_subframe(br, block_size, bps + 1)
        chans = [left, left - side]
    elif chan_code == 9:  # right/side
        side = _decode_subframe(br, block_size, bps + 1)
        right = _decode_subframe(br, block_size, bps)
        chans = [right + side, right]
    elif chan_code == 10:  # mid/side
        mid = _decode_subframe(br, block_size, bps)
        side = _decode_subframe(br, block_size, bps + 1)
        left = ((mid << 1) | (side & 1)) + side
        chans = [left >> 1, (left - (side << 1)) >> 1]
        chans = [chans[0], chans[1]]
    else:
        raise ValueError(f"reserved FLAC channel assignment {chan_code}")
    br.align_byte()
    frame_crc = crc16(data[pos : pos + br.byte_pos()])
    stored = br.read(16)
    if stored != frame_crc:
        raise ValueError("FLAC frame CRC-16 mismatch")
    end = pos + br.byte_pos()
    return np.stack(chans, axis=1), (block_size, end)


# ------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bit_array(self, bits: np.ndarray) -> None:
        """Append a uint8 0/1 array in one vectorized pass (packbits on
        the byte-aligned body; only the <8-bit tail stays scalar)."""
        if self.nbits:
            pend = np.array(
                [(self.acc >> (self.nbits - 1 - i)) & 1
                 for i in range(self.nbits)],
                np.uint8,
            )
            bits = np.concatenate([pend, bits])
            self.acc = 0
            self.nbits = 0
        n_full = (len(bits) // 8) * 8
        if n_full:
            self.buf += np.packbits(bits[:n_full]).tobytes()
        for b in bits[n_full:].tolist():
            self.acc = (self.acc << 1) | int(b)
            self.nbits += 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(val: int) -> bytes:
    if val < 0x80:
        return bytes([val])
    out = []
    n_extra = 1
    while val >= (1 << (6 + 5 * n_extra - (n_extra - 1))):
        # max payload bits for n_extra continuation bytes: 6*n_extra + (6-n_extra)
        if val < (1 << (6 * n_extra + (6 - n_extra))):
            break
        n_extra += 1
    while (6 * n_extra + (6 - n_extra)) < val.bit_length():
        n_extra += 1
    lead_bits = 6 - n_extra
    lead = (0xFF << (lead_bits + 1)) & 0xFF
    out.append(lead | (val >> (6 * n_extra)) & ((1 << lead_bits) - 1))
    for i in range(n_extra - 1, -1, -1):
        out.append(0x80 | ((val >> (6 * i)) & 0x3F))
    return bytes(out)


def _best_fixed_order(x: np.ndarray) -> tuple[int, np.ndarray]:
    best_order, best_resid, best_cost = 0, x, np.abs(x).sum()
    d = x
    for order in (1, 2):
        d = np.diff(d)
        cost = np.abs(d).sum()
        if len(d) and cost < best_cost:
            best_order, best_resid, best_cost = order, d, cost
    return best_order, best_resid


def _rice_param(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = max(1.0, float(np.abs(resid).mean()))
    param = max(0, int(np.ceil(np.log2(mean))))
    return min(param, 14)


def _write_residual(
    bw: _BitWriter, resid: np.ndarray, n: int, order: int,
    porder: int, method: int,
) -> None:
    pbits = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(porder, 4)
    n_part = 1 << porder
    at = 0
    for p in range(n_part):
        count = (n >> porder) - (order if p == 0 else 0)
        part = resid[at : at + count]
        param = min(_rice_param(part), (1 << pbits) - 2)
        bw.write(param, pbits)
        # vectorized Rice emission: unary stop bits + msb-first
        # remainders scattered into one 0/1 array
        u = (part << 1) ^ (part >> 63)  # zig-zag
        q = u >> param
        lengths = q + 1 + param
        ends = np.cumsum(lengths)
        starts = ends - lengths
        bits = np.zeros(int(ends[-1]) if count else 0, np.uint8)
        bits[starts + q] = 1
        for k in range(param):
            mask = ((u >> (param - 1 - k)) & 1).astype(bool)
            bits[(starts + q + 1 + k)[mask]] = 1
        bw.write_bit_array(bits)
        at += count


def _encode_subframe(
    bw: _BitWriter, x: np.ndarray, bps: int,
    lpc: bool = False, porder: int = 0, method: int = 0,
) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]) and not lpc:
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    if lpc and n > 8 and (n >> porder) > 2:
        # order-2 LPC with fixed quantized coefficients (~1.9, -0.9):
        # any coefficient set is lossless (residual = x - prediction),
        # so this exercises the decoder's LPC path for real.
        order, precision, shift = 2, 12, 10
        coeffs = [1946, -922]
        pred = (coeffs[0] * x[1:-1] + coeffs[1] * x[:-2]) >> shift
        resid = x[2:] - pred
        bw.write(0, 1)
        bw.write(31 + order, 6)  # LPC
        bw.write(0, 1)
        for v in x[:order].tolist():
            bw.write(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coeffs:
            bw.write(c, precision)
        _write_residual(bw, resid, n, order, porder, method)
        return
    order, resid = _best_fixed_order(x)
    if (n >> porder) <= order:
        order, resid, porder = 0, x, 0
    param = _rice_param(resid)
    rice_bits = int(
        n - order + (np.abs(resid).astype(np.int64) >> max(param - 1, 0)).sum()
        + param * (n - order)
    )
    if rice_bits > n * bps:  # verbatim cheaper (incompressible block)
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for v in x[:order].tolist():
        bw.write(int(v), bps)
    _write_residual(bw, resid, n, order, porder, method)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    block_size: int = 1024,
    stereo: str = "independent",
    lpc: bool = False,
    partition_order: int = 0,
    method: int = 0,
) -> bytes:
    """(n,) or (n, channels) int16 -> FLAC bytes.

    Defaults produce independent channels with CONSTANT / FIXED
    order-0..2 / VERBATIM subframes and single-partition 4-bit Rice
    residuals. The knobs exist so round-trip tests exercise every
    decoder path with REAL streams: ``stereo`` in {"independent",
    "left_side", "right_side", "mid_side"} (2-channel input only),
    ``lpc=True`` emits order-2 LPC subframes with quantized
    coefficients, ``partition_order`` > 0 partitions the Rice
    residuals, ``method=1`` uses 5-bit Rice parameters."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    n, channels = samples.shape
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # sample_rate(20) | channels-1(3) | bps-1(5) | total_samples top 4
    streaminfo += struct.pack(
        ">I",
        (rate << 12) | ((channels - 1) << 9) | ((16 - 1) << 4) | (n >> 32),
    )
    streaminfo += struct.pack(">I", n & 0xFFFFFFFF)
    streaminfo += md5
    header = b"fLaC" + struct.pack(">I", (1 << 31) | len(streaminfo)) + bytes(
        streaminfo
    )

    out = bytearray(header)
    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        block = samples[start : start + block_size]
        if len(block) == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block size strategy
        bs = len(block)
        bs_code = {192: 1, 576: 2, 1152: 3, 256: 8, 512: 9, 1024: 10,
                   2048: 11, 4096: 12}.get(bs)
        if bs_code is None:
            bs_code = 7  # 16-bit at end of header
        bw.write(bs_code, 4)
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(rate, 0)
        bw.write(sr_code, 4)  # code 0 = rate from STREAMINFO
        decorrelate = stereo != "independent" and channels == 2
        chan_code = (
            {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
            if decorrelate
            else channels - 1
        )
        bw.write(chan_code, 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        for b in _utf8_number(frame_idx):
            bw.write(b, 8)
        if bs_code == 7:
            bw.write(bs - 1, 16)
        bw.align()
        head = bytes(bw.buf)
        out_frame = bytearray(head)
        out_frame.append(crc8(head))
        bw2 = _BitWriter()
        porder = partition_order if bs % (1 << partition_order) == 0 else 0
        if decorrelate:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = left - right
            if stereo == "left_side":
                subs = [(left, 16), (side, 17)]
            elif stereo == "right_side":
                subs = [(side, 17), (right, 16)]
            else:
                subs = [((left + right) >> 1, 16), (side, 17)]
            for x, bps in subs:
                _encode_subframe(bw2, x, bps, lpc, porder, method)
        else:
            for c in range(channels):
                _encode_subframe(bw2, block[:, c], 16, lpc, porder, method)
        bw2.align()
        out_frame += bw2.bytes()
        out_frame += struct.pack(">H", crc16(bytes(out_frame)))
        out += out_frame
        frame_idx += 1
    return bytes(out)
