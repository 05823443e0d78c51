"""GIF87a/89a decoder (+ a fixture encoder) — pure stdlib + numpy.

The reference reads GIFs through cv2 (reference io/image/base.py:16-54
``read_img_as_numpy`` accepts anything cv2 decodes); here the format
decodes for real: logical screen descriptor, global/local color
tables, LSB-first variable-width LZW (the GIF variant — the TIFF
variant in imagecodec.py packs MSB-first and changes width one code
early), 4-pass interlacing, and — via ``decode_gif`` — the FIRST
frame of animations (the still-image contract a document pipeline
needs). ``decode_gif_frames`` additionally decodes FULL animations
with the GIF89a compositing model (graphic control extensions,
disposal methods 0-3, transparency, sub-rectangle frames) — the real
video-frame source behind functions/multimodal.FrameSampler.

``encode_gif`` exists to generate test fixtures: it emits literal
pixel codes while tracking the decoder's table growth exactly (code
width must widen in lockstep with the table the decoder builds), with
a safety re-CLEAR before the 12-bit ceiling — valid, if uncompressed,
GIF streams.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def _gif_lzw_decode(src: bytes, min_code: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR = 2^min_code,
    END = CLEAR+1, width grows when the table FILLS 2^width (one code
    later than TIFF's early change), 12-bit ceiling with deferred-clear
    tolerated (table simply stops growing)."""
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(base)
    width = min_code + 1
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(src) * 8
    while bitpos + width <= total_bits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(src[byte0 : byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("truncated GIF LZW stream")
    return bytes(out[:n_pixels])


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Literal-code LZW stream (fixture generator): every pixel is its
    own code, the decoder's table growth is simulated so code width
    widens in lockstep, and a CLEAR resets well before the ceiling."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    emit(clear, width)
    size = clear + 2  # decoder's base table length
    first = True
    for px in indices:
        emit(px, width)
        if first:
            first = False
        else:
            size += 1  # the decoder appends one entry per code
            if size == (1 << width) and width < 12:
                width += 1
        if size >= 3500:  # re-CLEAR before the 12-bit ceiling
            emit(clear, width)
            width = min_code + 1
            size = clear + 2
            first = True
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ decode


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    out = np.empty_like(idx)
    out[np.asarray(rows, np.int64)] = idx
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB of the first frame, composed
    onto a background-color canvas at the logical screen size."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError(f"not a GIF (magic {data[:6]!r})")
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: introducer + label + sub-blocks
            pos += 2
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", data, pos + 1)
            iflags = data[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += size + 1
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code, w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            canvas_idx = np.full((sh, sw), bg_index, np.uint8)
            canvas_idx[top : top + h, left : left + w] = idx
            return table[np.minimum(canvas_idx, len(table) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


# ------------------------------------------------------------------ encode


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> GIF89a bytes.

    Fixture generator for the decoder: palette = the image's distinct
    colors (must be <= 256), literal-code LZW, optional interlacing.
    """
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors exceed GIF's 256")
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[np.asarray(rows, np.int64)]

    pal_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), np.uint8)
    pal[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    min_code = max(2, pal_bits)
    out += bytes([min_code])
    lzw = _gif_lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


# -------------------------------------------------------------- animation


def decode_gif_frames(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes -> ((n_frames, H, W, 3) uint8 composited RGB frames,
    (n_frames,) int64 per-frame delays in centiseconds).

    Implements the GIF89a compositing model: each image descriptor
    draws into the logical-screen canvas at its (left, top) rect;
    graphic control extensions carry per-frame transparency (indices
    equal to the transparent index leave the canvas untouched), delay,
    and disposal — 0/1 keep the canvas, 2 restores the frame rect to
    the background color, 3 restores the canvas to its pre-frame
    state. The emitted frames are the PRESENTED canvases (what a
    player shows), so lossless round-trips with
    ``encode_gif_animation`` are exact."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError(f"not a GIF (magic {data[:6]!r})")
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.full((sh, sw), bg_index, np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic control state (applies to the next image)
    disposal, transparent, delay = 0, -1, 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                packed = data[pos + 1]
                delay = struct.unpack_from("<H", data, pos + 2)[0]
                disposal = (packed >> 2) & 0x7
                transparent = data[pos + 4] if packed & 1 else -1
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", data, pos + 1)
            iflags = data[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += size + 1
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(lzw), min_code, w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            saved = canvas.copy() if disposal == 3 else None
            rect = canvas[top : top + h, left : left + w]
            if transparent >= 0:
                opaque = idx != transparent
                rect[opaque] = idx[opaque]
            else:
                rect[:, :] = idx
            frames.append(table[np.minimum(canvas, len(table) - 1)])
            delays.append(delay)
            if disposal == 2:
                canvas[top : top + h, left : left + w] = bg_index
            elif disposal == 3:
                canvas = saved
            disposal, transparent, delay = 0, -1, 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), np.asarray(delays, np.int64)


def encode_gif_animation(
    frames: np.ndarray,
    delay_cs: int = 10,
    subrect: bool = True,
    disposal: int = 1,
    loop: bool = True,
) -> bytes:
    """(n, H, W) gray or (n, H, W, 3) RGB uint8 -> animated GIF89a.

    One global palette over all frames (<= 256 distinct colors). With
    ``subrect=True``, frames after the first store only the bounding
    box of changed pixels, with unchanged pixels inside the box coded
    as a transparent index — the standard inter-frame compression —
    which exercises the decoder's sub-rectangle + transparency
    compositing. ``decode_gif_frames`` recovers the presented frames
    exactly."""
    if subrect and disposal >= 2:
        # diffing against the previous PRESENTED frame is only valid
        # when the canvas persists (disposal 0/1); restore-to-bg /
        # restore-to-previous need full frames
        raise ValueError("subrect encoding requires disposal 0 or 1")
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 3:
        frames = np.stack([frames] * 3, axis=3)
    n_frames, h, w = frames.shape[:3]
    flat = frames.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_used = len(palette)
    trans_idx = n_used  # one extra slot for transparency
    if n_used + (1 if subrect else 0) > 256:
        raise ValueError(f"{n_used} distinct colors exceed GIF's 256")
    idx_frames = inverse.astype(np.uint16).reshape(n_frames, h, w)

    pal_slots = n_used + (1 if subrect else 0)
    pal_bits = max(1, int(np.ceil(np.log2(max(pal_slots, 2)))))
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), np.uint8)
    pal[:n_used] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])
    out += pal.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, pal_bits)
    prev = None
    for f in range(n_frames):
        cur = idx_frames[f]
        left = top = 0
        rect = cur
        transparent = -1
        if subrect and prev is not None:
            changed = cur != prev
            if not changed.any():
                # no pixel changed: emit a 1x1 transparent rect
                rect = np.full((1, 1), trans_idx, np.uint16)
                transparent = trans_idx
            else:
                rows = np.flatnonzero(changed.any(axis=1))
                cols = np.flatnonzero(changed.any(axis=0))
                top, bottom = int(rows[0]), int(rows[-1]) + 1
                left, right = int(cols[0]), int(cols[-1]) + 1
                rect = cur[top:bottom, left:right].copy()
                keep = ~changed[top:bottom, left:right]
                rect[keep] = trans_idx
                transparent = trans_idx
        # graphic control extension
        packed = (disposal & 7) << 2 | (1 if transparent >= 0 else 0)
        out += b"\x21\xf9\x04" + bytes([packed])
        out += struct.pack("<H", delay_cs)
        out += bytes([max(transparent, 0), 0])
        rh, rw = rect.shape
        out += b"\x2c" + struct.pack("<HHHH", left, top, rw, rh) + b"\x00"
        out += bytes([min_code])
        lzw = _gif_lzw_encode(rect.astype(np.uint8).tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
        prev = cur
    out += b"\x3b"
    return bytes(out)
