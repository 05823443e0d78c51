"""AVI (RIFF) video container — pure stdlib + numpy parser and writer.

Makes the multimodal VIDEO branch real: the container grammar (RIFF
'AVI ' with 'hdrl' stream headers and 'movi' frame chunks) parses
in-repo, and the two classic codec-in-AVI forms both decode:

- **DIB / uncompressed** (``biCompression = 0``): bottom-up BGR rows
  padded to 4 bytes (the BMP pixel-array layout) — LOSSLESS, so the
  whole encode -> Arrow binary column -> decode -> frame-feature chain
  is oracle-able pixel-exactly (``video_frames`` query);
- **MJPG** (Motion JPEG, ``biCompression = 'MJPG'``): each '00dc'
  chunk is a standalone baseline JPEG, decoded by the in-repo
  sources/jpegcodec — the decode is deterministic and pinned by
  pytest (lossy, so excluded from the SQL value oracle).

Psychoacoustic/DCT video codecs (h264/vp9/av1) require licensed
native decoders and stay honestly stubbed in
functions/multimodal.FrameSampler's fake branch.

The reference repo has no video surface; this serves the north
brief's multimodal training-data operators.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad_row(w: int) -> int:
    return (w * 3 + 3) & ~3


def encode_avi(
    frames: np.ndarray, fps: int = 10, codec: str = "DIB "
) -> bytes:
    """(n, H, W) gray or (n, H, W, 3) RGB uint8 -> AVI bytes.

    ``codec='DIB '`` writes uncompressed bottom-up BGR (lossless);
    ``codec='MJPG'`` writes one baseline JPEG per frame."""
    frames = np.asarray(frames, np.uint8)
    gray_in = frames.ndim == 3
    if gray_in:
        frames = np.stack([frames] * 3, axis=3)
    n, h, w = frames.shape[:3]

    chunks: list[bytes] = []
    if codec == "DIB ":
        row_bytes = _pad_row(w)
        for f in range(n):
            bgr = frames[f, ::-1, :, ::-1]  # bottom-up, RGB->BGR
            rows = np.zeros((h, row_bytes), np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            chunks.append(rows.tobytes())
        fourcc = b"00db"
        compression = 0
    elif codec == "MJPG":
        from .jpegcodec import encode_jpeg

        for f in range(n):
            # gray payloads encode as single-component JPEGs
            img = frames[f, :, :, 0] if gray_in else frames[f]
            chunks.append(encode_jpeg(img, quality=95))
        fourcc = b"00dc"
        compression = struct.unpack("<I", b"MJPG")[0]
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(c) for c in chunks)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,   # max bytes per sec
        0, 0x10,           # padding, flags (HASINDEX)
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4H",
        b"vids", codec.encode() if isinstance(codec, str) else codec,
        0, 0, 0, 0,
        1, fps,            # scale, rate -> fps
        0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24, compression,
        _pad_row(w) * h, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(fourcc, c) for c in chunks)
    movi = lst(b"movi", movi_body)

    # idx1: one entry per frame (fourcc, flags, offset-from-movi, size)
    idx = bytearray()
    off = 4
    for c in chunks:
        idx += fourcc + struct.pack("<III", 0x10, off, len(c))
        off += 8 + len(c) + (len(c) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((n, H, W, 3) uint8 RGB frames, fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    compression = None
    scale, rate = 1, 10
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, compression, scale, rate
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > len(data):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_start + 4, body_end)
            elif cid == b"strh":
                fcc_type = data[body_start : body_start + 4]
                if fcc_type == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", data, body_start + 20
                    )
            elif cid == b"strf" and w is None:
                _bisize, bw, bh = struct.unpack_from("<Iii", data, body_start)
                compression = struct.unpack_from(
                    "<I", data, body_start + 16
                )[0]
                w, h = bw, abs(bh)
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append(_decode_frame(
                    data[body_start:body_end], w, h, compression
                ))
            pos = body_end + (size & 1)

    walk(12, len(data))
    if w is None or not frames:
        raise ValueError("AVI missing stream format or frames")
    fps = rate // scale if scale else rate
    return np.stack(frames), int(fps)


def _decode_frame(
    body: bytes, w: int | None, h: int | None, compression: int | None
) -> np.ndarray:
    if w is None or h is None:
        raise ValueError("AVI frame before stream format")
    if compression == 0:  # DIB: bottom-up padded BGR
        row_bytes = _pad_row(w)
        if len(body) < row_bytes * h:
            raise ValueError("truncated AVI DIB frame")
        rows = np.frombuffer(body, np.uint8, row_bytes * h).reshape(
            h, row_bytes
        )
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[::-1, :, ::-1])
    if compression == struct.unpack("<I", b"MJPG")[0]:
        from .jpegcodec import decode_jpeg

        img = decode_jpeg(body)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=2)
        return img
    raise NotImplementedError(
        f"AVI compression 0x{compression:08x} needs ffmpeg/cv2 "
        "(DIB and MJPG decode for real)"
    )
