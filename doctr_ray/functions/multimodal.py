"""Multimodal binary columns — opaque payloads with typed metadata.

The large-scale training-data pattern from the north brief: image/
audio/video payloads travel as Arrow ``binary`` columns with typed
metadata columns; decode / feature-extract / resize / frame-sample run
as ``map_batches`` stages. IMAGE, AUDIO and VIDEO decode are all REAL:

- images via the in-repo codec matrix (PNG/JPEG/GIF/BMP/PNM/TIFF,
  sources/imagecodec), oracled by ``image_decode``;
- audio via WAV PCM + the COMPRESSED codecs FLAC / G.711 mu-law and
  A-law / IMA ADPCM (sources/flaccodec, sources/audiocodec), oracled
  by ``audio_decode`` / ``audio_compressed`` / ``audio_adpcm``;
- video via animated GIF, APNG and AVI (DIB + Motion-JPEG)
  (sources/gifcodec, imagecodec, avicodec), oracled by
  ``video_frames`` / ``video_mjpeg``.

Only psychoacoustic/DCT codecs (mp3/aac/opus, h264/vp9/av1) remain
stubbed exactly as the brief prescribes: a clearly-marked
``NotImplementedError`` naming ffmpeg, plus a deterministic fake
(seeded by the payload's own hash) that keeps the Ray-side plumbing —
schemas, batch sizes, actor signature, output layout — real and
tested for opaque formats.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def binary_features(batch: pa.Table, col: str = "payload") -> pa.Table:
    """Cheap vectorized features of an opaque binary column:
    size, sha256, magic (first-4-bytes hex) for format sniffing."""
    payloads = batch[col].to_pylist()
    return batch.append_column(
        "size_bytes", pa.array([len(p or b"") for p in payloads], pa.int64())
    ).append_column(
        "sha256", pa.array([hashlib.sha256(p or b"").hexdigest() for p in payloads])
    ).append_column(
        "magic", pa.array([(p or b"")[:4].hex() for p in payloads])
    )


def decode_image_real(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload — REAL, via the in-repo codec
    matrix (PNG/JPEG/GIF/BMP/PNM/TIFF, sources/imagecodec dispatch by
    magic bytes)."""
    from ..sources.imagecodec import decode_image

    return decode_image(payload)


def image_decode_features(batch: pa.Table, col: str = "payload") -> pa.Table:
    """Actor/task map_batches stage: encoded image payloads -> REAL
    decoded features (height, width, exact integer pixel sum of the
    gray plane). Runs the full decode per row — the canonical
    multimodal decode stage, one page per row, driver never sees
    pixels."""
    from ..sources.imagecodec import to_gray

    heights, widths, sums = [], [], []
    for p in batch[col].to_pylist():
        gray = to_gray(decode_image_real(p))
        heights.append(gray.shape[0])
        widths.append(gray.shape[1])
        sums.append(int(gray.astype(np.int64).sum()))
    return (
        batch.drop_columns([col])
        .append_column("height", pa.array(heights, pa.int64()))
        .append_column("width", pa.array(widths, pa.int64()))
        .append_column("px_sum", pa.array(sums, pa.int64()))
    )


def decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio payload to PCM — REAL for:

    - RIFF/WAVE integer + float PCM (sources/audiocodec);
    - RIFF/WAVE COMPRESSED tags: G.711 mu-law (7), A-law (6) and IMA
      ADPCM (0x11) — decoded by the in-repo companders/ADPCM decoder;
    - FLAC (sources/flaccodec — full subframe/Rice/stereo-decorrelation
      decoder, lossless so the decode is oracle-able sample-exactly).

    Psychoacoustic codecs (mp3/aac/opus/vorbis) still raise naming
    ffmpeg/torchaudio — those need licensed filterbank/huffman tables
    and are the one honestly-stubbed audio branch left."""
    if payload[:4] == b"fLaC":
        from ..sources.flaccodec import decode_flac

        return decode_flac(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from ..sources.audiocodec import decode_wav

        return decode_wav(payload)
    raise NotImplementedError(
        "psychoacoustic audio codecs (mp3/aac/opus) require "
        "ffmpeg/torchaudio (not in this container); WAV PCM, G.711, "
        "IMA ADPCM and FLAC decode for real"
    )


def audio_decode_features(batch: pa.Table, col: str = "payload") -> pa.Table:
    """map_batches stage: WAV payloads -> REAL decoded features
    (frame count, sample rate, channels, exact integer sum of
    absolute sample values)."""
    frames, rates, chans, sums = [], [], [], []
    for p in batch[col].to_pylist():
        samples, rate = decode_audio_real(p)
        frames.append(samples.shape[0])
        rates.append(rate)
        chans.append(samples.shape[1])
        sums.append(int(np.abs(samples.astype(np.int64)).sum()))
    return (
        batch.drop_columns([col])
        .append_column("n_frames", pa.array(frames, pa.int64()))
        .append_column("sample_rate", pa.array(rates, pa.int64()))
        .append_column("channels", pa.array(chans, pa.int64()))
        .append_column("abs_sum", pa.array(sums, pa.int64()))
    )


def _fake_frames(payload: bytes, n_frames: int, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: frames seeded by the payload hash —
    stable across processes/retries, so the pipeline stays idempotent."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n_frames, h, w), dtype=np.uint8)


def decode_video_real(payload: bytes) -> np.ndarray:
    """Decode a video payload to (n_frames, H, W, 3) uint8 RGB — REAL
    for animated GIF (sources/gifcodec.decode_gif_frames: full GIF89a
    compositing — disposal, transparency, sub-rects), AVI
    (sources/avicodec: DIB uncompressed + Motion-JPEG chunks via the
    in-repo JPEG decoder) and APNG (sources/imagecodec.
    decode_apng_frames: acTL/fcTL/fdAT with dispose/blend compositing,
    every frame region decoded by the full still-PNG path). DCT video
    codecs (h264/vp9/av1) raise naming ffmpeg — the one
    honestly-stubbed video branch left."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..sources.gifcodec import decode_gif_frames

        frames, _delays = decode_gif_frames(payload)
        return frames
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from ..sources.avicodec import decode_avi

        frames, _fps = decode_avi(payload)
        return frames
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..sources.imagecodec import decode_apng_frames

        frames, _delays = decode_apng_frames(payload)
        if frames.ndim == 3:  # gray animation -> RGB contract
            frames = np.stack([frames] * 3, axis=3)
        return frames[..., :3]
    raise NotImplementedError(
        "DCT video codecs (h264/vp9/av1) require ffmpeg (not in this "
        "container); animated GIF, APNG and AVI (DIB/MJPG) decode for "
        "real"
    )


class FrameSampler:
    """Actor-pool stage: video payloads -> sampled frame rows.

    ``__call__`` decodes each payload and emits ``stride``-sampled
    frames as binary gray rows with shape metadata. With
    ``use_real_decoder=True`` the payload decodes for REAL (animated
    GIF / APNG / AVI-DIB / AVI-MJPG via decode_video_real); the default
    deterministic fake (seeded by the payload hash) remains for
    opaque formats, keeping the fan-out contract — one payload row ->
    N frame rows — schema-identical on both branches.
    """

    def __init__(
        self,
        stride: int = 10,
        frame_h: int = 32,
        frame_w: int = 32,
        source_frames: int = 50,
        use_real_decoder: bool = False,
    ) -> None:
        self.stride = stride
        self.shape = (frame_h, frame_w)
        self.source_frames = source_frames
        self.use_real_decoder = use_real_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.imagecodec import to_gray

        out = {"media_id": [], "frame_idx": [], "frame": [], "height": [], "width": []}
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if self.use_real_decoder:
                frames = [to_gray(f) for f in decode_video_real(payload)]
            else:
                frames = _fake_frames(payload, self.source_frames, *self.shape)
            for fi in range(0, len(frames), self.stride):
                f = frames[fi]
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["frame"].append(f.tobytes())
                out["height"].append(f.shape[0])
                out["width"].append(f.shape[1])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"]),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame": pa.array(out["frame"], pa.binary()),
                "height": pa.array(out["height"], pa.int32()),
                "width": pa.array(out["width"], pa.int32()),
            }
        )


def video_frame_features(batch: pa.Table, stride: int = 2) -> pa.Table:
    """map_batches stage: video payloads -> REAL per-sampled-frame
    features (frame_idx, height, width, exact integer gray pixel sum).
    The decoded-value analog of image_decode_features for the video
    branch; lossless containers (GIF, AVI-DIB) make px_sum
    SQL-oracle-able."""
    from ..sources.imagecodec import to_gray

    out = {"media_id": [], "frame_idx": [], "height": [], "width": [], "px_sum": []}
    for mid, payload in zip(
        batch["media_id"].to_pylist(), batch["payload"].to_pylist()
    ):
        frames = decode_video_real(payload)
        for fi in range(0, len(frames), stride):
            gray = to_gray(frames[fi])
            out["media_id"].append(mid)
            out["frame_idx"].append(fi)
            out["height"].append(gray.shape[0])
            out["width"].append(gray.shape[1])
            out["px_sum"].append(int(gray.astype(np.int64).sum()))
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(out["media_id"]),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "px_sum": pa.array(out["px_sum"], pa.int64()),
        }
    )


def resize_frames(batch: pa.Table, target: tuple[int, int]) -> pa.Table:
    """Frame rows -> nearest-neighbor resized frames (vectorized per
    frame via index gather; the Resize-stage analog for binary frames)."""
    th, tw = target
    frames, hs, ws = (
        batch["frame"].to_pylist(),
        batch["height"].to_pylist(),
        batch["width"].to_pylist(),
    )
    out = []
    for buf, h, w in zip(frames, hs, ws):
        f = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
        ys = (np.arange(th) * h / th).astype(np.int64)
        xs = (np.arange(tw) * w / tw).astype(np.int64)
        out.append(np.ascontiguousarray(f[ys][:, xs]).tobytes())
    t = batch.drop_columns(["frame", "height", "width"])
    return (
        t.append_column("frame", pa.array(out, pa.binary()))
        .append_column("height", pa.array([th] * len(out), pa.int32()))
        .append_column("width", pa.array([tw] * len(out), pa.int32()))
    )
