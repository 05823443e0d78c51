"""Video containers: AVI (DIB uncompressed + Motion-JPEG) and animated
GIF (full GIF89a compositing), plus the real FrameSampler /
video_frame_features branches they feed."""

import numpy as np
import pyarrow as pa
import pytest

from doctr_ray.functions.multimodal import (
    FrameSampler,
    decode_video_real,
    video_frame_features,
)
from doctr_ray.sources.avicodec import decode_avi, encode_avi
from doctr_ray.sources.gifcodec import decode_gif_frames, encode_gif_animation


def _anim(n, h, w, d=3):
    idx = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(np.uint8)
    return np.stack(
        [
            np.where(
                idx == 0,
                np.uint8((d * 37 + f * 11) % 256),
                np.uint8((d * 37 + f * 11 + 91) % 256),
            )
            for f in range(n)
        ]
    )


def test_avi_dib_lossless_roundtrip():
    for n, h, w in [(1, 8, 8), (6, 16, 21), (10, 23, 17)]:
        fr = _anim(n, h, w)
        dec, fps = decode_avi(encode_avi(fr, fps=12))
        assert fps == 12 and np.array_equal(dec, np.stack([fr] * 3, axis=3))
    rgb = np.random.RandomState(0).randint(0, 256, (4, 12, 14, 3), np.uint8)
    dec, _ = decode_avi(encode_avi(rgb, fps=25))
    assert np.array_equal(dec, rgb)


def test_avi_mjpg_real_decode_pinned():
    """MJPG chunks decode through the in-repo JPEG codec: lossy but
    deterministic — near-exact on two-tone content."""
    fr = _anim(5, 24, 32)
    dec, fps = decode_avi(encode_avi(fr, fps=10, codec="MJPG"))
    assert fps == 10 and dec.shape == (5, 24, 32, 3)
    err = np.abs(dec.astype(int) - np.stack([fr] * 3, axis=3).astype(int))
    assert err.max() <= 4


def test_avi_errors_fail_fast():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"not a video")
    fr = _anim(3, 8, 8)
    blob = encode_avi(fr)
    for cut in (16, 80, len(blob) - 9):
        with pytest.raises(ValueError):
            decode_avi(blob[:cut])
    with pytest.raises(ValueError, match="codec"):
        encode_avi(fr, codec="H264")


def test_gif_animation_compositing_paths():
    """Sub-rect + transparency + both keep-disposals round-trip the
    PRESENTED frames exactly; full-frame mode covers disposal 2/3."""
    fr = _anim(7, 19, 13)
    for subrect, disposal in [(True, 0), (True, 1), (False, 2), (False, 3)]:
        dec, delays = decode_gif_frames(
            encode_gif_animation(fr, subrect=subrect, disposal=disposal)
        )
        assert np.array_equal(dec, np.stack([fr] * 3, axis=3))
        assert delays.tolist() == [10] * 7
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_animation(fr, subrect=True, disposal=2)
    # static run of identical frames exercises the 1x1 transparent rect
    static = np.repeat(fr[:1], 4, axis=0)
    dec, _ = decode_gif_frames(encode_gif_animation(static))
    assert np.array_equal(dec, np.stack([static] * 3, axis=3))


def test_gif_subrect_smaller_on_partial_change():
    fr = np.full((6, 20, 30), 40, np.uint8)
    for f in range(6):
        fr[f, 5:8, f * 4 : f * 4 + 3] = 200
    assert len(encode_gif_animation(fr, subrect=True)) < len(
        encode_gif_animation(fr, subrect=False)
    )
    dec, _ = decode_gif_frames(encode_gif_animation(fr, subrect=True))
    assert np.array_equal(dec, np.stack([fr] * 3, axis=3))


def test_decode_video_real_dispatch():
    fr = _anim(4, 10, 12)
    assert np.array_equal(
        decode_video_real(encode_gif_animation(fr)),
        np.stack([fr] * 3, axis=3),
    )
    assert np.array_equal(
        decode_video_real(encode_avi(fr)), np.stack([fr] * 3, axis=3)
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_video_real(b"\x00\x00\x00\x18ftypmp42 h264-ish")


def test_frame_sampler_real_branch_and_features():
    fr = _anim(9, 11, 15, d=7)
    tbl = pa.Table.from_pydict(
        {
            "media_id": ["g", "a"],
            "payload": pa.array(
                [encode_gif_animation(fr), encode_avi(fr)], pa.binary()
            ),
        }
    )
    out = FrameSampler(stride=4, use_real_decoder=True)(tbl)
    # 9 frames, stride 4 -> idx 0,4,8 per media
    assert out.num_rows == 6
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 4, 8]
    assert set(out["height"].to_pylist()) == {11}
    # both containers decode to the same gray frames
    by_media = {}
    for mid, idx, buf in zip(
        out["media_id"].to_pylist(),
        out["frame_idx"].to_pylist(),
        out["frame"].to_pylist(),
    ):
        by_media[(mid, idx)] = buf
    for idx in (0, 4, 8):
        assert by_media[("g", idx)] == by_media[("a", idx)]
        assert by_media[("g", idx)] == fr[idx].tobytes()

    feats = video_frame_features(tbl, stride=4)
    assert feats.num_rows == 6
    for mid, idx, h, w, s in zip(
        feats["media_id"].to_pylist(),
        feats["frame_idx"].to_pylist(),
        feats["height"].to_pylist(),
        feats["width"].to_pylist(),
        feats["px_sum"].to_pylist(),
    ):
        assert (h, w) == (11, 15)
        assert s == int(fr[idx].astype(np.int64).sum())


def test_video_media_ref_pages_and_ocr(tmp_path, ray_session):
    """video:// media refs rasterize every frame as a page (the
    multi-page-media analog of the PDF branch) and the OCR path
    reconstructs the rendered text byte-exactly from both
    containers."""
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.readers import rasterize_media

    text = ("frame page round trip " * 60).strip()
    pages = rasterize_synth(encode_media_ref(text))
    assert len(pages) >= 2  # must span multiple frames
    frames = np.stack([p.image for p in pages])
    g = tmp_path / "doc.gif"
    g.write_bytes(encode_gif_animation(frames, subrect=True))
    a = tmp_path / "doc.avi"
    a.write_bytes(encode_avi(frames, fps=10))
    rec = GlyphRecognizer()
    for path in (g, a):
        got = rasterize_media(f"video://{path}")
        assert len(got) == len(pages)
        for x, y in zip(got, pages):
            assert np.array_equal(x.image, y.image)
        out, conf = media_to_ocr_span("d", f"video://{path}", 0, rec)
        assert out == text and conf == 1.0


def test_apng_animation_roundtrip_and_dispatch():
    """APNG (acTL/fcTL/fdAT): gray + RGB animations round-trip the
    presented frames exactly in both sub-rect and full-frame modes;
    plain PNGs decode as one frame; decode_video_real dispatches it."""
    from doctr_ray.sources.imagecodec import (
        decode_apng_frames,
        encode_apng,
        encode_png,
    )

    fr = _anim(7, 19, 13)
    for subrect in (True, False):
        dec, delays = decode_apng_frames(encode_apng(fr, subrect=subrect))
        assert np.array_equal(dec, fr)
        assert delays.tolist() == [100] * 7
    rgb = np.stack([fr, fr // 2, 255 - fr], axis=3)
    dec, _ = decode_apng_frames(encode_apng(rgb))
    assert np.array_equal(dec, rgb)
    one, _ = decode_apng_frames(encode_png(fr[0]))
    assert one.shape == (1, 19, 13) and np.array_equal(one[0], fr[0])
    # real-video dispatch normalizes gray animations to the RGB contract
    out = decode_video_real(encode_apng(fr))
    assert np.array_equal(out, np.stack([fr] * 3, axis=3))
    # partial-change subrect stays exact
    mv = np.full((5, 18, 24), 30, np.uint8)
    for f in range(5):
        mv[f, 4:7, f * 4 : f * 4 + 4] = 220
    dec, _ = decode_apng_frames(encode_apng(mv, subrect=True))
    assert np.array_equal(dec, mv)


def test_video_media_mjpeg_ocr_exact(tmp_path, ray_session):
    """OCR survives LOSSY Motion-JPEG page frames byte-exactly: the
    <=6-LSB ringing on two-tone glyph pages never crosses the ink
    threshold, so detection runs and recognition templates are
    unchanged."""
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    text = ("lossy motion jpeg page stream " * 50).strip()
    pages = rasterize_synth(encode_media_ref(text))
    frames = np.stack([p.image for p in pages])
    f = tmp_path / "doc.avi"
    f.write_bytes(encode_avi(frames, fps=10, codec="MJPG"))
    out, conf = media_to_ocr_span("d", f"video://{f}", 0, GlyphRecognizer())
    assert out == text and conf == 1.0
