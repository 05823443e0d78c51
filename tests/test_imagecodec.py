"""Pure-stdlib image codecs (PNG/BMP/PNM) — decode correctness against
hand-built encodings, encode round-trips, and the file:// media path
feeding the real OCR pipeline (reference: io/image/base.py:16-54
read_img_as_numpy; io/reader.py:24-79 DocumentFile)."""

import struct
import zlib

import numpy as np
import pytest

from doctr_ray.sources.imagecodec import (
    PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_png,
    to_gray,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ------------------------------------------------------------ PNG round-trip


def test_png_roundtrip_gray():
    img = _rng().integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_rgb():
    img = _rng(1).integers(0, 256, size=(21, 34, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decode_image_dispatch():
    img = _rng(2).integers(0, 256, size=(5, 5), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)


# ------------------------------------- PNG filters (forward-filter in test)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc_:
        return a
    if pb <= pc_:
        return b
    return c


def _forward_filter(pixels: np.ndarray, ftypes: list[int], channels: int) -> bytes:
    """Apply the PNG forward filters row by row (the encoder side the
    decoder must invert)."""
    h, w = pixels.shape[:2]
    flat = pixels.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    out = bytearray()
    prior = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for x in range(w * channels):
            left = int(line[x - bpp]) if x >= bpp else 0
            up = int(prior[x])
            ul = int(prior[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            out.append((int(line[x]) - pred) & 0xFF)
        prior = line
    return bytes(out)


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_all_filters(ftypes, channels):
    shape = (11, 17) if channels == 1 else (11, 17, 3)
    img = _rng(sum(ftypes) * 10 + channels).integers(0, 256, size=shape, dtype=np.uint8)
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", 17, 11, 8, color_type, 0, 0, 0)
    idat = zlib.compress(_forward_filter(img, ftypes, channels))
    png = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")
    assert np.array_equal(decode_png(png), img)


def test_png_1bit_gray():
    # 1-bit bilevel: 10 px wide -> packed 2 bytes per row, filter 0
    img_bits = np.array(
        [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1], [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], dtype=np.uint8
    )
    rows = bytearray()
    for y in range(2):
        rows.append(0)
        packed = np.packbits(img_bits[y])
        rows.extend(packed.tobytes())
    ihdr = struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img_bits * 255)


def test_png_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    rows = bytearray()
    for y in range(2):
        rows.append(0)
        rows.extend(idx[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pal[idx])


def _adam7_png(img: np.ndarray) -> bytes:
    """Hand-build an interlaced PNG straight from the spec (filter 0
    rows per pass) — independent of the decoder's own pass logic."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    px = img.reshape(h, w, ch)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue  # empty passes are entirely absent (PNG spec)
        for row in sub:
            raw += b"\x00" + row.tobytes()
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    import zlib as _z

    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(4, 4), (13, 11), (9, 17, 3), (1, 1), (7, 3, 4)])
def test_png_adam7_interlaced_decodes(shape):
    # Adam7 decodes for real now — all seven passes reassemble exactly
    img = _rng(23).integers(0, 256, shape).astype(np.uint8)
    out = decode_png(_adam7_png(img))
    assert np.array_equal(out, img.reshape(out.shape))


def test_png_16bit_decodes_high_byte():
    # 16-bit samples downscale by high byte (cv2/PIL 8-bit convention)
    img16 = _rng(29).integers(0, 65536, (6, 10), np.uint32).astype(">u2")
    raw = bytearray()
    for row in img16:
        raw += b"\x00" + row.tobytes()
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 10, 6, 16, 0, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert np.array_equal(out, (img16.astype(np.uint16) >> 8).astype(np.uint8))


def test_jpeg_dispatches_to_baseline_codec():
    # baseline JPEG is REAL now (tests/test_jpegcodec.py); the dispatch
    # routes JFIF magic into it — a truncated stream errors loudly
    with pytest.raises(ValueError, match="scan data"):
        decode_image(b"\xff\xd8\xff\xd9")


# ---------------------------------------------------------------------- BMP


def _make_bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = img if top_down else img[::-1]
    body = bytearray()
    for y in range(h):
        line = rows[y][:, ::-1].tobytes()  # RGB -> BGR
        body.extend(line + b"\x00" * (stride - len(line)))
    hdr_h = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    filehdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return filehdr + info + bytes(body)


def test_bmp24_bottom_up_and_top_down():
    img = _rng(3).integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp24(img)), img)
    assert np.array_equal(decode_bmp(_make_bmp24(img, top_down=True)), img)


def test_bmp8_gray_palette():
    img = _rng(4).integers(0, 256, size=(6, 6), dtype=np.uint8)
    h, w = img.shape
    stride = (w + 3) & ~3
    pal = bytearray()
    for v in range(256):
        pal.extend(bytes([v, v, v, 0]))  # BGRX gray ramp
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body.extend(img[y].tobytes() + b"\x00" * (stride - w))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    off = 14 + 40 + len(pal)
    filehdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    data = filehdr + info + bytes(pal) + bytes(body)
    assert np.array_equal(decode_bmp(data), img)


# ---------------------------------------------------------------------- PNM


def test_pnm_binary_gray_and_rgb():
    g = _rng(5).integers(0, 256, size=(4, 9), dtype=np.uint8)
    data = b"P5 9 4 255\n" + g.tobytes()
    assert np.array_equal(decode_pnm(data), g)
    c = _rng(6).integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    data = b"P6\n# comment\n4 3\n255\n" + c.tobytes()
    assert np.array_equal(decode_pnm(data), c)


def test_pnm_ascii():
    data = b"P2 3 2 255\n0 128 255\n10 20 30\n"
    assert np.array_equal(decode_pnm(data), np.array([[0, 128, 255], [10, 20, 30]], np.uint8))
    data = b"P3 2 1 255\n1 2 3 4 5 6\n"
    assert np.array_equal(decode_pnm(data), np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8))


def test_pnm_bitmaps():
    # P4: packed, 1 = black
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1]], np.uint8)
    data = b"P4 9 1\n" + np.packbits(bits).tobytes()
    assert np.array_equal(decode_pnm(data), (1 - bits) * 255)
    data = b"P1 3 1\n1 0 1\n"
    assert np.array_equal(decode_pnm(data), np.array([[0, 255, 0]], np.uint8))


def test_pnm_maxval_scaling():
    data = b"P5 2 1 100\n" + bytes([0, 100])
    assert np.array_equal(decode_pnm(data), np.array([[0, 255]], np.uint8))


# -------------------------------------------------------------------- misc


def test_to_gray_known_values():
    rgb = np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0]]], np.uint8)
    g = to_gray(rgb)
    assert g[0, 0] == 255 and g[0, 1] == 0 and g[0, 2] == 76  # 299*255//1000
    gray = np.array([[5, 6]], np.uint8)
    assert to_gray(gray) is gray


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"\x00\x01\x02\x03junk")


# ------------------------------------------- file:// media -> real pipeline


def test_file_png_media_runs_full_ocr(tmp_path):
    """A real PNG on disk flows through rasterize_media -> detect ->
    recognize and reconstructs the exact rendered text."""
    from doctr_ray.media import encode_media_ref, rasterize_synth, synth_ground_truth_text
    from doctr_ray.pipelines.ocr import process_media_row
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.readers import rasterize_media

    ref = encode_media_ref("quick brown fox jumps over the lazy dog again and again", 640, 480)
    page = rasterize_synth(ref)[0]
    png_path = tmp_path / "page.png"
    png_path.write_bytes(encode_png(page.image))

    pages = rasterize_media(f"file://{png_path}")
    assert len(pages) == 1
    assert np.array_equal(pages[0].image, page.image)

    rows = process_media_row("d0", f"file://{png_path}", 0, GlyphRecognizer())
    got = " ".join(rows["text"])
    assert got == synth_ground_truth_text(ref)


def test_file_bmp_media_decodes(tmp_path):
    from doctr_ray.sources.readers import rasterize_media

    img = _rng(8).integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    p = tmp_path / "x.bmp"
    p.write_bytes(_make_bmp24(img))
    pages = rasterize_media(f"file://{p}")
    assert pages[0].image.shape == (16, 12)
    assert np.array_equal(pages[0].image, to_gray(img))


# ---------------------------------------------------------------------- TIFF


def _make_tiff(img: np.ndarray, compression: int = 1, photometric=None, rows_per_strip=None,
               bits: int = 8, predictor: int = 1, t4_options=None):
    """Minimal little-endian strip TIFF writer for decoder tests."""
    import struct
    import zlib as _zlib

    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    rps = rows_per_strip or h
    photometric = photometric if photometric is not None else (1 if spp == 1 else 2)
    px = img.reshape(h, -1)
    if bits == 16:
        px = np.ascontiguousarray(px.astype("<u2")).view(np.uint8)

    strips = []
    for y0 in range(0, h, rps):
        chunk = px[y0 : y0 + rps].tobytes()
        if compression == 7:  # new-style JPEG: strip is a JFIF stream
            from doctr_ray.sources.jpegcodec import encode_jpeg

            strip_img = img[y0 : y0 + rps]
            chunk = encode_jpeg(strip_img, 95)
        elif compression == 8:
            chunk = _zlib.compress(chunk)
        elif compression == 5:  # LZW (TIFF variant)
            from doctr_ray.sources.imagecodec import _tiff_lzw_encode

            chunk = _tiff_lzw_encode(chunk)
        elif compression in (2, 3, 4):  # CCITT fax strips
            from doctr_ray.sources.ccittcodec import (
                encode_g3,
                encode_g3_2d,
                encode_g4,
            )

            black = img[y0 : y0 + rps] == 0
            if compression == 4:
                chunk = encode_g4(black)
            elif compression == 3 and t4_options and (t4_options & 1):
                chunk = encode_g3_2d(
                    black, k=2, byte_align=bool(t4_options & 4)
                )
            else:
                chunk = encode_g3(black, byte_align=compression == 2)
        elif compression == 32773:  # PackBits: literal runs only (valid)
            out = bytearray()
            i = 0
            while i < len(chunk):
                n = min(128, len(chunk) - i)
                out.append(n - 1)
                out += chunk[i : i + n]
                i += n
            chunk = bytes(out)
        strips.append(chunk)

    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_offset_resolver)
    extra = bytearray()
    header_size = 8
    ifd_count = 10 + (1 if t4_options is not None else 0)
    ifd_size = 2 + 12 * ifd_count + 4
    data_start = header_size + ifd_size

    def arr_vals(vals, typ):
        nonlocal extra
        size = {3: 2, 4: 4}[typ] * len(vals)
        if size <= 4:
            packed = b"".join(
                struct.pack("<H" if typ == 3 else "<I", v) for v in vals
            ).ljust(4, b"\x00")
            return packed
        off = data_start + len(extra)
        for v in vals:
            extra += struct.pack("<H" if typ == 3 else "<I", v)
        return struct.pack("<I", off)

    # strip data goes after 'extra' — two passes: sizes first
    strip_sizes = [len(s) for s in strips]
    # reserve extra arrays first, then strips
    pending = []
    def add(tag, typ, vals):
        pending.append((tag, typ, vals))

    add(256, 4, [w]); add(257, 4, [h]); add(258, 3, [bits] * spp)
    add(259, 3, [compression]); add(262, 3, [photometric])
    add(277, 3, [spp]); add(278, 4, [rps])
    # placeholders for strip offsets (filled after extra is known)
    add(279, 4, strip_sizes)
    add(317, 3, [predictor])
    if t4_options is not None:
        add(292, 4, [t4_options])

    # first pass to materialize all value arrays except offsets
    rendered = []
    for tag, typ, vals in pending:
        rendered.append((tag, typ, len(vals), arr_vals(vals, typ)))
    # strips begin after extra, INCLUDING the offsets array that is
    # itself about to be appended to extra when n_strips > 1
    strip_off0 = data_start + len(extra) + (4 * n_strips if n_strips > 1 else 0)
    offs = []
    acc = strip_off0
    for s in strips:
        offs.append(acc)
        acc += len(s)
    rendered.append((273, 4, n_strips, arr_vals(offs, 4)))
    rendered.sort(key=lambda e: e[0])

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(rendered))
    for tag, typ, count, val in rendered:
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)
    assert len(out) == data_start, (len(out), data_start)
    out += extra
    for s in strips:
        out += s
    return bytes(out)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
def test_tiff_gray_roundtrip(compression):
    from doctr_ray.sources.imagecodec import decode_tiff

    img = _rng(41).integers(0, 256, (13, 17), dtype=np.uint8)
    data = _make_tiff(img, compression=compression)
    assert np.array_equal(decode_tiff(data), img)


def test_tiff_rgb_and_strips():
    from doctr_ray.sources.imagecodec import decode_tiff

    img = _rng(42).integers(0, 256, (12, 7, 3), dtype=np.uint8)
    data = _make_tiff(img, compression=8, rows_per_strip=5)
    assert np.array_equal(decode_tiff(data), img)


def test_tiff_white_is_zero():
    from doctr_ray.sources.imagecodec import decode_tiff

    img = _rng(43).integers(0, 256, (6, 6), dtype=np.uint8)
    data = _make_tiff(img, photometric=0)
    assert np.array_equal(decode_tiff(data), 255 - img)


def test_tiff_newstyle_jpeg_decodes():
    """Compression 7 (new-style JPEG-in-TIFF): per-strip JFIF streams
    decode through the in-repo JPEG codec; flat strips are bit-exact."""
    from doctr_ray.sources.imagecodec import decode_tiff

    img = np.full((20, 32), 130, np.uint8)
    assert np.array_equal(decode_tiff(_make_tiff(img, compression=7)), img)
    # multi-strip gradient: strip boundaries must reassemble in order
    yy, xx = np.mgrid[0:24, 0:32]
    grad = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = decode_tiff(_make_tiff(grad, compression=7, rows_per_strip=8))
    assert out.shape == grad.shape
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 1


def test_tiff_oldstyle_jpeg_rejected():
    from doctr_ray.sources.imagecodec import decode_tiff

    img = np.zeros((8, 8), np.uint8)
    data = _make_tiff(img, compression=1)
    # flip the compression tag value 1 -> 6 (old-style JPEG)
    import struct as _st

    idx = data.find(_st.pack("<HH", 259, 3))
    assert idx != -1
    data = data[:idx + 8] + _st.pack("<I", 6) + data[idx + 12:]
    with pytest.raises(NotImplementedError, match="cv2 or PIL"):
        decode_tiff(data)


def test_tiff_lzw_decodes():
    """LZW (compression 5) decodes for real now — TIFF-variant early
    code-width change, table reset, round-trip via the in-repo encoder
    plus cross-check against the uncompressed decode of the same pixels."""
    from doctr_ray.sources.imagecodec import decode_tiff

    img = _rng(17).integers(0, 256, (70, 90), np.uint8)  # big enough to cross 9->10 bit codes
    out = decode_tiff(_make_tiff(img, compression=5))
    assert np.array_equal(out, img)
    assert np.array_equal(out, decode_tiff(_make_tiff(img, compression=1)))
    rgb = _rng(18).integers(0, 256, (20, 30, 3), np.uint8)
    assert np.array_equal(decode_tiff(_make_tiff(rgb, compression=5, rows_per_strip=7)), rgb)


def test_tiff_dispatch():
    img = _rng(44).integers(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_tiff(img)), img)


def test_tiff_16bit_high_byte():
    from doctr_ray.sources.imagecodec import decode_tiff

    img16 = np.random.default_rng(5).integers(0, 65536, (9, 13)).astype(np.uint16)
    data = _make_tiff(img16, compression=8, bits=16)
    assert np.array_equal(decode_tiff(data), (img16 >> 8).astype(np.uint8))
    rgb16 = np.random.default_rng(6).integers(0, 65536, (5, 7, 3)).astype(np.uint16)
    data = _make_tiff(rgb16, compression=1, bits=16)
    assert np.array_equal(decode_tiff(data), (rgb16 >> 8).astype(np.uint8))


def test_tiff_16bit_predictor_differencing():
    from doctr_ray.sources.imagecodec import decode_tiff

    img16 = np.random.default_rng(7).integers(0, 65536, (4, 6)).astype(np.uint16)
    diffed = img16.copy()
    diffed[:, 1:] = (img16[:, 1:].astype(np.int64) - img16[:, :-1]).astype(np.uint16)
    data = _make_tiff(diffed, compression=8, bits=16, predictor=2)
    assert np.array_equal(decode_tiff(data), (img16 >> 8).astype(np.uint8))


def test_pnm_16bit_samples():
    from doctr_ray.sources.imagecodec import decode_pnm

    img16 = np.random.default_rng(8).integers(0, 65536, (6, 9)).astype(np.uint16)
    body = img16.astype(">u2").tobytes()
    data = b"P5 9 6 65535\n" + body
    want = (img16.astype(np.int64) * 255 // 65535).astype(np.uint8)
    assert np.array_equal(decode_pnm(data), want)
    # P6 RGB 16-bit
    rgb16 = np.random.default_rng(9).integers(0, 65536, (3, 4, 3)).astype(np.uint16)
    data = b"P6 4 3 65535\n" + rgb16.astype(">u2").tobytes()
    want = (rgb16.astype(np.int64) * 255 // 65535).astype(np.uint8)
    assert np.array_equal(decode_pnm(data), want)
    # ASCII P2 with a 16-bit maxval
    data = b"P2 2 1 1000\n1000 500\n"
    assert decode_pnm(data).tolist() == [[255, 127]]


def test_tiff_ccitt_g4_g3_roundtrip():
    """TIFF compressions 2/3/4 — the 'TIFF G4' archival scan — decode
    bit-exact, including multi-strip files and 2-D T4Options."""
    from doctr_ray.sources.imagecodec import decode_tiff

    rng = np.random.default_rng(41)
    img = np.where(rng.random((22, 63)) < 0.3, 0, 255).astype(np.uint8)
    img[6:12] = img[6]  # correlated rows
    for comp, t4 in ((4, None), (2, None), (3, 0), (3, 1), (3, 5)):
        data = _make_tiff(
            img, compression=comp, photometric=0, bits=1, t4_options=t4
        )
        assert np.array_equal(decode_tiff(data), img), (comp, t4)
    # multi-strip G4
    data = _make_tiff(
        img, compression=4, photometric=0, bits=1, rows_per_strip=8
    )
    assert np.array_equal(decode_tiff(data), img)


def test_bmp_pnm_tiff_writers_roundtrip():
    from doctr_ray.sources.imagecodec import (
        decode_image,
        encode_bmp,
        encode_pnm,
        encode_tiff,
    )

    rng = _rng(71)
    g = rng.integers(0, 256, (19, 27), np.uint8)
    rgb = rng.integers(0, 256, (14, 21, 3), np.uint8)
    bi = np.where(rng.random((23, 41)) < 0.4, 0, 255).astype(np.uint8)
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)
    assert np.array_equal(decode_image(encode_bmp(g)),
                          np.stack([g] * 3, axis=-1))
    assert np.array_equal(decode_image(encode_pnm(g)), g)
    assert np.array_equal(decode_image(encode_pnm(rgb)), rgb)
    for c in ("none", "packbits", "lzw", "deflate"):
        assert np.array_equal(decode_image(encode_tiff(g, c)), g), c
        assert np.array_equal(decode_image(encode_tiff(rgb, c)), rgb), c
    for c in ("g4", "g3"):
        assert np.array_equal(decode_image(encode_tiff(bi, c)), bi), c
    with pytest.raises(ValueError, match="bilevel"):
        encode_tiff(g, "g4")


def test_tiled_tiff_roundtrip_all_compressions():
    """Tiled TIFFs (tags 322-325, padded edge tiles) round-trip for
    every compression incl. the fax codings."""
    from doctr_ray.sources.imagecodec import decode_image, encode_tiff

    rng = _rng(91)
    g = rng.integers(0, 256, (50, 70), np.uint8)
    rgb = rng.integers(0, 256, (40, 55, 3), np.uint8)
    bi = np.where(rng.random((45, 66)) < 0.4, 0, 255).astype(np.uint8)
    for c in ("none", "packbits", "lzw", "deflate"):
        assert np.array_equal(
            decode_image(encode_tiff(g, c, tile=(32, 16))), g
        ), c
        assert np.array_equal(
            decode_image(encode_tiff(rgb, c, tile=(16, 32))), rgb
        ), c
    for c in ("g4", "g3"):
        assert np.array_equal(
            decode_image(encode_tiff(bi, c, tile=(32, 32))), bi
        ), c
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(g, "none", tile=(20, 16))


def test_bmp_rle8_decodes():
    """BI_RLE8 (runs, absolute mode, EOL/EOB markers) decodes against
    the equivalent uncompressed 8-bit palette BMP."""
    import struct as _s

    pal = bytes()
    # build palette: identity gray BGRX entries
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    h, w = 4, 10
    rows = np.array(
        [[7] * 10, [1, 1, 1, 2, 3, 4, 4, 4, 4, 4],
         [0] * 10, [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]], np.uint8
    )
    # RLE8 encode by hand (bottom-up row order)
    rle = bytearray()
    for r in rows[::-1]:
        i = 0
        while i < len(r):
            j = i
            while j < len(r) and r[j] == r[i] and j - i < 255:
                j += 1
            if j - i >= 2:
                rle += bytes([j - i, r[i]])
                i = j
            else:
                # absolute run of >= 3 or padded literal via single runs
                rle += bytes([1, r[i]])
                i += 1
        rle += b"\x00\x00"  # end of line
    rle += b"\x00\x01"  # end of bitmap
    hdr_size = 40
    off = 14 + hdr_size + len(pal)
    info = _s.pack("<IiiHHIIiiII", hdr_size, w, h, 1, 8, 1, len(rle),
                   2835, 2835, 256, 0)
    bmp = (b"BM" + _s.pack("<IHHI", off + len(rle), 0, 0, off)
           + info + pal + bytes(rle))
    from doctr_ray.sources.imagecodec import decode_bmp

    out = decode_bmp(bmp)
    assert out.ndim == 2  # achromatic palette collapses to gray
    assert np.array_equal(out, rows)


def test_tiff_oldstyle_jpeg_interchange_format_decodes():
    """Compression 6 with JPEGInterchangeFormat (tag 513): the JFIF
    blob decodes through the in-repo JPEG codec."""
    import struct as _s

    from doctr_ray.sources.imagecodec import decode_tiff
    from doctr_ray.sources.jpegcodec import encode_jpeg

    img = _rng(97).integers(0, 256, (24, 40), np.uint8)
    jfif = encode_jpeg(img, 95)
    # minimal IFD: dims, compression 6, photometric, tags 513/514
    entries = [
        (256, 4, 40), (257, 4, 24), (258, 3, 8), (259, 3, 6),
        (262, 3, 1), (277, 3, 1),
    ]
    n = len(entries) + 2
    data_start = 8 + 2 + 12 * n + 4
    out = bytearray(b"II*\x00" + _s.pack("<I", 8) + _s.pack("<H", n))
    for tag, typ, v in entries:
        out += _s.pack("<HHI", tag, typ, 1)
        out += _s.pack("<H", v).ljust(4, b"\x00") if typ == 3 else _s.pack("<I", v)
    out += _s.pack("<HHII", 513, 4, 1, data_start)
    out += _s.pack("<HHII", 514, 4, 1, len(jfif))
    out += _s.pack("<I", 0)
    assert len(out) == data_start
    out += jfif
    got = decode_tiff(bytes(out))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 3


def test_multipage_tiff_ifd_chain():
    """Multi-page TIFF (fax/scanner-batch IFD chain): every page
    round-trips; decode_tiff keeps the first-IFD still contract."""
    import numpy as np

    from doctr_ray.sources.imagecodec import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff,
        encode_tiff_multipage,
    )

    rng = np.random.RandomState(1)
    pages = [
        rng.randint(0, 256, (20 + i * 3, 31 - i)).astype(np.uint8)
        for i in range(4)
    ]
    for comp in ("none", "lzw", "deflate", "packbits"):
        blob = encode_tiff_multipage(pages, comp)
        dec = decode_tiff_pages(blob)
        assert len(dec) == 4
        assert all(np.array_equal(a, b) for a, b in zip(dec, pages))
        assert np.array_equal(decode_tiff(blob), pages[0])
    bw = [
        np.where(rng.random((40, 50)) < 0.4, 0, 255).astype(np.uint8)
        for _ in range(3)
    ]
    blob = encode_tiff_multipage(bw, "g4")  # the multi-page G4 fax form
    assert all(
        np.array_equal(a, b) for a, b in zip(decode_tiff_pages(blob), bw)
    )
    single = encode_tiff(pages[0], "lzw")
    assert len(decode_tiff_pages(single)) == 1


def test_multipage_tiff_fax_ocr_roundtrip(tmp_path, ray_session):
    """A multi-page G4 fax TIFF media ref rasterizes one page per IFD
    and OCRs back byte-exactly (the fax-document route)."""
    import numpy as np

    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer
    from doctr_ray.sources.imagecodec import encode_tiff_multipage
    from doctr_ray.sources.readers import rasterize_media

    text = ("fax page chain round trip " * 50).strip()
    pages = rasterize_synth(encode_media_ref(text))
    assert len(pages) >= 2
    f = tmp_path / "fax.tif"
    f.write_bytes(encode_tiff_multipage([p.image for p in pages], "g4"))
    got = rasterize_media(f"file://{f}")
    assert len(got) == len(pages)
    assert all(np.array_equal(x.image, y.image) for x, y in zip(got, pages))
    out, conf = media_to_ocr_span("d", f"file://{f}", 0, GlyphRecognizer())
    assert out == text and conf == 1.0
