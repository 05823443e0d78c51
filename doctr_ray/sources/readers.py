"""Media readers / dispatch — the DocumentFile surface.

Mirrors the reference's reader dispatch (reference: io/reader.py:24-79
``DocumentFile.from_pdf/from_url/from_images``; io/pdf.py:16-43
``read_pdf`` via pypdfium2 at scale=2; io/image/base.py:16-54
``read_img_as_numpy`` via cv2; io/html.py:11-26 ``read_html`` via
weasyprint). PDF rasterization and JPEG genuinely require native
decoders absent from this container (clearly-marked stubs name the
dependency), but **PNG/BMP/PNM images decode for real** via the
pure-stdlib codecs in ``imagecodec`` — a ``file://page.png`` media_ref
runs the full detect→recognize→build pipeline. The ``synth://`` branch
is the deterministic ground-truth renderer every oracle exercises. The
Ray-side plumbing (one media row in -> N page rows out, binary image
column + height/width metadata) is identical for all branches.
"""

from __future__ import annotations

import numpy as np

from ..media import SYNTH_PREFIX, PageGT, rasterize_synth
from .imagecodec import decode_image, to_gray

FILE_PREFIX = "file://"


def read_pdf(file: bytes | str, scale: int = 2) -> list[np.ndarray]:
    """Rasterize all pages of a real PDF. STUB — needs pypdfium2.

    reference: io/pdf.py:16-43 (scale=2 -> 144 dpi, RGB uint8).
    """
    raise NotImplementedError(
        "real PDF rasterization requires pypdfium2 (not in this container); "
        "use synth:// media refs or plug a decoder into rasterize_media"
    )


def read_image(data: bytes, output_size: tuple[int, int] | None = None) -> np.ndarray:
    """Decode an encoded image to uint8 pixels (reference:
    io/image/base.py:16-54 ``read_img_as_numpy``).

    PNG/BMP/PNM decode via the pure-stdlib codecs; JPEG raises naming
    the missing native decoder. ``output_size`` (H, W) resizes with the
    engine's half-pixel-center bilinear kernel (the reference uses
    cv2.resize INTER_LINEAR — same convention).
    """
    arr = decode_image(data)
    if output_size is not None:
        from ..geometry import resize_bilinear

        if arr.ndim == 3:
            arr = np.stack(
                [resize_bilinear(arr[:, :, c], output_size) for c in range(arr.shape[2])],
                axis=2,
            )
        else:
            arr = resize_bilinear(arr, output_size)
    return arr


def fetch_url(url: str, timeout: float = 5.0) -> bytes:
    """GET a URL with stdlib urllib (the reference's ``requests.get``
    in io/html.py from_url). Works against any reachable host — e.g.
    a localhost service; this container has no EXTERNAL network route,
    so public URLs fail with the underlying socket error, re-raised
    with the real constraint named."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read()
    except urllib.error.URLError as e:
        raise ConnectionError(
            f"could not fetch {url!r}: {e.reason} (this container has no "
            "external network route; localhost/file sources work)"
        ) from e


def from_url(url: str) -> bytes:
    """``DocumentFile.from_url`` analog (reference io/html.py:11-26 +
    io/reader.py:37): fetch the page and render it to PDF bytes —
    here the text-layer PDF :func:`read_html` composes."""
    return read_html(url)


def read_html(src: str | bytes) -> bytes:
    """HTML -> PDF bytes (reference io/html.py:11-26, weasyprint's
    ``HTML(string).write_pdf()``).

    No browser engine ships in this container, so the render is a
    TEXT-LAYER analog: the DOM main-content extractor
    (functions/html_extract) pulls the readable text and a minimal
    text-layer PDF is composed (sources/pdftext.make_simple_pdf) — the
    exact well-behaved subset this engine's PDF reader round-trips, so
    DocumentFile-style dispatch over the returned bytes extracts the
    same text. ``src`` may be an HTML string, HTML bytes, or a
    ``file://`` path; a network URL raises (no network here, matching
    the reference without weasyprint installed).
    """
    from doctr_ray.functions.html_extract import extract_main_content

    from .pdftext import make_simple_pdf

    if isinstance(src, bytes):
        src = src.decode("utf-8", "replace")
    if src.startswith(("http://", "https://")):
        src = fetch_url(src).decode("utf-8", "replace")
    if src.startswith(FILE_PREFIX):
        with open(src[len(FILE_PREFIX):], encoding="utf-8") as f:
            src = f.read()
    text = extract_main_content(src)
    # greedy wrap at ~80 chars; 46 lines/page fits the 12pt/14-leading
    # layout inside the 792pt media box, so long documents paginate
    lines: list[str] = []
    cur = ""
    for w in text.split(" "):
        if not w:
            continue
        if cur and len(cur) + 1 + len(w) > 80:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}" if cur else w
    if cur:
        lines.append(cur)
    pages = [lines[i : i + 46] for i in range(0, len(lines), 46)] or [[]]
    return make_simple_pdf(pages)


def read_raw_gray(data: bytes, height: int, width: int) -> np.ndarray:
    """Zero-copy view of raw grayscale page bytes (the engine's internal
    page encoding; see pipelines/ocr.PAGES_SCHEMA)."""
    return np.frombuffer(data, dtype=np.uint8).reshape(height, width)


def docs_source(path: str, columns: list[str] | None = None):
    """Read a docs table (doc_id, spans) from Lance or Parquet.

    The north-rule input is a Lance table; this container has no
    ``lance``/``pylance`` wheel, so the Lance branch is import-guarded —
    on a real cluster ``ray.data.read_lance`` streams fragments with
    column pruning exactly like the parquet branch does row groups.
    """
    import ray.data as rd

    if path.endswith(".lance") or path.endswith(".lance/"):
        try:
            import lance  # noqa: F401

            return rd.read_lance(path, columns=columns)
        except ImportError as e:
            raise NotImplementedError(
                "Lance support requires the 'lance' package (not in this "
                "container); use the parquet mirror of the table"
            ) from e
    return rd.read_parquet(path, columns=columns)


def rasterize_media(media_ref: str) -> list[PageGT]:
    """Dispatch a media_ref to its reader (DocumentFile analog).

    synth:// -> deterministic in-repo renderer (fully implemented);
    anything else -> the matching stub above.
    """
    if media_ref.startswith(SYNTH_PREFIX):
        return rasterize_synth(media_ref)
    if media_ref.startswith(FILE_PREFIX) and media_ref.lower().endswith(".pdf"):
        # scanned-image PDF: page images embedded as DCTDecode (JPEG) or
        # FlateDecode XObjects decode with the in-repo codecs — the
        # copier-output case rasterizes for real (sources/pdfimage);
        # font-rendered PDFs rasterize their embedded TrueType or
        # bare-CFF/Type1C glyphs (sources/pdffont, sources/cfffont);
        # PDFs needing Type0/vector content still need pypdfium2
        from .pdfimage import extract_pdf_page_images

        with open(media_ref[len(FILE_PREFIX) :], "rb") as f:
            data = f.read()
        images = extract_pdf_page_images(data)
        if images:
            return [PageGT(image=to_gray(img), words=[]) for img in images]
        from .pdffont import rasterize_truetype_pdf

        try:
            images = rasterize_truetype_pdf(data)
        except NotImplementedError:
            images = []
        if images:
            return [PageGT(image=to_gray(img), words=[]) for img in images]
        read_pdf(media_ref)
    if media_ref.lower().endswith(".pdf") or media_ref.startswith("pdf://"):
        read_pdf(media_ref)
    if media_ref.startswith("http://") or media_ref.startswith("https://"):
        # the TEXT path handles URLs end-to-end (fetch_url -> DOM
        # main-content -> text-layer PDF; pipelines/ocr
        # media_to_ocr_span short-circuits them the same way) —
        # RASTERIZING a web page needs a browser layout engine
        fetch_url(media_ref)  # reachability first: unreachable -> ConnectionError
        raise NotImplementedError(
            "web-page rasterization requires a browser engine; URL media "
            "is handled on the text path (read_html / media_to_ocr_span)"
        )
    if media_ref.startswith("video://"):
        # real VIDEO on disk (animated GIF / AVI DIB / AVI MJPG): every
        # decoded frame becomes a page — the multi-page-media analog of
        # the PDF branch (a file://*.gif ref keeps the still-image
        # first-frame contract; the explicit scheme opts into frames)
        from ..functions.multimodal import decode_video_real

        with open(media_ref[len("video://") :], "rb") as f:
            data = f.read()
        return [
            PageGT(image=to_gray(frame), words=[])
            for frame in decode_video_real(data)
        ]
    if media_ref.startswith(FILE_PREFIX):
        # real encoded image on disk (PNG/BMP/PNM/...): decode, fold to
        # the engine's grayscale page frame; no ground truth attaches.
        # Multi-page TIFFs (the fax / scanner-batch IFD chain) return
        # ONE PAGE PER IFD — like the PDF branch; single-IFD files are
        # unchanged.
        with open(media_ref[len(FILE_PREFIX) :], "rb") as f:
            data = f.read()
        if data[:4] in (b"II*\x00", b"MM\x00*"):
            from .imagecodec import decode_tiff_pages

            return [
                PageGT(image=to_gray(img), words=[])
                for img in decode_tiff_pages(data)
            ]
        return [PageGT(image=to_gray(read_image(data)), words=[])]
    raise ValueError(
        f"unsupported media_ref {media_ref!r}: expected synth://, "
        "synthhtml://, file://<png|bmp|pnm>, video://, pdf://, or "
        "http(s)://"
    )
