"""North-rule integration: ONE interleaved document mixing every media
kind the engine supports — native text, synth raster pages, a web page,
a digital PDF with a native text layer, and a lossy JPEG scan — must
reconstruct its exact text through the fused pipeline."""

import pyarrow as pa
import ray.data as rd

from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
from doctr_ray.media import encode_html_media_ref, encode_media_ref, rasterize_synth
from doctr_ray.pipelines.ocr import ocr_extracted_text
from doctr_ray.sources.jpegcodec import encode_jpeg
from doctr_ray.sources.pdftext import make_simple_pdf


def test_all_media_kinds_in_one_document(ray_session, tmp_path):
    native = "native text opens the document"
    raster_text = "raster page words recovered by detection and recognition"
    html_text = "main content extracted from the web page"
    pdf_text = "digital pdf native layer read without ocr"
    jpeg_text = "scanned page survives a lossy jpeg cycle"

    raster_ref = encode_media_ref(raster_text, 640, 480)
    html_ref = encode_html_media_ref(html_text, doc_seed="m1")

    pdf_path = tmp_path / "doc.pdf"
    pdf_path.write_bytes(make_simple_pdf([[pdf_text]]))

    jpg_page = rasterize_synth(encode_media_ref(jpeg_text, 640, 480))[0]
    jpg_path = tmp_path / "scan.jpg"
    jpg_path.write_bytes(encode_jpeg(jpg_page.image, quality=95))

    spans = [
        {"kind": "text", "text": native, "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": raster_ref, "offset": 100},
        {"kind": "media", "text": "", "media_ref": html_ref, "offset": 200},
        {"kind": "media", "text": "", "media_ref": f"file://{pdf_path}", "offset": 300},
        {"kind": "media", "text": "", "media_ref": f"file://{jpg_path}", "offset": 400},
    ]
    t = pa.Table.from_arrays(
        [pa.array(["mixed-doc"], pa.string()), pa.array([spans], SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t)).to_pandas()
    assert len(out) == 1
    expected = " ".join([native, raster_text, html_text, pdf_text, jpeg_text])
    assert out["full_text"][0] == expected
