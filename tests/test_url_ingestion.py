"""Network-free URL ingestion contract (VERDICT r4 #7): a local
http.server fixture exercises the http(s) branch of read_html /
from_url / media_to_ocr_span end-to-end — fetch, DOM main-content
extraction, text-layer PDF composition, and the PDF round-trip —
without any external network. Unreachable hosts raise a
ConnectionError naming the real constraint (no external route), not
the old weasyprint message."""

import http.server
import threading

import numpy as np
import pytest

HTML_DOC = """<!doctype html>
<html><head><title>t</title><style>body {color: red}</style></head>
<body>
  <nav>skip this chrome</nav>
  <main>
    <h1>Quarterly Report</h1>
    <p>Revenue grew nine percent over the prior period.</p>
    <p>Margins held steady across all segments.</p>
  </main>
  <footer>copyright footer</footer>
</body></html>"""


@pytest.fixture(scope="module")
def http_url():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = HTML_DOC.encode()
            if self.path == "/missing":
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/page.html"
    server.shutdown()


def test_fetch_url_roundtrip(http_url):
    from doctr_ray.sources.readers import fetch_url

    body = fetch_url(http_url)
    assert b"Quarterly Report" in body


def test_from_url_pdf_roundtrip(http_url):
    """DocumentFile.from_url analog: URL -> text-layer PDF whose
    extracted text is the DOM main content (nav/footer stripped)."""
    from doctr_ray.functions.html_extract import extract_main_content
    from doctr_ray.sources.pdftext import extract_pdf_text
    from doctr_ray.sources.readers import from_url

    pdf = from_url(http_url)
    assert pdf.startswith(b"%PDF")
    text = " ".join(extract_pdf_text(pdf))
    want = extract_main_content(HTML_DOC)
    assert " ".join(text.split()) == " ".join(want.split())
    assert "Quarterly Report" in text
    assert "chrome" not in text and "footer" not in text


def test_media_to_ocr_span_url_branch(http_url):
    from doctr_ray.functions.html_extract import extract_main_content
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    text, conf = media_to_ocr_span(
        "d0", http_url, 0, GlyphRecognizer(), False, False, False
    )
    assert text == extract_main_content(HTML_DOC)
    assert conf == 1.0


def test_unreachable_url_names_the_constraint():
    from doctr_ray.sources.readers import fetch_url

    # a reserved-by-RFC-5737 address: guaranteed unroutable
    with pytest.raises(ConnectionError, match="network route"):
        fetch_url("http://192.0.2.1/page.html", timeout=0.3)


def test_rasterize_media_url_names_text_path(http_url):
    from doctr_ray.sources.readers import rasterize_media

    with pytest.raises(NotImplementedError, match="text path"):
        rasterize_media(http_url)


def test_fused_worker_url_media(http_url, ray_session):
    """A docs row whose media span is a live URL flows through the
    fused OcrDocWorker like any other media kind."""
    import pyarrow as pa
    import ray

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.functions.html_extract import extract_main_content
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    spans = [
        [
            {"kind": "text", "text": "intro words", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": http_url, "offset": 1},
        ]
    ]
    table = pa.Table.from_arrays(
        [pa.array(["u1"], pa.string()), pa.array(spans, SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(ray.data.from_arrow(table), n_docs=1).to_pandas()
    assert out.loc[0, "full_text"] == "intro words " + extract_main_content(HTML_DOC)
