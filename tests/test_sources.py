"""Reader dispatch contracts: docs_source parquet/lance branch parity,
stubbed real-format readers."""

import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doctr_ray.sources.readers import docs_source, rasterize_media, read_pdf


def test_docs_source_parquet(ray_session, tmp_path):
    t = pa.table({"doc_id": ["a", "b"], "text": ["x words", "y words"]})
    pq.write_table(t, tmp_path / "docs.parquet")
    ds = docs_source(str(tmp_path / "docs.parquet"), columns=["doc_id"])
    assert ds.schema().names == ["doc_id"]
    assert ds.count() == 2


def test_docs_source_lance_guarded(ray_session):
    # without the lance wheel the branch must fail loudly with the
    # dependency named, not fall through to a wrong reader
    with pytest.raises(NotImplementedError, match="[Ll]ance"):
        docs_source("/some/table.lance")


def test_docs_source_lance_branch_parity(ray_session, tmp_path, monkeypatch):
    """Contract: the lance branch routes through ray.data.read_lance
    with the SAME column pruning, and yields the same rows as the
    parquet branch on an identical table (stand-in module — the real
    wheel is absent in this container)."""
    import ray.data as rd

    t = pa.table({"doc_id": ["a", "b"], "text": ["x words", "y words"]})
    pq.write_table(t, tmp_path / "docs.parquet")

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    called = {}

    def fake_read_lance(path, columns=None):
        called["args"] = (path, columns)
        return rd.read_parquet(str(tmp_path / "docs.parquet"), columns=columns)

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)

    cols = ["doc_id", "text"]
    rows_l = sorted(
        docs_source(str(tmp_path / "docs.lance"), columns=cols).take_all(),
        key=lambda r: r["doc_id"],
    )
    rows_p = sorted(
        docs_source(str(tmp_path / "docs.parquet"), columns=cols).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert rows_l == rows_p
    assert called["args"] == (str(tmp_path / "docs.lance"), cols)


def test_real_format_stubs_name_their_dependency():
    # PDF rasterization and JPEG still need native decoders; PNG/BMP/PNM
    # are REAL now (tests/test_imagecodec.py) — only genuinely
    # library-bound formats may stub, and each names its dependency
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        read_pdf("/some/file.pdf")
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        rasterize_media("pdf://whatever")
    # URL ingestion is REAL (stdlib urllib; tests/test_url_ingest.py) —
    # an unreachable host raises the no-external-route constraint
    with pytest.raises(ConnectionError, match="no external network route"):
        rasterize_media("https://example.invalid/page")
    # baseline AND progressive JPEG decode for real now
    # (tests/test_jpegcodec.py); only arithmetic/lossless still stub
    import struct

    from doctr_ray.sources.imagecodec import decode_image

    sof9 = (
        b"\xff\xc9" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="cv2 or PIL"):
        decode_image(b"\xff\xd8" + sof9 + b"\xff\xd9")
    with pytest.raises(ValueError, match="unsupported media_ref"):
        rasterize_media("something.png")


def test_rasterize_media_synth_branch():
    from doctr_ray.media import encode_media_ref

    pages = rasterize_media(encode_media_ref("hello world"))
    assert len(pages) == 1 and pages[0].image.ndim == 2


def test_read_html_pdf_roundtrip(tmp_path):
    """HTML -> PDF bytes -> text layer round-trips the DOM main content
    (reference io/html.py contract with the render swapped for the
    text-layer analog)."""
    from doctr_ray.functions.html_extract import extract_main_content
    from doctr_ray.sources.pdftext import extract_pdf_text
    from doctr_ray.sources.readers import read_html

    html = (
        "<html><body><nav><a href='/'>home</a> <a href='/x'>nav link "
        "row</a></nav><div id='main'><p>"
        + " ".join(f"word{i}" for i in range(300))
        + "</p></div></body></html>"
    )
    pdf = read_html(html)
    assert pdf.startswith(b"%PDF")
    pages = extract_pdf_text(pdf)
    joined = " ".join(" ".join(p.split()) for p in pages).strip()
    assert joined == extract_main_content(html)

    # file:// path variant
    f = tmp_path / "page.html"
    f.write_text(html)
    assert read_html(f"file://{f}") == pdf

    # long documents paginate (46 lines/page)
    big = "<html><body><p>" + " ".join(
        f"tok{i}" for i in range(3000)
    ) + "</p></body></html>"
    assert len(extract_pdf_text(read_html(big))) > 1

    import pytest as _pytest

    with _pytest.raises(ConnectionError, match="no external network route"):
        read_html("https://example.invalid/a")
