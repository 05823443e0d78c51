"""Exporters: page/document renderings from built page exports.

Re-expressed from the reference's exporter family (reference:
io/exporters.py — TextExporter :416-433, MarkdownExporter :436-471,
HTMLExporter :512-609, XMLExporter/hOCR :643-908; Document.render()
:1187-1197). All are stateless per-page string formatting, run as plain
``map_batches`` task stages over assembled span/page rows.

The input shape is the builder's export dict
(:class:`doctr_ray.builder.BuiltPage`.export — blocks -> lines -> words,
geometry in relative coords), matching the reference's
``Page.export()`` (io/elements.py:424-512).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

_MD_ESCAPE = str.maketrans({c: f"\\{c}" for c in r"\`*_{}[]()#+-.!"})


def render_text(page_export: dict, word_sep: str = " ", line_sep: str = "\n", block_sep: str = "\n\n") -> str:
    """Plain-text rendering (render() analog, io/exporters.py:1187-1197)."""
    blocks = []
    for block in page_export.get("blocks", []):
        lines = [
            word_sep.join(w["value"] for w in line["words"]) for line in block["lines"]
        ]
        blocks.append(line_sep.join(lines))
    return block_sep.join(blocks)


def escape_markdown(text: str) -> str:
    """Escape markdown control characters (io/exporters.py:63-68)."""
    return text.translate(_MD_ESCAPE)


def render_markdown(page_export: dict) -> str:
    """Markdown rendering: one paragraph per block
    (MarkdownExporter, io/exporters.py:436-471)."""
    paras = []
    for block in page_export.get("blocks", []):
        lines = [
            " ".join(escape_markdown(w["value"]) for w in line["words"])
            for line in block["lines"]
        ]
        paras.append("\n".join(lines))
    return "\n\n".join(paras)


def render_html(page_export: dict) -> str:
    """Minimal HTML rendering (HTMLExporter, io/exporters.py:512-609)."""
    parts = ["<div class='page'>"]
    for block in page_export.get("blocks", []):
        parts.append("<p>")
        for line in block["lines"]:
            parts.append(escape(" ".join(w["value"] for w in line["words"])))
            parts.append("<br/>")
        if parts[-1] == "<br/>":
            parts.pop()
        parts.append("</p>")
    parts.append("</div>")
    return "".join(parts)


def render_hocr(page_export: dict, page_shape: tuple[int, int], page_idx: int = 0) -> str:
    """hOCR 1.2 rendering of one page (XMLExporter, io/exporters.py:643-908).

    Geometry is converted from relative coords back to absolute pixels
    of ``page_shape`` = (height, width).
    """
    h, w = page_shape

    def bbox(geom: list[float]) -> str:
        x0, y0, x1, y1 = geom
        return f"bbox {round(x0 * w)} {round(y0 * h)} {round(x1 * w)} {round(y1 * h)}"

    out = [
        f"<div class='ocr_page' id='page_{page_idx + 1}' title='image; bbox 0 0 {w} {h}; ppageno {page_idx}'>"
    ]
    li = 0
    wi = 0
    for bi, block in enumerate(page_export.get("blocks", [])):
        out.append(
            f"<div class='ocr_carea' id='block_{bi + 1}' title='{bbox(block['geometry'])}'>"
        )
        for line in block["lines"]:
            li += 1
            out.append(
                f"<span class='ocr_line' id='line_{li}' title='{bbox(line['geometry'])}'>"
            )
            for word in line["words"]:
                wi += 1
                conf = round(100 * float(word.get("confidence", 0.0)))
                out.append(
                    f"<span class='ocrx_word' id='word_{wi}' "
                    f"title='{bbox(word['geometry'])}; x_wconf {conf}'>"
                    f"{escape(word['value'])}</span>"
                )
            out.append("</span>")
        out.append("</div>")
    out.append("</div>")
    return "".join(out)
