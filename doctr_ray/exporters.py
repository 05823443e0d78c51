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


# ------------------------------------------------------------ AsciiDoc

# characters carrying AsciiDoc structural meaning (reference
# io/exporters.py:67-68)
_ADOC_SPECIAL = set("\\`*_#^~|+{}<>")
_ADOC_LINE_MARKERS = set("=*.-/+")
_ADOC_HEADINGS = {"title": "== ", "section_header": "=== "}
_LIST_LABELS = {"list_item"}


def escape_asciidoc(text: str) -> str:
    """Backslash-escape AsciiDoc structural characters
    (AsciiDocExporter.escape_text, reference io/exporters.py:486-487)."""
    return "".join(f"\\{c}" if c in _ADOC_SPECIAL else c for c in text)


def _adoc_line(line: str) -> str:
    """Neutralize a line starting with a structural marker
    (finalize_line, reference io/exporters.py:489-493)."""
    stripped = line.lstrip()
    if stripped and stripped[0] in _ADOC_LINE_MARKERS:
        return "{empty}" + line
    return line


def render_asciidoc_table(grid: list[list[str]]) -> str:
    """AsciiDoc table from a logical grid, first row as header
    (reference io/exporters.py:494-507)."""
    if not grid or not grid[0]:
        return ""

    def _row(row: list[str]) -> str:
        return " ".join(
            "|" + escape_asciidoc(v).replace("\n", " ").strip() for v in row
        )

    return "\n".join(["|===", _row(grid[0]), "", *[_row(r) for r in grid[1:]], "|==="])


def render_asciidoc(
    page_export: dict,
    labels: list[str] | None = None,
    block_break: str = "\n\n",
) -> str:
    """AsciiDoc rendering: one paragraph per block; Title/Section-header
    labeled blocks become headings, list items become bullets
    (AsciiDocExporter, reference io/exporters.py:474-509 over the
    _PageTextExporter walk :278-372)."""
    from .reading_order import normalize_layout_label

    parts: list[str] = []
    bullets: list[str] = []

    def _flush() -> None:
        if bullets:
            parts.append("\n".join(bullets))
            bullets.clear()

    blocks = page_export.get("blocks", [])
    for bi, block in enumerate(blocks):
        lines = [
            " ".join(escape_asciidoc(w["value"]) for w in line["words"])
            for line in block["lines"]
        ]
        lines = [ln for ln in lines if ln.strip()]
        if not lines:
            continue
        label = normalize_layout_label(labels[bi]) if labels else ""
        if label in _ADOC_HEADINGS:
            _flush()
            parts.append(_ADOC_HEADINGS[label] + " ".join(lines))
        elif label in _LIST_LABELS:
            bullets.append("* " + _adoc_line(" ".join(lines)))
        else:
            _flush()
            parts.append("\n".join(_adoc_line(ln) for ln in lines))
    _flush()
    return block_break.join(parts)


# ----------------------------------------------------- document level

PAGE_BREAKS = {
    "text": "\n\n\n\n",       # reference io/exporters.py:1187 render()
    "markdown": "\n\n---\n\n",
    "asciidoc": "\n\n<<<\n\n",
    "html": "<hr/>",
}


def render_document(page_exports: list[dict], fmt: str = "text", **kwargs) -> str:
    """Document-level rendering: per-page export joined with the
    format's page break (Document.render / export_document, reference
    io/exporters.py:1187-1197, :396-412)."""
    renderers = {
        "text": render_text,
        "markdown": render_markdown,
        "asciidoc": render_asciidoc,
        "html": render_html,
    }
    if fmt not in renderers:
        raise ValueError(f"unknown fmt: {fmt}")
    return PAGE_BREAKS[fmt].join(renderers[fmt](p, **kwargs) for p in page_exports)


# ------------------------------------------- reading-order page exports

_MD_HEADINGS = {"title": "# ", "section_header": "## "}
_LIST_ROLES = {"list_item"}


def render_markdown_table(grid: list[list[str]], escape: bool = True) -> str:
    """GitHub-style markdown table, first row as header
    (MarkdownExporter.render_table, reference io/exporters.py:456-471)."""
    if not grid or not grid[0]:
        return ""

    def cell(v: str) -> str:
        v = escape_markdown(v) if escape else v
        return v.replace("|", "\\|").replace("\n", " ").strip()

    header = "| " + " | ".join(cell(v) for v in grid[0]) + " |"
    sep = "| " + " | ".join("---" for _ in grid[0]) + " |"
    rows = ["| " + " | ".join(cell(v) for v in row) + " |" for row in grid[1:]]
    return "\n".join([header, sep, *rows])


def ordered_line_words(line: dict, direction: str) -> list[dict]:
    """A line's words in LOGICAL order: geometric left-to-right, reversed
    for rtl (ordered_line_words, reference io/exporters.py:219-250)."""
    words = sorted(line.get("words", []), key=lambda w: w["geometry"][0])
    return list(reversed(words)) if direction == "rtl" else words


def page_reading_order(
    page_export: dict,
    layout: list[dict] | None = None,
    tables: list[dict] | None = None,
    direction: str = "auto",
):
    """Order a page's lines (and tables) into labeled reading segments.

    Returns (items, resolved_direction) where each item is either
    ``("lines", [line dicts], normalized_label)`` or
    ``("table", table_dict)``. The page_reading_order analog
    (reference io/exporters.py:92-216): layout labels are assigned per
    line by area coverage, ordering and segmentation run through the
    reading-order module, floats (tables) interleave by geometry and
    never merge.
    """
    from .reading_order import (
        assign_layout_labels,
        detect_text_direction,
        normalize_layout_label,
        resolve_reading_segments,
    )

    lines = [ln for block in page_export.get("blocks", []) for ln in block["lines"]]
    tables = tables or []
    geoms = [ln["geometry"] for ln in lines] + [t["geometry"] for t in tables]
    if not geoms:
        return [], "ltr"
    if layout:
        labels = assign_layout_labels(
            [ln["geometry"] for ln in lines],
            [r["geometry"] for r in layout],
            [r["type"] for r in layout],
        )
    else:
        labels = [None] * len(lines)
    labels = list(labels) + ["Table"] * len(tables)
    if direction == "auto":
        texts = [w["value"] for ln in lines for w in ln.get("words", [])]
        resolved = detect_text_direction(texts)
    else:
        resolved = direction
    segments = resolve_reading_segments(geoms, labels=labels, direction=resolved)
    items = []
    for seg in segments:
        if seg[0] >= len(lines):  # a table (floats never merge -> alone)
            items.append(("table", tables[seg[0] - len(lines)]))
        else:
            items.append(
                ("lines", [lines[i] for i in seg], normalize_layout_label(labels[seg[0]]))
            )
    return items, resolved


def _walk_page(
    page_export: dict,
    spec: dict,
    layout: list[dict] | None,
    tables: list[dict] | None,
    direction: str,
    include_furniture: bool,
    escape: bool,
) -> str:
    """The shared exporter walk (reference _PageTextExporter.export_page,
    io/exporters.py:278-372): headings, grouped bullets, tables,
    furniture filtering."""
    from .reading_order import layout_label_role

    items, resolved = page_reading_order(page_export, layout, tables, direction)
    esc = spec["escape"] if escape else (lambda t: t)
    finalize = spec.get("finalize", lambda t: t)
    parts: list[str] = []
    bullets: list[str] = []

    def flush() -> None:
        if bullets:
            parts.append("\n".join(bullets))
            bullets.clear()

    for item in items:
        if item[0] == "table":
            flush()
            rendered = spec["table"](item[1]["grid"], escape)
            if rendered:
                parts.append(rendered)
            continue
        _, seg_lines, label = item
        role = layout_label_role(label)
        if not include_furniture and role in ("header", "footer", "footnote"):
            continue
        line_texts = [
            " ".join(esc(w["value"]) for w in ordered_line_words(ln, resolved))
            for ln in seg_lines
        ]
        line_texts = [t for t in line_texts if t.strip()]
        if not line_texts:
            continue
        if label in spec["headings"]:
            flush()
            parts.append(spec["headings"][label] + " ".join(line_texts))
        elif label in _LIST_ROLES:
            text = " ".join(line_texts)
            bullets.append(spec["bullet"] + (finalize(text) if escape else text))
        else:
            flush()
            parts.append("\n".join(finalize(t) if escape else t for t in line_texts))
    flush()
    return "\n\n".join(parts)


_MD_SPEC = {
    "headings": _MD_HEADINGS,
    "bullet": "- ",
    "escape": escape_markdown,
    "table": render_markdown_table,
    "page_break": "\n\n---\n\n",
    "class_header": lambda c: f"**{c}**",
}
_ADOC_SPEC = {
    "headings": {"title": "== ", "section_header": "=== "},
    "bullet": "* ",
    "escape": escape_asciidoc,
    "finalize": _adoc_line,
    "table": lambda grid, escape=True: render_asciidoc_table(grid),
    "page_break": "\n\n<<<\n\n",
    "class_header": lambda c: f"*{c}*",
}
_SPECS = {"markdown": _MD_SPEC, "md": _MD_SPEC, "asciidoc": _ADOC_SPEC, "adoc": _ADOC_SPEC}


def export_page_as(
    page_export: dict,
    fmt: str = "markdown",
    layout: list[dict] | None = None,
    tables: list[dict] | None = None,
    direction: str = "auto",
    include_furniture: bool = True,
    escape: bool = True,
) -> str:
    """Reading-order-aware page export (export_as_markdown /
    export_as_asciidoc, reference io/exporters.py:911-1010): layout
    labels become headings/bullets, tables interleave by geometry,
    page furniture (headers/footers/footnotes) is droppable."""
    if fmt not in _SPECS:
        raise ValueError(f"unknown fmt: {fmt}")
    return _walk_page(
        page_export, _SPECS[fmt], layout, tables, direction, include_furniture, escape
    )


def export_document_as(page_exports: list[dict], fmt: str = "markdown", page_break: str | None = None, **kw) -> str:
    """Document-level reading-order export (export_document, reference
    io/exporters.py:396-412) with the format's page break."""
    if fmt not in _SPECS:
        raise ValueError(f"unknown fmt: {fmt}")
    pb = _SPECS[fmt]["page_break"] if page_break is None else page_break
    return pb.join(export_page_as(p, fmt, **kw) for p in page_exports)


def export_kie_page_as(predictions: dict[str, list[dict]], fmt: str = "markdown") -> str:
    """KIE page export: one section per class, predictions as bullets in
    reading order (export_kie_page, reference io/exporters.py:374-394)."""
    from .reading_order import sort_reading_order

    if fmt not in _SPECS:
        raise ValueError(f"unknown fmt: {fmt}")
    spec = _SPECS[fmt]
    parts = []
    for class_name, preds in predictions.items():
        if not preds:
            continue
        order = sort_reading_order([p["geometry"] for p in preds])
        values = "\n".join(spec["bullet"] + spec["escape"](preds[i]["value"]) for i in order)
        parts.append(f"{spec['class_header'](class_name)}\n\n{values}")
    return "\n\n".join(parts)
