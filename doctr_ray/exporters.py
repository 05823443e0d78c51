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

_MD_ESCAPE = str.maketrans({c: f"\\{c}" for c in "\\`*_[]|#<>"})
_MD_LINE_MARKERS = set("-+>#=`")


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
    """Escape markdown control characters — the reference's exact set
    (io/exporters.py:65 _MD_SPECIAL_CHARS)."""
    return text.translate(_MD_ESCAPE)


def _md_line(line: str) -> str:
    """Neutralize a line that would start a markdown list/quote/heading,
    or an ordinal line like '1.' (MarkdownExporter.finalize_line,
    reference io/exporters.py:449-453)."""
    stripped = line.lstrip()
    if stripped and (
        stripped[0] in _MD_LINE_MARKERS or stripped.split(" ")[0].rstrip(".").isdigit()
    ):
        return f"\\{line}" if line[0] != "\\" else line
    return line


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


def escape_html(text: str) -> str:
    """HTML-escape &, <, > (HTMLExporter.escape_text,
    reference io/exporters.py:532-533 — quote chars stay literal)."""
    from html import escape as _html_escape

    return _html_escape(text, quote=False)


def render_html(
    page_export: dict,
    layout: list[dict] | None = None,
    tables: list[dict] | None = None,
    **kw,
) -> str:
    """Semantic-HTML rendering in reading order (HTMLExporter,
    reference io/exporters.py:512-609): h1/h2 headings, <ul> list
    groups, <p> paragraphs with <br>-joined visual lines, <table>
    grids — byte-identical to the reference exporter (differential
    test executes it directly)."""
    return export_page_as(page_export, "html", layout=layout, tables=tables, **kw)


def _flat_geom(geom) -> tuple[float, float, float, float]:
    """Accept both this engine's flat [x0,y0,x1,y1] geometry and the
    reference export's nested ((x0,y0),(x1,y1)) form."""
    if len(geom) == 2:
        (x0, y0), (x1, y1) = geom
        return float(x0), float(y0), float(x1), float(y1)
    x0, y0, x1, y1 = geom
    return float(x0), float(y0), float(x1), float(y1)


def render_hocr(
    page_export: dict,
    page_shape: tuple[int, int] | None = None,
    page_idx: int | None = None,
    file_title: str = "docTR - XML export (hOCR)",
    direction: str = "auto",
    with_reading_order: bool = True,
    layout: list[dict] | None = None,
    tables: list[dict] | None = None,
    ocr_system: str = "doctr_ray",
) -> str:
    """hOCR 1.2 rendering of one page — byte-identical to the reference
    XMLExporter.export_page (io/exporters.py:643-790) modulo the
    ``ocr_system`` meta string (the reference stamps its own package
    version there; the differential test pins the full bytes by passing
    the reference's string).

    Geometry converts from relative coords back to absolute pixels of
    ``page_shape`` = (height, width) (defaults to the export's
    ``dimensions``); content is linearized in reading order like every
    other exporter.
    """
    from xml.etree import ElementTree as ET
    from xml.etree.ElementTree import Element as ETElement
    from xml.etree.ElementTree import SubElement

    h, w = page_shape if page_shape is not None else page_export["dimensions"]
    pi = page_idx if page_idx is not None else page_export.get("page_idx", 0)
    lang_val = (page_export.get("language") or {}).get("value")
    language = lang_val if isinstance(lang_val, str) and lang_val else "en"

    def bbox(geom) -> str:
        x0, y0, x1, y1 = _flat_geom(geom)
        return (
            f"bbox {int(round(x0 * w))} {int(round(y0 * h))} "
            f"{int(round(x1 * w))} {int(round(y1 * h))}"
        )

    root = ETElement("html", attrib={"xmlns": "http://www.w3.org/1999/xhtml", "xml:lang": language})
    head = SubElement(root, "head")
    SubElement(head, "title").text = file_title
    SubElement(head, "meta", attrib={"http-equiv": "Content-Type", "content": "text/html; charset=utf-8"})
    SubElement(head, "meta", attrib={"name": "ocr-system", "content": ocr_system})
    SubElement(
        head,
        "meta",
        attrib={"name": "ocr-capabilities", "content": "ocr_page ocr_carea ocr_par ocr_line ocrx_word"},
    )
    body = SubElement(root, "body")
    page_div = SubElement(
        body,
        "div",
        attrib={
            "class": "ocr_page",
            "id": f"page_{pi + 1}",
            "title": f"image; bbox 0 0 {w} {h}; ppageno 0",
        },
    )

    auto = direction == "auto"
    if with_reading_order:
        items, resolved = page_reading_order(page_export, layout, tables, direction)
    else:
        items = [("lines", list(b["lines"]), "") for b in page_export.get("blocks", [])]
        items += [("table", t) for t in (tables or [])]
        resolved = direction if not auto else "ltr"

    block_count = line_count = word_count = table_count = 1
    for item in items:
        if item[0] == "table":
            table_count = _hocr_add_table(page_div, item[1], w, h, table_count, bbox)
            continue
        _, seg_lines, _label = item
        seg_geoms = [_flat_geom(ln["geometry"]) for ln in seg_lines]
        gx0 = min(g[0] for g in seg_geoms)
        gy0 = min(g[1] for g in seg_geoms)
        gx1 = max(g[2] for g in seg_geoms)
        gy1 = max(g[3] for g in seg_geoms)
        block_bbox = bbox([gx0, gy0, gx1, gy1])
        block_div = SubElement(
            page_div, "div",
            attrib={"class": "ocr_carea", "id": f"block_{block_count}", "title": block_bbox},
        )
        paragraph = SubElement(
            block_div, "p",
            attrib={"class": "ocr_par", "id": f"par_{block_count}", "title": block_bbox},
        )
        block_count += 1
        for line in seg_lines:
            line_span = SubElement(
                paragraph, "span",
                attrib={
                    "class": "ocr_line",
                    "id": f"line_{line_count}",
                    "title": (
                        f"{bbox(line['geometry'])}; "
                        "baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0"
                    ),
                },
            )
            line_count += 1
            for word in ordered_line_words(line, resolved, auto):
                word_div = SubElement(
                    line_span, "span",
                    attrib={
                        "class": "ocrx_word",
                        "id": f"word_{word_count}",
                        "title": (
                            f"{bbox(word['geometry'])}; "
                            f"x_wconf {int(round(float(word.get('confidence', 0.0)) * 100))}"
                        ),
                    },
                )
                word_div.text = word["value"]
                word_count += 1
    return ET.tostring(root, encoding="utf-8", method="xml").decode("utf-8")


def _hocr_add_table(page_div, table: dict, w: int, h: int, table_count: int, bbox) -> int:
    """Serialize one recognized table dict (needs 'geometry' and
    'cells' rows with value/row/col/geometry/confidence) as an hOCR
    area, one ocr_line per row (reference io/exporters.py:668-721)."""
    from xml.etree.ElementTree import SubElement

    cells = table.get("cells")
    if cells is None:
        return table_count  # grid-only table dicts carry no cell geometry
    table_bbox = bbox(table["geometry"])
    table_div = SubElement(
        page_div, "div",
        attrib={"class": "ocr_carea", "id": f"table_{table_count}", "title": table_bbox},
    )
    paragraph = SubElement(
        table_div, "p",
        attrib={"class": "ocr_par", "id": f"table_par_{table_count}", "title": table_bbox},
    )
    rows: dict[int, list[dict]] = {}
    for cell in cells:
        rows.setdefault(int(cell["row"]), []).append(cell)
    for row_idx in sorted(rows):
        row_cells = sorted(rows[row_idx], key=lambda c: int(c["col"]))
        geoms = [_flat_geom(c["geometry"]) for c in row_cells]
        row_bbox = bbox([
            min(g[0] for g in geoms), min(g[1] for g in geoms),
            max(g[2] for g in geoms), max(g[3] for g in geoms),
        ])
        line_span = SubElement(
            paragraph, "span",
            attrib={
                "class": "ocr_line",
                "id": f"table_{table_count}_row_{row_idx + 1}",
                "title": f"{row_bbox}; baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0",
            },
        )
        for col_idx, cell in enumerate(row_cells):
            cell_span = SubElement(
                line_span, "span",
                attrib={
                    "class": "ocrx_word",
                    "id": f"table_{table_count}_cell_{row_idx + 1}_{col_idx + 1}",
                    "title": (
                        f"{bbox(cell['geometry'])}; "
                        f"x_wconf {int(round(float(cell.get('confidence', 0.0)) * 100))}"
                    ),
                },
            )
            cell_span.text = cell["value"]
    return table_count + 1


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
    "html": "<hr>",           # reference Document.export_as_html default
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
        v = escape_markdown(v) if escape else v.replace("|", "\\|")
        return v.replace("\n", " ").strip()

    header = "| " + " | ".join(cell(v) for v in grid[0]) + " |"
    sep = "| " + " | ".join("---" for _ in grid[0]) + " |"
    rows = ["| " + " | ".join(cell(v) for v in row) + " |" for row in grid[1:]]
    return "\n".join([header, sep, *rows])


def ordered_line_words(line: dict, direction: str = "ltr", auto: bool = False) -> list[dict]:
    """A line's words in LOGICAL order (ordered_line_words +
    _line_render_direction, reference io/exporters.py:219-250): stored
    order for ltr, by descending x-center for rtl, by y-center for
    vertical; with ``auto``, each horizontal line's base direction is
    re-detected from its own text (an embedded ltr run on an rtl page
    keeps its natural word order)."""
    words = list(line.get("words", []))
    d = direction
    if d not in ("ttb-rtl", "ttb-ltr") and auto and len(words) > 1:
        from .reading_order import detect_text_direction

        d = detect_text_direction([w["value"] for w in words])
    if d in ("ttb-rtl", "ttb-ltr"):
        return sorted(words, key=lambda w: (_flat_geom(w["geometry"])[1] + _flat_geom(w["geometry"])[3]) / 2)
    if d == "rtl":
        return sorted(words, key=lambda w: -(_flat_geom(w["geometry"])[0] + _flat_geom(w["geometry"])[2]) / 2)
    return words


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

    auto = direction == "auto"
    items, resolved = page_reading_order(page_export, layout, tables, direction)
    esc = spec["escape"] if escape else (lambda t: t)
    finalize = spec.get("finalize", lambda t: t)
    list_wrap = spec.get("list_wrap", "\n".join)
    para = spec.get("para")
    parts: list[str] = []
    bullets: list[str] = []

    def flush() -> None:
        if bullets:
            parts.append(list_wrap(bullets))
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
            " ".join(esc(w["value"]) for w in ordered_line_words(ln, resolved, auto))
            for ln in seg_lines
        ]
        line_texts = [t for t in line_texts if t.strip()]
        if not line_texts:
            continue
        if label in spec["headings"]:
            flush()
            h = spec["headings"][label]
            text = " ".join(line_texts)
            parts.append(h(text) if callable(h) else h + text)
        elif label in _LIST_ROLES:
            text = " ".join(line_texts)
            bullets.append(spec["bullet"](finalize(text) if escape else text))
        else:
            flush()
            final_lines = [finalize(t) if escape else t for t in line_texts]
            parts.append(para(final_lines) if para else "\n".join(final_lines))
    flush()
    return spec.get("block_break", "\n\n").join(parts)


def render_html_table(grid: list[list[str]], escape: bool = True) -> str:
    """HTML table from a logical grid, first row as header
    (HTMLExporter.render_table, reference io/exporters.py:586-597)."""
    if not grid or not grid[0]:
        return ""

    def _cell(value: str, tag: str) -> str:
        content = escape_html(value) if escape else value
        return f"<{tag}>{content.strip()}</{tag}>"

    head = "<tr>" + "".join(_cell(v, "th") for v in grid[0]) + "</tr>"
    body = "\n".join(
        "<tr>" + "".join(_cell(v, "td") for v in row) + "</tr>" for row in grid[1:]
    )
    return f"<table>\n{head}\n{body}\n</table>" if body else f"<table>\n{head}\n</table>"


_MD_SPEC = {
    "headings": _MD_HEADINGS,
    "bullet": lambda t: "- " + t,
    "escape": escape_markdown,
    "finalize": _md_line,
    "table": render_markdown_table,
    "page_break": "\n\n---\n\n",
    "class_header": lambda c: f"**{c}**",
}
_ADOC_SPEC = {
    "headings": {"title": "== ", "section_header": "=== "},
    "bullet": lambda t: "* " + t,
    "escape": escape_asciidoc,
    "finalize": _adoc_line,
    "table": lambda grid, escape=True: render_asciidoc_table(grid),
    "page_break": "\n\n<<<\n\n",
    "class_header": lambda c: f"*{c}*",
}
_HTML_SPEC = {
    # reference HTMLExporter (io/exporters.py:512-609): h1/h2 headings,
    # <ul><li> list groups, <p> paragraphs with <br>-joined lines,
    # blocks joined by a newline, pages by <hr>
    "headings": {
        "title": lambda t: f"<h1>{t}</h1>",
        "section_header": lambda t: f"<h2>{t}</h2>",
    },
    "bullet": lambda t: f"<li>{t}</li>",
    "list_wrap": lambda items: "<ul>\n" + "\n".join(items) + "\n</ul>",
    "para": lambda lines: "<p>" + "<br>\n".join(lines) + "</p>",
    "escape": lambda t: escape_html(t),
    "table": render_html_table,
    "block_break": "\n",
    "page_break": "<hr>",
    "class_header": lambda c: f"<h3>{c}</h3>",
}
_SPECS = {
    "markdown": _MD_SPEC,
    "md": _MD_SPEC,
    "asciidoc": _ADOC_SPEC,
    "adoc": _ADOC_SPEC,
    "html": _HTML_SPEC,
}


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
        items = [spec["bullet"](spec["escape"](preds[i]["value"])) for i in order]
        values = spec.get("list_wrap", "\n".join)(items)
        sep = "\n" if fmt == "html" else "\n\n"
        parts.append(f"{spec['class_header'](class_name)}{sep}{values}")
    return ("\n" if fmt == "html" else "\n\n").join(parts)


def render_kie_hocr(
    predictions: dict[str, list[dict]],
    page_shape: tuple[int, int],
    page_idx: int = 0,
    language: str | None = None,
    direction: str = "auto",
    with_reading_order: bool = True,
    file_title: str = "docTR - XML export (hOCR)",
    ocr_system: str = "doctr_ray",
) -> str:
    """KIE page as hOCR XML — byte-identical to the reference
    XMLExporter.export_kie_page (io/exporters.py:792-870) modulo the
    ``ocr_system`` meta string: each prediction becomes its own
    carea/par/line/word nest (PDF/A-compatible single-word areas), the
    predictions of each class sorted in reading order."""
    from xml.etree import ElementTree as ET
    from xml.etree.ElementTree import Element as ETElement
    from xml.etree.ElementTree import SubElement

    from .reading_order import ReadingOrderPredictor

    h, w = page_shape
    root = ETElement("html", attrib={"xmlns": "http://www.w3.org/1999/xhtml", "xml:lang": language or "en"})
    head = SubElement(root, "head")
    SubElement(head, "title").text = file_title
    SubElement(head, "meta", attrib={"http-equiv": "Content-Type", "content": "text/html; charset=utf-8"})
    SubElement(head, "meta", attrib={"name": "ocr-system", "content": ocr_system})
    SubElement(
        head,
        "meta",
        attrib={"name": "ocr-capabilities", "content": "ocr_page ocr_carea ocr_par ocr_line ocrx_word"},
    )
    body = SubElement(root, "body")
    SubElement(
        body,
        "div",
        attrib={
            "class": "ocr_page",
            "id": f"page_{page_idx + 1}",
            "title": f"image; bbox 0 0 {w} {h}; ppageno 0",
        },
    )

    def bbox(geom) -> str:
        x0, y0, x1, y1 = _flat_geom(geom)
        return (
            f"bbox {int(round(x0 * w))} {int(round(y0 * h))} "
            f"{int(round(x1 * w))} {int(round(y1 * h))}"
        )

    count = 1
    order_fn = ReadingOrderPredictor(direction=direction)
    for class_name, preds in predictions.items():
        if with_reading_order and len(preds) >= 2:
            order = order_fn(
                [p["geometry"] for p in preds],
                texts=[p["value"] for p in preds],
                language=language,
                page_shape=page_shape,
            )
            ordered = [preds[i] for i in order]
        else:
            ordered = list(preds)
        for p in ordered:
            pb = bbox(p["geometry"])
            area = SubElement(
                body, "div",
                attrib={"class": "ocr_carea", "id": f"{class_name}_prediction_{count}", "title": pb},
            )
            par = SubElement(
                area, "p",
                attrib={"class": "ocr_par", "id": f"{class_name}_par_{count}", "title": pb},
            )
            line = SubElement(
                par, "span",
                attrib={
                    "class": "ocr_line",
                    "id": f"{class_name}_line_{count}",
                    "title": f"{pb}; baseline 0 0; x_size 0; x_descenders 0; x_ascenders 0",
                },
            )
            word = SubElement(
                line, "span",
                attrib={
                    "class": "ocrx_word",
                    "id": f"{class_name}_word_{count}",
                    "title": f"{pb}; x_wconf {int(round(float(p.get('confidence', 0.0)) * 100))}",
                },
            )
            word.text = p["value"]
            count += 1
    return ET.tostring(root, encoding="utf-8", method="xml").decode("utf-8")
