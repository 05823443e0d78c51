"""Element round-trips + exporter renderings (reference test_io_elements.py
/ test_io_exporters.py patterns)."""

import pytest

from doctr_ray.elements import Block, Document, Line, Page, Word
from doctr_ray.exporters import (
    escape_markdown,
    render_hocr,
    render_html,
    render_markdown,
    render_text,
)
from doctr_ray.vocabs import (
    VOCABS,
    decode_sequence,
    encode_sequences,
    encode_string,
    translate,
)


def _sample_page_export():
    return {
        "page_idx": 0,
        "dimensions": [480, 640],
        "orientation": {"value": 0, "confidence": None},
        "language": {"value": None, "confidence": None},
        "blocks": [
            {
                "geometry": [0.1, 0.1, 0.6, 0.3],
                "objectness_score": 0.9,
                "lines": [
                    {
                        "geometry": [0.1, 0.1, 0.6, 0.15],
                        "objectness_score": 0.9,
                        "words": [
                            {"value": "hello", "confidence": 1.0,
                             "geometry": [0.1, 0.1, 0.3, 0.15], "objectness_score": 0.9},
                            {"value": "world", "confidence": 0.9,
                             "geometry": [0.35, 0.1, 0.6, 0.15], "objectness_score": 0.9},
                        ],
                    },
                    {
                        "geometry": [0.1, 0.2, 0.4, 0.25],
                        "objectness_score": 0.9,
                        "words": [
                            {"value": "below", "confidence": 0.8,
                             "geometry": [0.1, 0.2, 0.4, 0.25], "objectness_score": 0.9},
                        ],
                    },
                ],
                "artefacts": [],
            }
        ],
    }


def test_page_export_roundtrip():
    p = Page.from_dict(_sample_page_export())
    exported = p.export()
    # exports are a SUPERSET of the input dict: the reference schema
    # always carries layout/tables (and crop_orientation per word) —
    # every input key must survive unchanged
    for k, v in _sample_page_export().items():
        if k == "blocks":
            continue
        assert exported[k] == v
    assert exported["layout"] == [] and exported["tables"] == []
    words = [w for b in exported["blocks"] for l in b["lines"] for w in l["words"]]
    assert all(w["crop_orientation"] == {"value": 0, "confidence": None} for w in words)
    # round-trip of the export itself is exact
    assert Page.from_dict(exported).export() == exported
    assert p.render() == "hello world\nbelow"
    doc = Document(pages=[p])
    assert Document.from_dict(doc.export()).render() == doc.render()


def test_render_text_and_markdown():
    export = _sample_page_export()
    assert render_text(export) == "hello world\nbelow"
    md = render_markdown(export)
    assert "hello world" in md
    assert escape_markdown("a*b_c") == r"a\*b\_c"


def test_render_html_escapes():
    export = _sample_page_export()
    export["blocks"][0]["lines"][0]["words"][0]["value"] = "<tag>"
    html = render_html(export)
    assert "&lt;tag&gt;" in html and "<p>" in html


def test_render_hocr_structure():
    h = render_hocr(_sample_page_export(), page_shape=(480, 640))
    assert "ocr_page" in h and "ocr_line" in h and "ocrx_word" in h
    assert "bbox 64 48 192 72" in h  # 0.1*640, 0.1*480, 0.3*640, 0.15*480
    assert "x_wconf 100" in h


def test_translate():
    assert translate("abc", "latin") == "abc"
    assert translate("héllo", "english") == "hello"  # NFD base letter fallback
    assert translate("日", "latin") == "■"


def test_encode_decode_string():
    v = VOCABS["digits"]
    assert encode_string("042", v) == [0, 4, 2]
    assert decode_sequence([0, 4, 2], v) == "042"
    with pytest.raises(ValueError):
        encode_string("abc", v)


def test_encode_sequences():
    v = VOCABS["digits"]
    out = encode_sequences(["12", "345"], v, eos=10)
    assert out.shape == (2, 4)
    assert out[0].tolist() == [1, 2, 10, 10]
    assert out[1].tolist() == [3, 4, 5, 10]
    # with sos + pad
    out2 = encode_sequences(["1"], v, eos=10, sos=11, pad=12)
    assert out2[0, 0] == 11 and out2[0, 1] == 1 and out2[0, 2] == 10


def test_render_asciidoc():
    from doctr_ray.exporters import (
        escape_asciidoc,
        render_asciidoc,
        render_asciidoc_table,
        render_document,
    )

    # escaping (reference AsciiDocExporter.escape_text fixtures)
    assert escape_asciidoc("a*b_c|d") == r"a\*b\_c\|d"
    page = {
        "blocks": [
            {"lines": [{"words": [{"value": "Big"}, {"value": "Title"}]}]},
            {"lines": [{"words": [{"value": "plain"}, {"value": "para"}]}]},
            {"lines": [{"words": [{"value": "first"}]}]},
            {"lines": [{"words": [{"value": "second"}]}]},
        ]
    }
    out = render_asciidoc(page, labels=["Title", "Text", "List-item", "List-item"])
    assert out.startswith("== Big Title")
    assert "plain para" in out
    # consecutive list items group into one bullet block
    assert "* first\n* second" in out
    # a line starting with a structural marker is neutralized
    marker = {"blocks": [{"lines": [{"words": [{"value": "=danger"}]}]}]}
    assert render_asciidoc(marker).startswith("{empty}")

    # table: first row is the header
    t = render_asciidoc_table([["Name", "Age"], ["bob", "4"]])
    assert t.splitlines()[0] == "|===" and t.splitlines()[-1] == "|==="
    assert "|Name |Age" in t and "|bob |4" in t
    assert render_asciidoc_table([]) == ""

    # document-level render joins pages with the format page break
    doc = render_document([page, page], fmt="asciidoc")
    assert "<<<" in doc
    txt = render_document([page, page], fmt="text")
    assert txt.count("\n\n\n\n") == 1
