"""HTML main-content extraction: boilerplate strip via DOM heuristics."""

import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.functions.html_extract import (
    extract_main_content,
    html_main_content,
    synthesize_html,
)


def test_extract_strips_boilerplate():
    html = synthesize_html("the actual article body with several words here", "d1")
    got = extract_main_content(html)
    assert got == "the actual article body with several words here"
    # boilerplate really was present in the page
    assert "<nav>" in html and "<footer>" in html and "buy thing" in html


def test_extract_handles_entities_and_junk():
    html = (
        "<html><body><nav><a href='/'>home</a><a href='/x'>other</a></nav>"
        "<div><p>rock &amp; roll content paragraph with enough words to win "
        "the scoring easily over the navigation</p></div>"
        "<footer>c 2020</footer></body></html>"
    )
    got = extract_main_content(html)
    assert got.startswith("rock & roll content")
    assert "home" not in got and "2020" not in got


def test_extract_malformed_html():
    assert extract_main_content("<div><p>unclosed tags galore") == "unclosed tags galore"
    assert extract_main_content("") == ""
    assert extract_main_content("no tags at all just text") == "no tags at all just text"


def test_hinted_nondrop_tag_unwinds():
    # <div class="topnav"> is hinted but div is not in _DROP_TAGS — its
    # end tag must still unwind the drop state, or everything after the
    # nav is silently discarded
    html = (
        "<html><body>"
        "<div class='topnav'><a href='/'>home</a> <a href='/x'>about</a></div>"
        "<div><p>real article prose with plenty of ordinary words to "
        "win the score</p></div>"
        "</body></html>"
    )
    got = extract_main_content(html)
    assert "real article prose" in got
    assert "home" not in got


def test_hinted_void_element_does_not_drop_rest():
    # <img class="ad-banner"> has no end tag; it must not push drop state
    html = (
        "<html><body>"
        "<img class='ad-banner' src='x.png'>"
        "<div><p>content after the ad image keeps flowing normally "
        "with enough words</p></div>"
        "</body></html>"
    )
    got = extract_main_content(html)
    assert "content after the ad image" in got


def test_unclosed_anchor_does_not_poison_link_density():
    # an <a> with no </a>, implicitly closed by its parent div's end tag,
    # must not leave link_depth stuck counting all later prose as links
    html = (
        "<html><body>"
        "<div><a href='/'>home</div>"
        "<div><p>long plain prose paragraph counted as text not links "
        "with many ordinary words here</p></div>"
        "</body></html>"
    )
    got = extract_main_content(html)
    assert "long plain prose" in got


def test_nested_samename_hinted_drop():
    # inner plain <div> end tag must not prematurely unwind the outer
    # hinted <div class="sidebar">'s drop state
    html = (
        "<html><body>"
        "<div class='sidebar'><div>inner nav junk</div><a href='/p'>promo link</a></div>"
        "<div><p>the main story text with enough ordinary words to be "
        "selected</p></div>"
        "</body></html>"
    )
    got = extract_main_content(html)
    assert "main story" in got
    assert "promo link" not in got and "inner nav junk" not in got


def test_link_dense_block_rejected():
    html = (
        "<html><body>"
        "<div><a href='1'>one</a> <a href='2'>two</a> <a href='3'>three four five six</a></div>"
        "<div>plain prose paragraph with plenty of ordinary words to score highest</div>"
        "</body></html>"
    )
    got = extract_main_content(html)
    assert "plain prose" in got and "one" not in got


def test_html_main_content_pipeline(ray_session):
    rows = {"doc_id": [1, 2], "text": ["alpha beta gamma delta", "epsilon zeta eta"]}
    ds = rd.from_arrow(pa.Table.from_pydict(rows))
    out = html_main_content(ds).to_pandas().sort_values("doc_id")
    assert list(out["main_text"]) == rows["text"]


def test_interleaved_html_and_raster_media(ray_session):
    """One document mixing native text, an OCR'd raster page, and an
    HTML asset — the full_text round-trip stays exact."""
    import pyarrow as pa

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_html_media_ref, encode_media_ref
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    chunks = ["native words first", "rasterized page words here", "html served content words"]
    spans = [
        {"kind": "text", "text": chunks[0], "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": encode_media_ref(chunks[1]), "offset": 20},
        {"kind": "media", "text": "", "media_ref": encode_html_media_ref(chunks[2], "d7"), "offset": 50},
    ]
    t = pa.Table.from_arrays(
        [pa.array(["doc-mixed"], pa.string()), pa.array([spans], SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t)).to_pandas()
    assert out["full_text"][0] == " ".join(chunks)
