"""End-to-end pipeline: fused vs staged equality + exact text round-trip."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from doctr_ray.corpus import (
    doc_spans,
    expected_full_text,
    make_inline_docs,
)
from doctr_ray.pipelines.ocr import ocr_extracted_text, ocr_spans

WORDS = "alpha beta gamma delta word table merge batch window value part key".split()


def _docs_rows(n=12):
    rows = []
    for i in range(n):
        k = i * 7 % 40 + 3
        rows.append((f"doc-{i:03d}", " ".join(WORDS[j % len(WORDS)] for j in range(k))))
    rows.append(("doc-empty", ""))
    return rows


@pytest.fixture(scope="module")
def docs_rows():
    return _docs_rows()


def test_doc_spans_deterministic_and_interleaved(docs_rows):
    did, text = docs_rows[3]
    a = doc_spans(did, text)
    b = doc_spans(did, text)
    assert a == b
    kinds = {s["kind"] for r in docs_rows for s in doc_spans(r[0], r[1])}
    assert kinds == {"text", "media"}
    # offsets are ascending and start at 0
    offs = [s["offset"] for s in a]
    assert offs == sorted(offs) and offs[0] == 0


def test_ocr_extracted_text_exact_roundtrip(ray_session, docs_rows):
    docs = make_inline_docs(docs_rows)
    out = ocr_extracted_text(rd.from_arrow(docs)).to_pandas()
    exp = {d: expected_full_text(t) for d, t in docs_rows}
    got = dict(zip(out["doc_id"], out["full_text"]))
    assert got == exp


def test_ocr_spans_shape_and_order(ray_session, docs_rows):
    docs = make_inline_docs(docs_rows)
    sp = ocr_spans(rd.from_arrow(docs)).to_pandas()
    assert set(sp.columns) == {"doc_id", "ord", "kind", "text", "media_ref", "offset"}
    assert set(sp["kind"].unique()) <= {"text", "ocr_text"}
    for did, g in sp.groupby("doc_id"):
        g = g.sort_values("ord")
        assert list(g["ord"]) == list(range(len(g)))
        assert list(g["offset"]) == sorted(g["offset"])
    # every media span became an ocr_text span with its media_ref kept
    n_media = sum(
        1 for d, t in docs_rows for s in doc_spans(d, t) if s["kind"] == "media"
    )
    assert (sp["kind"] == "ocr_text").sum() == n_media
    assert (sp.loc[sp["kind"] == "ocr_text", "media_ref"] != "").all()


def test_staged_equals_fused(ray_session, docs_rows):
    docs = make_inline_docs(docs_rows[:8])
    a = (
        ocr_spans(rd.from_arrow(docs), mode="fused")
        .to_pandas()
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    b = (
        ocr_spans(rd.from_arrow(docs), mode="staged", repartition_blocks=4)
        .to_pandas()
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_staged_equals_fused_with_html_media(ray_session):
    """Staged mode must handle synthhtml:// assets (DOM extraction), not
    crash in the rasterizer — mixed raster+HTML doc, both modes identical."""
    import pyarrow as pa

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_html_media_ref, encode_media_ref

    chunks = ["native words first", "raster page words", "html asset content words"]
    spans = [
        {"kind": "text", "text": chunks[0], "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": encode_media_ref(chunks[1]), "offset": 20},
        {"kind": "media", "text": "", "media_ref": encode_html_media_ref(chunks[2], "d9"), "offset": 50},
    ]
    t = pa.Table.from_arrays(
        [pa.array(["doc-html-mix"], pa.string()), pa.array([spans], SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )
    a = (
        ocr_spans(rd.from_arrow(t), mode="fused")
        .to_pandas().sort_values(["doc_id", "ord"]).reset_index(drop=True)
    )
    b = (
        ocr_spans(rd.from_arrow(t), mode="staged", repartition_blocks=2)
        .to_pandas().sort_values(["doc_id", "ord"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert list(a["text"]) == chunks  # html extraction recovered exactly


def test_staged_with_wide_crops(ray_session):
    """Force the split-crop groupby path through the staged pipeline."""
    long_word = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = [("doc-wide", " ".join([long_word] * 6 + WORDS))]
    docs = make_inline_docs(rows, media_fraction=1.0)
    out = ocr_extracted_text(rd.from_arrow(docs), mode="staged").to_pandas()
    assert out["full_text"][0] == expected_full_text(rows[0][1])


def test_empty_spans_doc_not_dropped(ray_session):
    import pyarrow as pa

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE

    t = pa.Table.from_arrays(
        [
            pa.array(["empty-spans", "one-text"], pa.string()),
            pa.array(
                [[], [{"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}]],
                SPANS_TYPE,
            ),
        ],
        schema=DOCS_SCHEMA,
    )
    out = ocr_extracted_text(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert dict(zip(out["doc_id"], out["full_text"])) == {
        "empty-spans": "",
        "one-text": "hello world",
    }
    sp = ocr_spans(rd.from_arrow(t)).to_pandas()
    assert set(sp["doc_id"]) == {"one-text"}  # zero spans for the empty doc


def test_loc_preds_hook():
    """User hook between detection and cropping (add_hook analog)."""
    from doctr_ray.media import encode_media_ref
    from doctr_ray.pipelines.ocr import process_media_row
    from doctr_ray.recognition import GlyphRecognizer

    rec = GlyphRecognizer()
    ref = encode_media_ref("alpha beta gamma")

    def drop_first(abs_boxes, rel):
        return abs_boxes[1:], rel[1:]

    base = process_media_row("d", ref, 0, rec)
    hooked = process_media_row("d", ref, 0, rec, loc_preds_hook=drop_first)
    assert len(hooked["text"]) == len(base["text"]) - 1


def test_skewed_doc_sizes(ray_session):
    """One doc with ~50x the media of the others: the unit of work is
    the media row, so the hot doc spreads across the pool and the
    output is still exact."""
    import pyarrow as pa

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_media_ref

    ids, spans = [], []
    # 50-media monster doc
    monster = []
    off = 0
    for i in range(50):
        chunk = f"chunk{i:02d} words here"
        monster.append(
            {"kind": "media", "text": "", "media_ref": encode_media_ref(chunk), "offset": off}
        )
        off += len(chunk) + 1
    ids.append("doc-monster")
    spans.append(monster)
    for i in range(5):
        ids.append(f"doc-small-{i}")
        spans.append(
            [{"kind": "media", "text": "", "media_ref": encode_media_ref(f"tiny {i}"), "offset": 0}]
        )
    t = pa.Table.from_arrays(
        [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)], schema=DOCS_SCHEMA
    )
    out = ocr_extracted_text(rd.from_arrow(t)).to_pandas()
    got = dict(zip(out["doc_id"], out["full_text"]))
    assert got["doc-monster"] == " ".join(f"chunk{i:02d} words here" for i in range(50))
    for i in range(5):
        assert got[f"doc-small-{i}"] == f"tiny {i}"


def test_recognition_training_set(ray_session):
    """Labeled word crops for training-data export (loader analog)."""
    import numpy as np

    from doctr_ray.pipelines.ocr import recognition_training_set

    rows = _docs_rows(6)
    docs = make_inline_docs(rows, media_fraction=1.0)
    out = recognition_training_set(rd.from_arrow(docs)).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {
        "media_ref", "page_idx", "word_idx", "label", "crop", "height", "width",
    }
    # every crop decodes and recognizes back to its label
    from doctr_ray.recognition import GlyphRecognizer

    rec = GlyphRecognizer()
    sample = out.head(20)
    crops = [
        np.frombuffer(b, dtype=np.uint8).reshape(h, w)
        for b, h, w in zip(sample["crop"], sample["height"], sample["width"])
    ]
    preds = rec.recognize_batch(crops)
    assert [t for t, _ in preds] == list(sample["label"])


@pytest.mark.parametrize("fmt,needle", [("hocr", "ocrx_word"), ("json", '"blocks"'), ("text", " ")])
def test_ocr_page_exports(ray_session, fmt, needle):
    from doctr_ray.pipelines.ocr import ocr_page_exports

    rows = _docs_rows(4)
    docs = make_inline_docs(rows, media_fraction=1.0)
    out = ocr_page_exports(rd.from_arrow(docs), fmt=fmt).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "media_ref", "offset", "page_idx", "content"}
    assert out["content"].str.contains(needle, regex=False).all()
    if fmt == "json":
        import json

        export = json.loads(out["content"][0])
        from doctr_ray.elements import Page

        p = Page.from_dict({"blocks": export["blocks"]})
        assert p.render()  # parses back through the element model


def test_actor_death_retry_exact(ray_session, tmp_path):
    """A worker actor hard-killed mid-stream: Ray restarts it and the
    output is still exact (deterministic + idempotent stages)."""
    import os

    from doctr_ray.pipelines.ocr import OcrDocWorker

    marker = str(tmp_path / "crashed-once")

    class CrashyWorker(OcrDocWorker):
        def __call__(self, batch):
            if not os.path.exists(marker):
                open(marker, "w").write("x")
                os._exit(1)
            return super().__call__(batch)

    rows = [(f"d{i}", " ".join(["alpha", "beta", "gamma", "delta"] * (i + 2))) for i in range(8)]
    docs = make_inline_docs(rows, media_fraction=1.0)
    out = (
        rd.from_arrow(docs)
        .repartition(4)
        .map_batches(
            CrashyWorker,
            fn_constructor_kwargs={"emit": "text"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
            max_task_retries=-1,
            max_restarts=-1,
        )
        .to_pandas()
    )
    exp = {d: expected_full_text(t) for d, t in rows}
    assert dict(zip(out["doc_id"], out["full_text"])) == exp


def test_spans_to_docs_table_roundtrip(ray_session, docs_rows):
    """Output docs table mirrors the input schema (F7); a doc whose
    spans are all native text round-trips identically."""
    from doctr_ray.pipelines.ocr import spans_to_docs_table

    docs = make_inline_docs(docs_rows[:6], media_fraction=0.0)  # text-only
    spans = ocr_spans(rd.from_arrow(docs))
    out = spans_to_docs_table(spans).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = (
        rd.from_arrow(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(src["doc_id"])
    for a, b in zip(out["spans"], src["spans"]):
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in a
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in b]


def test_limited_docs_read_is_presplit_and_barrier_free(ray_session):
    """A small limit must pre-split at the READ (from_arrow_refs), not
    via a post-limit repartition(): the split-repartition finalize
    blocks the scheduling loop in ray.get, which DEADLOCKS the staged
    two-pool pipeline once the pools hold every CPU (observed:
    ocr_spans_staged wedged at 16 cpus). Plan must contain no
    Repartition/Limit op, and blocks must be many enough to feed a
    pool."""
    from doctr_ray.corpus import docs_dataset

    ds = docs_dataset("/root/testdata/sf0.001", limit=64)
    plan = str(ds._plan.get_plan_as_string(type(ds)))
    assert "Repartition" not in plan and "limit" not in plan.lower()
    got = ds.materialize()
    assert got.count() == 64
    assert got.num_blocks() >= 8  # enough ready blocks to feed a pool


def test_feed_fused_expansion_matches_docs_dataset(ray_session):
    # the bench flagship expands the corpus INSIDE the worker
    # (expand_media_fraction) — output must equal the docs_dataset path
    from doctr_ray.corpus import docs_dataset, raw_documents_dataset
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    sf = "/root/testdata/sf0.001"
    a = (
        ocr_extracted_text(docs_dataset(sf, media_fraction=1.0, limit=12, copies=2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ocr_extracted_text(
            raw_documents_dataset(sf, limit=12, pool=2),
            expand_media_fraction=1.0,
            expand_copies=2,
            recognize_concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def _many_media_doc(n_media: int, doc_id: str = "giant") -> "pa.Table":
    import pyarrow as pa

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_media_ref

    spans = [
        {
            "kind": "media",
            "text": "",
            "media_ref": encode_media_ref(f"chunk{i} holds words w{i}a w{i}b"),
            "offset": i,
        }
        for i in range(n_media)
    ]
    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()), pa.array([spans], SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )


def test_giant_doc_fused_memory_bounded():
    """Round-2 verdict #10: a pathological doc (hundreds of media spans)
    assembles inside ONE fused worker call — peak memory must track ONE
    media at a time (plus the output text), not the media count."""
    import tracemalloc

    from doctr_ray.pipelines.ocr import OcrDocWorker

    def peak_for(n: int) -> int:
        w = OcrDocWorker(emit="text")
        batch = _many_media_doc(n)
        w(batch.slice(0, 1))  # warm caches/glyphs untimed
        tracemalloc.start()
        out = w(batch)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert out.num_rows == 1
        return peak

    p50, p500 = peak_for(50), peak_for(500)
    # 10x the media -> peak must NOT scale with it (strings grow a
    # little; pixel buffers must not accumulate)
    assert p500 < 3 * p50, (p50, p500)


def test_giant_doc_fused_equals_staged(ray_session):
    import ray

    from doctr_ray.pipelines.ocr import ocr_extracted_text

    docs = _many_media_doc(120)
    fused = (
        ocr_extracted_text(ray.data.from_arrow(docs), mode="fused")
        .to_pandas()
    )
    staged = (
        ocr_extracted_text(ray.data.from_arrow(docs), mode="staged", n_docs=1)
        .to_pandas()
    )
    assert fused.loc[0, "full_text"] == staged.loc[0, "full_text"]
    assert "chunk0 holds words w0a w0b" in fused.loc[0, "full_text"]
    assert "chunk119 holds words w119a w119b" in fused.loc[0, "full_text"]


def test_corrupt_media_quarantine(ray_session, tmp_path):
    """A corrupt media file must not kill a 100-TB job: quarantine
    mode keeps the doc (empty span text) and SURFACES a media_errors
    count on the row; the default still raises (oracle exactness)."""
    import pyarrow as pa
    import ray as _ray

    from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
    from doctr_ray.media import encode_media_ref
    from doctr_ray.pipelines.ocr import ocr_extracted_text

    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\ntruncated")
    docs = pa.Table.from_arrays(
        [
            pa.array(["d0", "d1"], pa.string()),
            pa.array(
                [
                    [
                        {"kind": "text", "text": "before", "media_ref": "",
                         "offset": 0},
                        {"kind": "media", "text": "",
                         "media_ref": f"file://{bad}", "offset": 1},
                        {"kind": "text", "text": "after", "media_ref": "",
                         "offset": 2},
                    ],
                    [
                        {"kind": "media", "text": "",
                         "media_ref": encode_media_ref("clean words"),
                         "offset": 0},
                    ],
                ],
                SPANS_TYPE,
            ),
        ],
        schema=DOCS_SCHEMA,
    )
    out = (
        ocr_extracted_text(
            _ray.data.from_arrow(docs), on_media_error="quarantine"
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["media_errors"]) == [1, 0]
    assert out.iloc[0]["full_text"] == "before after"
    assert out.iloc[1]["full_text"] == "clean words"
    # default mode keeps failing loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        ocr_extracted_text(_ray.data.from_arrow(docs)).to_pandas()
