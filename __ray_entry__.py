"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in doctr_ray) calls ray.init()/ray.shutdown().

``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data operator suite); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one. The
flagship correctness gate is ``ocr_roundtrip``: the full extraction
pipeline (interleaved docs -> rasterize -> detect -> recognize ->
builder -> assemble) must reconstruct each document's exact original
text, oracled by a trivial SELECT.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from doctr_ray.functions.text import LANG_MARKERS, STOPWORDS

N_ANN_QUERIES = 5
ANN_K = 10
BM25_QUERY = "query table row"


def _chunk_cte(limit: int | None = None) -> str:
    """Recursive CTE reproducing corpus.doc_spans chunking in DuckDB.

    The engine's deterministic chunker hashes with md5 first-8-bytes
    little-endian (corpus._h), which is exactly DuckDB's
    ``md5_number_upper`` — so chunk sizes, media/text kind decisions and
    character offsets are all SQL-expressible, giving the span-level
    pipelines HARD oracles (verified identical on all sf0.01 docs).
    Yields CTEs ``ch`` and ``spans(doc_id, chunk_idx, chunk_text,
    char_off, is_media)``.
    """
    src = (
        "documents"
        if limit is None
        else f"(SELECT * FROM documents ORDER BY doc_id LIMIT {limit})"
    )
    return (
        "WITH RECURSIVE ch AS (\n"
        "  SELECT doc_id, string_split(text, ' ') AS toks, 0 AS chunk_idx,\n"
        "         CAST(1 AS BIGINT) AS start_tok, CAST(0 AS BIGINT) AS char_off,\n"
        "         CAST(6 + md5_number_upper(doc_id || '|0|size') % 12 AS BIGINT) AS size\n"
        f"  FROM {src}\n"
        "  UNION ALL\n"
        "  SELECT doc_id, toks, chunk_idx + 1, start_tok + size,\n"
        "         char_off + length(array_to_string(toks[start_tok:start_tok+size-1], ' ')) + 1,\n"
        "         CAST(6 + md5_number_upper(doc_id || '|' || (chunk_idx + 1) || '|size') % 12 AS BIGINT)\n"
        "  FROM ch WHERE start_tok + size <= len(toks)\n"
        "),\n"
        "spans AS (\n"
        "  SELECT doc_id, chunk_idx,\n"
        "         array_to_string(toks[start_tok:start_tok+size-1], ' ') AS chunk_text,\n"
        "         char_off,\n"
        "         (md5_number_upper(doc_id || '|' || chunk_idx || '|kind') % 1000) < 400 AS is_media\n"
        "  FROM ch\n"
        ")\n"
    )


# --------------------------------------------------------------- helpers

# target mixture for the source_mix query: relative weights 1..4 cycling
# over the corpus's src0..src19 sources (any positive ints work; the
# operator scales to the largest feasible corpus with these proportions)
_MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}


def _docs_ds(sf_dir: str, limit: int | None = None):
    from doctr_ray.corpus import docs_dataset

    return docs_dataset(sf_dir, limit=limit)


def _docs_blocks(docs, per_block: int = 8):
    """Arrow docs table -> Dataset pre-split at the READ (~8 docs per
    block). ``ray.data.from_arrow(table)`` is ONE block = one serial
    task under the fused actor pool, and a mid-pipeline repartition
    deadlocks the split finalize under a full-width pool (CLAUDE.md);
    passing a LIST of slices is the safe split."""
    import ray

    n = docs.num_rows
    slices = [docs.slice(i, per_block) for i in range(0, n, per_block)]
    return ray.data.from_arrow(slices if slices else [docs])


def _read(sf_dir: str, table: str, columns=None, rows_per_block: int = 500):
    """Pruned parquet read with a data-sized block count.

    Ray's default read splitting targets a minimum task count, which
    turns the small single-file bench tables into ~64 near-empty blocks
    whose per-task scheduling dominates every downstream stage
    (measured: top_tokens at sf0.1 5.8 s with 64 blocks, 1.5 s with 8).
    Sizing blocks from the footer row count (~500 rows per block,
    clamped to [8, 64]) keeps small tables coarse while leaving real
    parallelism for the larger ones. Sharded layouts
    (``{table}/part-*.parquet`` / ``{table}-N.parquet``) resolve through
    doctr_ray.tableio with at least one block per shard.
    """
    from doctr_ray.tableio import read_table_ds

    return read_table_ds(sf_dir, table, columns, rows_per_block=rows_per_block)


def _ann_queries(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    from doctr_ray.tableio import resolve_table_paths

    t = pq.read_table(resolve_table_paths(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = {}
    for vid, emb in zip(
        t["vec_id"].to_pylist()[:N_ANN_QUERIES], t["embedding"].to_pylist()[:N_ANN_QUERIES]
    ):
        out[int(vid)] = np.asarray(emb, dtype=np.float64)
    return out


# --------------------------------------------------------------- contract

def entry() -> Any:
    """Flagship extraction pipeline on sf0.001 (subset for smoke speed)."""
    from doctr_ray.pipelines.ocr import ocr_spans

    docs = _docs_ds("/root/testdata/sf0.001", limit=48)
    return ocr_spans(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    from doctr_ray.functions.dedup import (
        exact_dedup_groups,
        exact_dedup_keep_first,
        minhash_near_dups,
        simhash_near_dups,
    )
    from doctr_ray.functions.relational import (
        asof_click_attribution,
        event_gaps,
        events_rollup,
        events_seasonality,
        event_type_transitions,
        funnel_conversion,
        latest_user_event,
        nation_revenue,
        power_users,
        promo_revenue,
        rolling_active_users,
        source_mad,
        user_moving_average,
        user_retention,
        value_histogram,
        order_priority_check,
        orphan_orders,
        props_stats,
        small_quantity_revenue,
        source_ntiles,
        source_rank,
        user_running_total,
        range_join_error_clicks,
        events_hourly,
        events_sliding_window,
        pricing_summary,
        shipping_priority,
        supplier_balance_by_nation,
        top_customer_revenue,
        user_sessions,
    )
    from doctr_ray.functions.similarity import ann_topk, ann_topk_lsh
    from doctr_ray.functions.text import fingerprint, lang_id, quality_score, token_stats
    from doctr_ray.pipelines.ocr import ocr_extracted_text, ocr_spans

    def q_ocr_roundtrip(sf_dir: str):
        return ocr_extracted_text(_docs_ds(sf_dir))

    # media_ref is an engine-encoded blob (not SQL-derivable); every
    # other span column — kind, per-span text, char offset, order — is
    # oracled exactly via the chunking CTE
    SPAN_COLS = ["doc_id", "ord", "kind", "text", "offset"]

    def q_ocr_spans(sf_dir: str):
        return ocr_spans(_docs_ds(sf_dir)).select_columns(SPAN_COLS)

    def q_ocr_spans_staged(sf_dir: str):
        return ocr_spans(
            _docs_ds(sf_dir, limit=64), mode="staged", repartition_blocks=8,
            n_docs=64
        ).select_columns(SPAN_COLS)

    def _kie_full(sf_dir: str):
        from doctr_ray.corpus import documents_to_docs
        from doctr_ray.media import encode_media_ref
        from doctr_ray.pipelines.kie import kie_predictions
        import pyarrow as pa

        # derive a small artefact-bearing corpus from documents
        def to_docs(batch: pa.Table) -> pa.Table:
            from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE

            ids, spans = [], []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                toks = (t or "").split(" ")[:20]
                ids.append(str(d))
                spans.append(
                    [
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": encode_media_ref(
                                " ".join(toks), artefacts=1 + int(d) % 3
                            ),
                            "offset": 0,
                        }
                    ]
                )
            return pa.Table.from_arrays(
                [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
                schema=DOCS_SCHEMA,
            )

        docs = _read(sf_dir, "documents", ["doc_id", "text"]).limit(100).map_batches(
            to_docs, batch_format="pyarrow"
        )
        return kie_predictions(docs)

    def q_kie(sf_dir: str):
        """Full KIE prediction stream, oracled on the SQL-derivable
        columns: per-doc 'words' rows carry the first 20 tokens in rank
        order; 'artefacts' rows (1 + doc_id % 3 per doc, value='') come
        from the multi-class detector."""
        return _kie_full(sf_dir).select_columns(["doc_id", "class_name", "rank", "value"])

    def q_ocr_rotated(sf_dir: str):
        """Rotated scans: every media rendered at a 90-degree multiple;
        detect_orientation recovers the upright text exactly."""
        import pyarrow as pa

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref

        def to_docs(batch: pa.Table) -> pa.Table:
            ids, spans = [], []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                toks = (t or "").split(" ")[:30]
                ids.append(str(d))
                spans.append(
                    [
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": encode_media_ref(
                                " ".join(toks), rotation=90 * (int(d) % 4)
                            ),
                            "offset": 0,
                        }
                    ]
                )
            return pa.Table.from_arrays(
                [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
                schema=DOCS_SCHEMA,
            )

        docs = _read(sf_dir, "documents", ["doc_id", "text"]).limit(100).map_batches(
            to_docs, batch_format="pyarrow"
        )
        return ocr_extracted_text(docs, detect_orientation=True, n_docs=100)

    def q_ocr_skewed(sf_dir: str):
        """Skewed scans (1.5-8.4 degrees, per-doc): the exact
        inverse-reconstruction path (doctr_ray.skew) must recover every
        word byte-exactly AND at its exact pristine-frame pixel box —
        the oracle recomputes the renderer's greedy layout in SQL
        (m_inv / preserve_original_coords correctness surface)."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref
        from doctr_ray.pipelines.ocr import (
            default_pool,
            explode_spans,
            process_media_row,
        )
        from doctr_ray.recognition import GlyphRecognizer

        PW, PH = 800, 600

        def to_docs(batch: pa.Table) -> pa.Table:
            ids, spans = [], []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                toks = (t or "").split(" ")[:30]
                ids.append(str(d))
                spans.append(
                    [
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": encode_media_ref(
                                " ".join(toks), PW, PH,
                                skew_decidegrees=15 + int(d) % 70,
                            ),
                            "offset": 0,
                        }
                    ]
                )
            return pa.Table.from_arrays(
                [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
                schema=DOCS_SCHEMA,
            )

        class SkewWorker:
            def __init__(self) -> None:
                self.rec = GlyphRecognizer()

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = {"doc_id": [], "word": [], "x0": [], "y0": [], "x1": [], "y1": []}
                for did, ref, off in zip(
                    batch["doc_id"].to_pylist(),
                    batch["media_ref"].to_pylist(),
                    batch["offset"].to_pylist(),
                ):
                    rows = process_media_row(
                        did, ref, off, self.rec, False, True  # straighten_pages
                    )
                    for i in range(len(rows["text"])):
                        out["doc_id"].append(did)
                        out["word"].append(rows["text"][i])
                        out["x0"].append(int(round(rows["x0"][i] * PW)))
                        out["y0"].append(int(round(rows["y0"][i] * PH)))
                        out["x1"].append(int(round(rows["x1"][i] * PW)))
                        out["y1"].append(int(round(rows["y1"][i] * PH)))
                return pa.Table.from_pydict(
                    {
                        "doc_id": pa.array(out["doc_id"], pa.string()),
                        "word": pa.array(out["word"], pa.string()),
                        "x0": pa.array(out["x0"], pa.int32()),
                        "y0": pa.array(out["y0"], pa.int32()),
                        "x1": pa.array(out["x1"], pa.int32()),
                        "y1": pa.array(out["y1"], pa.int32()),
                    }
                )

        # TASK stage, not an actor pool: the worker's only state is the
        # 27 KB glyph bank (~2 ms build) — a per-query pool paid ~4 s of
        # actor spin-up for ~1 s of parallel skew kernels
        pool = default_pool()
        docs = _read(sf_dir, "documents", ["doc_id", "text"]).limit(100).map_batches(
            to_docs, batch_format="pyarrow"
        )
        media = (
            docs.map_batches(explode_spans, batch_format="pyarrow")
            .filter(expr="kind == 'media'")
            .repartition(pool)
        )
        return media.map_batches(
            SkewWorker(), batch_format="pyarrow", batch_size=16
        )

    def q_ocr_eval(sf_dir: str):
        """In-pipeline evaluation: extraction output vs ground truth as
        mergeable TextMatch partial counts (utils/metrics.py analog at
        dataset scale — one streaming pass, no driver loop)."""
        import pyarrow as pa

        from doctr_ray.metrics import text_match_partial

        got = ocr_extracted_text(_docs_ds(sf_dir, limit=200))
        import ray

        gt = {
            str(d): t
            for d, t in zip(
                *[
                    _read(sf_dir, "documents", ["doc_id", "text"])
                    .limit(200)
                    .to_pandas()[c]
                    for c in ("doc_id", "text")
                ]
            )
        }
        ref = ray.put(gt)

        def add_gt(batch: pa.Table) -> pa.Table:
            lookup = ray.get(ref)
            gts = [lookup.get(d, "") for d in batch["doc_id"].to_pylist()]
            return pa.Table.from_pydict(
                {"pred": batch["full_text"].to_pylist(), "gt": gts}
            )

        partials = got.map_batches(add_gt, batch_format="pyarrow").map_batches(
            text_match_partial, batch_format="pyarrow"
        )
        from ray.data.aggregate import Sum

        agg = partials.aggregate(Sum("raw"), Sum("caseless"), Sum("total"))
        return pa.Table.from_pydict(
            {
                "raw_matches": [agg["sum(raw)"]],
                "caseless_matches": [agg["sum(caseless)"]],
                "total": [agg["sum(total)"]],
            }
        )

    def q_page_hocr(sf_dir: str):
        """hOCR export stream, verified by parsing the ocrx_word spans
        back out of every page and checking the per-doc word stream
        (pages ordered by span offset) against the media chunks'
        tokens — a hard oracle that the hOCR carries exactly the right
        words in the right order (geometry attrs are covered by unit
        tests)."""
        import re

        import pandas as pd
        import pyarrow as pa

        import functools

        from doctr_ray.pipelines.ocr import (
            _add_bucket,
            assembly_buckets_for,
            ocr_page_exports,
        )

        pat = re.compile(r"""<span class=["']ocrx_word["'][^>]*>(.*?)</span>""")
        pages = ocr_page_exports(_docs_ds(sf_dir, limit=60), fmt="hocr")

        def parse_words(batch: pa.Table) -> pa.Table:
            words = [
                " ".join(pat.findall(c)) for c in batch["content"].to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"].to_pylist(),
                    "offset": batch["offset"].to_pylist(),
                    "page_idx": batch["page_idx"].to_pylist(),
                    "w": words,
                }
            )

        def per_doc(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for did, gg in g.groupby("doc_id", sort=False):
                gg = gg.sort_values(["offset", "page_idx"])
                out.append({"doc_id": did, "words": " ".join(w for w in gg["w"] if w)})
            return pd.DataFrame(out)

        return (
            pages.map_batches(parse_words, batch_format="pyarrow")
            .map_batches(
                functools.partial(_add_bucket, buckets=assembly_buckets_for(60)),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(per_doc, batch_format="pandas")
        )

    def q_page_reconstitution(sf_dir: str):
        """Reconstitution loop: extract -> builder export ->
        synthesize_page -> RE-extract from the reconstituted image.
        The re-extracted per-doc word stream must equal the media
        chunks' tokens — a hard oracle on the export->image path
        (reference utils/reconstitution.py analog; exact here because
        the procedural font is both renderer and recognizer)."""
        import pandas as pd
        import pyarrow as pa

        from doctr_ray.builder import build_page
        from doctr_ray.detection import detect_page
        from doctr_ray.geometry import extract_crops
        from doctr_ray.media import HTML_PREFIX, rasterize_synth
        import functools

        from doctr_ray.pipelines.ocr import (
            _add_bucket,
            assembly_buckets_for,
            default_pool,
            explode_spans,
        )
        from doctr_ray.recognition import GlyphRecognizer
        from doctr_ray.reconstitution import synthesize_page

        class ReconWorker:
            def __init__(self) -> None:
                self.rec = GlyphRecognizer()

            def _read_words(self, image):
                boxes, rel = detect_page(image)
                preds = self.rec.recognize_batch(extract_crops(image, boxes))
                return rel, preds

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = {"doc_id": [], "offset": [], "page_idx": [], "w": []}
                for did, ref, off in zip(
                    batch["doc_id"].to_pylist(),
                    batch["media_ref"].to_pylist(),
                    batch["offset"].to_pylist(),
                ):
                    if ref.startswith(HTML_PREFIX):
                        continue
                    for pi, page in enumerate(rasterize_synth(ref)):
                        rel, preds = self._read_words(page.image)
                        built = build_page(
                            rel[:, :4],
                            [t for t, _ in preds],
                            [c for _, c in preds],
                            rel[:, 4],
                        )
                        img2 = synthesize_page(built.export, page.image.shape[:2])
                        rel2, preds2 = self._read_words(img2)
                        built2 = build_page(
                            rel2[:, :4],
                            [t for t, _ in preds2],
                            [c for _, c in preds2],
                            rel2[:, 4],
                            with_export=False,  # re-extract needs text only
                        )
                        from doctr_ray.builder import page_text

                        out["doc_id"].append(did)
                        out["offset"].append(off)
                        out["page_idx"].append(pi)
                        out["w"].append(
                            page_text(built2, [t for t, _ in preds2], line_sep=" ")
                        )
                return pa.Table.from_pydict(out)

        def per_doc(g: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for did, gg in g.groupby("doc_id", sort=False):
                gg = gg.sort_values(["offset", "page_idx"])
                rows.append({"doc_id": did, "words": " ".join(w for w in gg["w"] if w)})
            return pd.DataFrame(rows)

        # TASK stage (27 KB glyph-bank state; see q_ocr_skewed note)
        pool = default_pool()
        media = (
            _docs_ds(sf_dir, limit=60)
            .map_batches(explode_spans, batch_format="pyarrow")
            .filter(expr="kind == 'media'")
            .repartition(pool)
        )
        return (
            media.map_batches(ReconWorker(), batch_format="pyarrow", batch_size=16)
            .map_batches(
                functools.partial(_add_bucket, buckets=assembly_buckets_for(60)),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(per_doc, batch_format="pandas")
        )

    def q_training_set(sf_dir: str):
        """Training-set export, oracled on label content: every media
        chunk token of the first 60 docs must appear as a crop label
        exactly as often as it occurs (crop geometry is unit-tested)."""
        import pyarrow as pa

        from doctr_ray.pipelines.ocr import recognition_training_set

        ds = recognition_training_set(_docs_ds(sf_dir, limit=60))

        def label_partial(batch: pa.Table) -> pa.Table:
            import collections

            c = collections.Counter(batch["label"].to_pylist())
            return pa.Table.from_pydict(
                {"label": list(c.keys()), "n_part": list(c.values())}
            )

        from ray.data.aggregate import Sum

        agg = (
            ds.map_batches(label_partial, batch_format="pyarrow")
            .groupby("label")
            .aggregate(Sum("n_part", alias_name="n"))
        )
        return agg

    def q_table_grids(sf_dir: str):
        """Bordered-grid tables: R x C derived from doc_id, cells filled
        row-major from the document's tokens; extraction must recover
        the exact logical grid."""
        import pyarrow as pa

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref
        from doctr_ray.pipelines.ocr import default_pool, explode_spans
        from doctr_ray.recognition import GlyphRecognizer
        from doctr_ray.tables import extract_tables

        def to_docs(batch: pa.Table) -> pa.Table:
            ids, spans = [], []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                R, C = 2 + int(d) % 2, 2 + int(d) % 3
                toks = (t or "").split(" ")[: R * C]
                ids.append(str(d))
                spans.append(
                    [
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": encode_media_ref(" ".join(toks), table=(R, C)),
                            "offset": 0,
                        }
                    ]
                )
            return pa.Table.from_arrays(
                [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
                schema=DOCS_SCHEMA,
            )

        class TableWorker:
            def __init__(self) -> None:
                self.rec = GlyphRecognizer()

            def __call__(self, batch: pa.Table) -> pa.Table:
                from doctr_ray.media import rasterize_synth

                out = {"doc_id": [], "row": [], "col": [], "value": []}
                for did, ref in zip(
                    batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist()
                ):
                    for page in rasterize_synth(ref):
                        tables, _ = extract_tables(page.image, self.rec)
                        for t in tables:
                            for c in t.cells:
                                out["doc_id"].append(did)
                                out["row"].append(c.row)
                                out["col"].append(c.col)
                                out["value"].append(c.value)
                return pa.Table.from_pydict(
                    {
                        "doc_id": pa.array(out["doc_id"], pa.string()),
                        "row": pa.array(out["row"], pa.int32()),
                        "col": pa.array(out["col"], pa.int32()),
                        "value": pa.array(out["value"], pa.string()),
                    }
                )

        docs = _read(sf_dir, "documents", ["doc_id", "text"]).limit(80).map_batches(
            to_docs, batch_format="pyarrow"
        )
        # TASK stage (27 KB glyph-bank state; see q_ocr_skewed note)
        pool = default_pool()
        media = (
            docs.map_batches(explode_spans, batch_format="pyarrow")
            .filter(expr="kind == 'media'")
            # the limit upstream coalesces to ~2 blocks, which would cap
            # concurrency at 2 tasks — spread the work
            .repartition(pool)
        )
        return media.map_batches(
            TableWorker(), batch_format="pyarrow", batch_size=16
        )

    def q_table_grids_pdf(sf_dir: str):
        """Bordered-grid tables inside REAL vector-content PDFs: the
        grid rules are re/f rectangle fills and the cells embedded-font
        text (sources/pdffont.make_table_pdf) — the producer form of a
        ruled table. Extraction must recover the exact logical grid
        from the rasterized pixels. Same oracle shape as table_grids."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.pipelines.ocr import default_pool
        from doctr_ray.recognition import GlyphRecognizer
        from doctr_ray.sources.pdffont import make_table_pdf
        from doctr_ray.tables import extract_tables
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 40)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_tabpdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, refs = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did_i = int(did)
            R, C = 2 + did_i % 2, 2 + did_i % 3
            toks = (text or "").split(" ")[: R * C]
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_table_pdf([(toks, R, C)]))
                os.replace(tmp, path)
            ids.append(str(did))
            refs.append(f"file://{path}")

        class PdfTableWorker:
            def __init__(self) -> None:
                self.rec = GlyphRecognizer()

            def __call__(self, batch: pa.Table) -> pa.Table:
                from doctr_ray.sources.readers import rasterize_media

                out = {"doc_id": [], "row": [], "col": [], "value": []}
                for did, ref in zip(
                    batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist()
                ):
                    for page in rasterize_media(ref):
                        tables, _ = extract_tables(page.image, self.rec)
                        for tb in tables:
                            for c in tb.cells:
                                out["doc_id"].append(did)
                                out["row"].append(c.row)
                                out["col"].append(c.col)
                                out["value"].append(c.value)
                return pa.Table.from_pydict(
                    {
                        "doc_id": pa.array(out["doc_id"], pa.string()),
                        "row": pa.array(out["row"], pa.int32()),
                        "col": pa.array(out["col"], pa.int32()),
                        "value": pa.array(out["value"], pa.string()),
                    }
                )

        media = pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
            }
        )
        ds = ray.data.from_arrow(media).repartition(max(8, default_pool()))
        return ds.map_batches(PdfTableWorker(), batch_format="pyarrow", batch_size=4)

    def q_kie_word_text(sf_dir: str):
        ds = q_kie(sf_dir)
        return (
            ds.filter(expr="class_name == 'words'")
            .select_columns(["doc_id", "rank", "value"])
        )

    def q_token_stats(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            token_stats, batch_format="pyarrow"
        )

    def q_quality(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            quality_score, batch_format="pyarrow"
        )

    def q_lang_id(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lang_id, batch_format="pyarrow"
        )

    def q_fingerprint(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            fingerprint, batch_format="pyarrow"
        )

    def q_html_main_content(sf_dir: str):
        """North-rule clause 1: HTML boilerplate strip via DOM
        heuristics — synthesized pages (article + nav/header/ads/
        footer boilerplate) must yield the exact document text."""
        from doctr_ray.functions.html_extract import html_main_content

        return html_main_content(_read(sf_dir, "documents", ["doc_id", "text"]))


    def q_ocr_html_media(sf_dir: str):
        """file://*.html media route (reference io/html.py:11-26 analog,
        weasyprint-free): real HTML files written to disk, read back as
        media spans by the fused OCR worker via DOM main-content
        extraction. Exact oracle: extraction recovers each document's
        text verbatim (the synthesized page wraps it in boilerplate
        the extractor must strip)."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.functions.html_extract import synthesize_html
        from doctr_ray.pipelines.ocr import ocr_extracted_text

        t = (
            pq.read_table(__import__("doctr_ray.tableio", fromlist=["resolve_table_paths"]).resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"])
            .sort_by("doc_id")
            .slice(0, 100)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_html",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.html")
            if not os.path.exists(path):
                tmp = path + ".tmp"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(synthesize_html(text or "", did))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_image_media(sf_dir: str):
        """file://*.{png,jpg,gif,bmp,pnm,tif} media route (reference
        io/image/base.py read_img_as_numpy + io/reader.py DocumentFile
        analog): each document's rendered pages are written as REAL
        encoded image files — one file per page, format rotating
        through every writer the codec matrix has (PNG, JPEG q95, GIF,
        BMP, PNM, TIFF g4/lzw/deflate/packbits) — and read back as
        per-page media spans by the fused OCR worker. Exact oracle:
        byte-exact text reconstruction across the page joins."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref, rasterize_synth
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 60)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_imgmedia",
            hashlib.md5((sf_dir + ":v1").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        variants = (
            "png", "jpeg", "gif", "bmp", "pnm",
            "tiff_g4", "tiff_lzw", "tiff_deflate", "tiff_packbits",
        )
        ext = {
            "png": "png", "jpeg": "jpg", "gif": "gif", "bmp": "bmp",
            "pnm": "pgm", "tiff_g4": "tif", "tiff_lzw": "tif",
            "tiff_deflate": "tif", "tiff_packbits": "tif",
        }

        @ray.remote(num_cpus=1)
        def _write_pages(text: str, base: str, start_variant: int) -> None:
            from doctr_ray.sources.gifcodec import encode_gif
            from doctr_ray.sources.imagecodec import (
                encode_bmp,
                encode_png,
                encode_pnm,
                encode_tiff,
            )
            from doctr_ray.sources.jpegcodec import encode_jpeg

            for i, pg in enumerate(rasterize_synth(encode_media_ref(text))):
                fmt = variants[(start_variant + i) % len(variants)]
                path = f"{base}.p{i}.{ext[fmt]}"
                if os.path.exists(path):
                    continue
                img = pg.image
                if fmt == "png":
                    blob = encode_png(img)
                elif fmt == "jpeg":
                    blob = encode_jpeg(img, 95)
                elif fmt == "gif":
                    blob = encode_gif(img)
                elif fmt == "bmp":
                    blob = encode_bmp(img)
                elif fmt == "pnm":
                    blob = encode_pnm(img)
                else:
                    blob = encode_tiff(img, fmt.split("_", 1)[1])
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)

        ids, spans, pend = [], [], []
        for k, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            base = os.path.join(outdir, did)
            n_pages = len(rasterize_synth(encode_media_ref(text or "")))
            paths = [
                f"{base}.p{i}.{ext[variants[(k + i) % len(variants)]]}"
                for i in range(n_pages)
            ]
            if not all(os.path.exists(p) for p in paths):
                pend.append(_write_pages.remote(text or "", base, k))
            ids.append(did)
            spans.append(
                [
                    {"kind": "media", "text": "", "media_ref": f"file://{p}",
                     "offset": i}
                    for i, p in enumerate(paths)
                ]
            )
        if pend:
            ray.get(pend)
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_video_media(sf_dir: str):
        """video:// media route (round 5): each document's rendered
        pages become the FRAMES of one real video file — animated GIF
        (sub-rect inter-frame coding), AVI-DIB, or LOSSY AVI-MJPG,
        rotating — and the
        fused OCR worker rasterizes every frame back as a page via the
        in-repo video decoders (the multi-page-media analog of the
        scanned-PDF route). Exact oracle: byte-exact text
        reconstruction across the frame-page joins."""
        import hashlib
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref, rasterize_synth
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"),
                columns=["doc_id", "text"],
            )
            .sort_by("doc_id")
            .slice(0, 40)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_videomedia",
            hashlib.md5((sf_dir + ":v1").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)

        @ray.remote(num_cpus=1)
        def _write_video(text: str, path: str, k: int) -> None:
            from doctr_ray.sources.avicodec import encode_avi
            from doctr_ray.sources.gifcodec import encode_gif_animation

            if os.path.exists(path):
                return
            frames = np.stack(
                [
                    pg.image
                    for pg in rasterize_synth(encode_media_ref(text))
                ]
            )
            if k % 3 == 0:
                blob = encode_gif_animation(frames, subrect=True)
            elif k % 3 == 1:
                blob = encode_avi(frames, fps=10, codec="DIB ")
            else:
                # Motion-JPEG: LOSSY frames — the glyph pipeline still
                # reconstructs text byte-exactly (<=6-LSB ringing on the
                # two-tone pages never crosses the ink threshold)
                blob = encode_avi(frames, fps=10, codec="MJPG")
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)

        ids, spans, pend = [], [], []
        for k, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            ext = ("gif", "avi", "avi")[k % 3]
            path = os.path.join(outdir, f"{did}.{ext}")
            if not os.path.exists(path):
                pend.append(_write_video.remote(text or "", path, k))
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"video://{path}",
                  "offset": 0}]
            )
        if pend:
            ray.get(pend)
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_scanned_pdf(sf_dir: str):
        """Scanned-image PDF route (reference io/pdf.py analog,
        pypdfium2-free): each document's rendered pages embedded as
        image XObjects, rotating through TEN real scanner/producer
        layouts — JPEG (/DCTDecode), deflated samples (/FlateDecode),
        CCITT Group 4 / Group 3 1-D / Group 3 2-D byte-aligned fax
        (/CCITTFaxDecode), BI/ID/EI inline images, LZW samples,
        ASCII85-wrapped RunLength chains, an /ObjStm-repacked file and
        an AES-128-ENCRYPTED file (standard handler, empty user
        password) — then rasterized back through sources/pdfimage and
        OCR'd. Exact oracle: the full pipeline must reconstruct every
        document's text byte-exactly."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref, rasterize_synth
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdfimage import make_scanned_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 60)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_scanpdf",
            hashlib.md5((sf_dir + ":v4-filters").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        #: (image_format, make_scanned_pdf kwargs, post-transform)
        variants = [
            ("jpeg", {}, None),
            ("flate", {}, None),
            ("ccitt_g4", {}, None),
            ("ccitt_g3", {}, None),
            ("inline_flate", {}, None),
            ("lzw", {}, None),
            ("rle", {"transport": "a85"}, None),
            ("ccitt_g3_2d", {"ccitt_byte_align": True}, None),
            ("flate", {}, "objstm"),
            ("flate", {}, "encrypt"),
        ]

        @ray.remote(num_cpus=1)
        def _write_fixture(text: str, path: str, vi: int) -> None:
            from doctr_ray.sources.pdfcrypt import encrypt_pdf
            from doctr_ray.sources.pdfimage import repack_with_objstm

            fmt, kwargs, post = variants[vi]
            pages = rasterize_synth(encode_media_ref(text or ""))
            pdf = make_scanned_pdf(
                [p.image for p in pages], image_format=fmt, **kwargs
            )
            if post == "objstm":
                pdf = repack_with_objstm(pdf)
            elif post == "encrypt":
                pdf = encrypt_pdf(pdf, revision=4)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(pdf)
            os.replace(tmp, path)

        ids, spans, pend = [], [], []
        for i, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                pend.append(_write_fixture.remote(text or "", path, i % len(variants)))
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        if pend:
            ray.get(pend)
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_jbig2_pdf(sf_dir: str):
        """Scanned-image PDF route, JBIG2 flavour: each document's
        rendered bilevel pages embedded as /JBIG2Decode image XObjects,
        alternating the two coding modes scanners emit — MQ-coded
        generic regions and symbol-dictionary + text-region coding
        (connected glyph components deduplicated into a shared
        dictionary) — and rasterized back through sources/jbig2codec +
        jbig2symbol. Exact oracle: byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref, rasterize_synth
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdfimage import make_scanned_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 24)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_jbig2pdf",
            hashlib.md5((sf_dir + ":v2-sym").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for i, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                pages = rasterize_synth(encode_media_ref(text or ""))
                fmt = ("jbig2", "jbig2_sym")[i % 2]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(
                        make_scanned_pdf(
                            [p.image for p in pages], image_format=fmt
                        )
                    )
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(
            ray.data.from_arrow([docs.slice(i, 1) for i in range(len(ids))]),
            n_docs=len(ids),
            recognize_concurrency=len(ids),  # arithmetic decode is heavy per doc
            fused_batch_size=1,
        )

    def q_ocr_jpx_pdf(sf_dir: str):
        """Scanned-image PDF route, JPEG 2000 flavour: each document's
        rendered pages embedded as /JPXDecode JP2 streams (lossless
        5/3 reversible wavelet + EBCOT, the archival imaging profile)
        and rasterized back through sources/jpxcodec. Exact oracle:
        byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA, SPANS_TYPE
        from doctr_ray.media import encode_media_ref, rasterize_synth
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdfimage import make_scanned_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 12)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_jpxpdf",
            hashlib.md5((sf_dir + ":v3-bounded").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)

        def _clip(t: str) -> str:
            # bound each doc to ~1-2 rendered pages: EBCOT decode is
            # seconds of pure python PER PAGE, and the query's wall
            # time is the slowest doc — the oracle clips identically
            return " ".join((t or "").split(" ")[:120])

        @ray.remote(num_cpus=1)
        def _write_fixture(did: str, text: str, path: str, lossy: bool) -> None:
            pages = rasterize_synth(encode_media_ref(_clip(text)))
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(
                    make_scanned_pdf([p.image for p in pages],
                                     image_format="jpx_lossy" if lossy else "jpx")
                )
            os.replace(tmp, path)

        ids, spans, pend = [], [], []
        for i, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                # EBCOT encoding is ~1s/page of pure Python: fan the
                # one-time fixture build out as Ray tasks; every other
                # doc uses the LOSSY delivery profile (9/7 + ICT +
                # scalar quantization) — text still round-trips exactly
                pend.append(
                    _write_fixture.remote(did, text or "", path, i % 2 == 1)
                )
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        if pend:
            ray.get(pend)
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, SPANS_TYPE)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(
            # split at the READ: one single-row arrow table per doc ->
            # one block per doc, so the per-doc actors run in parallel
            # (a mid-pipeline repartition DEADLOCKS under a full-width
            # actor pool at low cpu counts — reproduced; CLAUDE.md)
            ray.data.from_arrow([docs.slice(i, 1) for i in range(len(ids))]),
            n_docs=len(ids),
            # EBCOT decode is seconds of pure python PER DOC: one
            # actor per doc AND one doc per batch, not the cheap-doc
            # pool defaults
            recognize_concurrency=len(ids),
            fused_batch_size=1,
        )

    def q_ocr_truetype_pdf(sf_dir: str):
        """Font-rendered PDF route (reference io/pdf.py analog for the
        SUBSET-FONT case): each document's text drawn with an embedded
        TrueType font under a private encoding — the text layer is
        garbage by construction, so the pipeline must rasterize the
        embedded glyph outlines (sources/pdffont) and OCR the pixels.
        Exact oracle: byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_truetype_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 40)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_ttfpdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_truetype_pdf(pages))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_cff_pdf(sf_dir: str):
        """Font-rendered PDF route, PostScript flavour: the same
        subset-font fixture as ocr_truetype_pdf but embedded as bare
        CFF (/FontFile3 /Subtype /Type1C) — Type 2 charstrings
        interpreted and rasterized by sources/cfffont. Exact oracle:
        byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_type1c_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 30)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_cffpdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_type1c_pdf(pages))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_type1_pdf(sf_dir: str):
        """Font-rendered PDF route, pre-CFF PostScript flavour: the
        same subset-font fixture embedded as an original eexec-
        encrypted Type 1 program (/FontFile with Length1/2/3) —
        decrypted and interpreted by sources/type1font. Exact oracle:
        byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_type1_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 30)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_t1pdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_type1_pdf(pages))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_type3_pdf(sf_dir: str):
        """Font-rendered PDF route, bitmap-glyph flavour: the same
        subset-font fixture as a /Type3 font whose glyphs are tiny
        content streams (d0 metrics + re/f rectangle fills in the
        /FontMatrix glyph space) with a scrambled /Differences
        encoding and no /ToUnicode — sources/pdffont executes the
        CharProcs. Exact oracle: byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_type3_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 30)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_t3pdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_type3_pdf(pages))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_cid_pdf(sf_dir: str):
        """Font-rendered PDF route, composite flavour: /Type0
        /Identity-H alternating between a CIDFontType2 descendant
        (TrueType, Identity CIDToGIDMap) and a CIDFontType0 descendant
        (CID-keyed CFF, identity charset) — 2-byte codes ARE glyph ids
        either way (the modern subset forms whose text layer is
        garbage by construction). Exact oracle: byte-exact
        reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_cid0_pdf, make_cid_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 30)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_cidpdf",
            hashlib.md5((sf_dir + ":v2-cid0").encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for i, (did, text) in enumerate(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                make = make_cid_pdf if i % 2 == 0 else make_cid0_pdf
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make(pages))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), n_docs=len(ids))

    def q_ocr_rotated_pdf(sf_dir: str):
        """Rotated font-rendered PDFs: every page drawn with 90-degree
        Tm matrices on a swapped MediaBox (the rotated-producer case),
        rasterized through the rotated-matrix interpreter path and
        recovered by the pipeline's orientation detection. Exact
        oracle: byte-exact text reconstruction."""
        import hashlib
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from doctr_ray.corpus import DOCS_SCHEMA
        from doctr_ray.pipelines.ocr import ocr_extracted_text
        from doctr_ray.sources.pdffont import make_truetype_pdf
        from doctr_ray.tableio import resolve_table_paths

        t = (
            pq.read_table(
                resolve_table_paths(sf_dir, "documents"), columns=["doc_id", "text"]
            )
            .sort_by("doc_id")
            .slice(0, 30)
        )
        outdir = os.path.join(
            "/tmp/doctr_ray_rotpdf",
            hashlib.md5(sf_dir.encode()).hexdigest()[:10],
        )
        os.makedirs(outdir, exist_ok=True)
        ids, spans = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            did = str(did)
            path = os.path.join(outdir, f"{did}.pdf")
            if not os.path.exists(path):
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 10]) for i in range(0, len(words), 10)
                ]
                pages = [lines[j : j + 40] for j in range(0, len(lines), 40)] or [[]]
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(make_truetype_pdf(pages, rotate=90))
                os.replace(tmp, path)
            ids.append(did)
            spans.append(
                [{"kind": "media", "text": "", "media_ref": f"file://{path}", "offset": 0}]
            )
        docs = pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(spans, DOCS_SCHEMA.field("spans").type)],
            schema=DOCS_SCHEMA,
        )
        return ocr_extracted_text(_docs_blocks(docs), detect_orientation=True, n_docs=len(ids))

    def q_dsir_weights(sf_dir: str):
        """DSIR-style data selection (Xie et al. 2023): hashed
        unigram+bigram importance weights of every document against the
        'src0' target corpus, in the integer rational form (no ln — see
        functions/dsir.py). Two streaming passes; the <= 4096-row score
        table broadcasts, text never shuffles."""
        from doctr_ray.functions.dsir import dsir_weights

        return dsir_weights(
            _read(sf_dir, "documents", ["doc_id", "source", "text"]),
            target_source="src0",
        )

    def q_top_tokens(sf_dir: str):
        from doctr_ray.functions.text import top_tokens

        return top_tokens(_read(sf_dir, "documents", ["doc_id", "text"]), k=20)

    def q_inverted_index(sf_dir: str):
        from doctr_ray.functions.text import inverted_index

        return inverted_index(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_shared_vocab(sf_dir: str):
        from doctr_ray.functions.text import shared_vocab

        return shared_vocab(sf_dir)

    def q_source_overlap(sf_dir: str):
        from doctr_ray.functions.dedup import source_overlap

        return source_overlap(sf_dir)

    def q_token_cooccurrence(sf_dir: str):
        from doctr_ray.functions.text import token_cooccurrence

        return token_cooccurrence(sf_dir)

    def q_winnow_fingerprints(sf_dir: str):
        from doctr_ray.functions.dedup import winnow_fingerprints

        return winnow_fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_ocr_markdown(sf_dir: str):
        """Markdown rendering of extracted docs (exporter surface).

        Grouped through the bucketed-assembly shuffle — a doc whose
        span rows straddle two blocks must still emit ONE markdown row
        (block layout is never a grouping guarantee)."""
        import pandas as pd

        import functools

        from doctr_ray.exporters import escape_markdown
        from doctr_ray.pipelines.ocr import _add_bucket, assembly_buckets_for

        spans = ocr_spans(_docs_ds(sf_dir, limit=100))

        def to_md(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for did, gg in g.groupby("doc_id", sort=False):
                gg = gg.sort_values("ord")
                body = "\n\n".join(escape_markdown(t) for t in gg["text"] if t)
                out.append({"doc_id": did, "markdown": body})
            return pd.DataFrame(out)

        return (
            spans.map_batches(
                functools.partial(_add_bucket, buckets=assembly_buckets_for(100)),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(to_md, batch_format="pandas")
        )

    def q_multimodal_features(sf_dir: str):
        """Opaque binary-column features (multimodal plumbing): payloads
        derived from documents.text — size/sha256/magic are exactly
        SQL-reproducible, so the binary-column stage gets a hard oracle."""
        import pyarrow as pa

        from doctr_ray.functions.multimodal import binary_features

        def to_payloads(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"].to_pylist(),
                    "payload": pa.array(
                        [(t or "").encode("utf-8") for t in batch["text"].to_pylist()],
                        pa.binary(),
                    ),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(to_payloads, batch_format="pyarrow")
            .map_batches(binary_features, batch_format="pyarrow")
            .select_columns(["doc_id", "size_bytes", "sha256", "magic"])
        )

    def q_image_decode(sf_dir: str):
        """REAL multimodal image decode: every document gets a
        deterministic checkerboard image (two doc-derived gray values,
        doc-derived dims), ENCODED into a rotating real format (PNG /
        BMP / PNM / GIF / TIFF-deflate), carried as an Arrow binary
        column, and DECODED back inside the map stage by the in-repo
        codec matrix. The oracle recomputes height/width and the exact
        integer pixel sum from the same integer rule — the whole
        encode -> binary column -> decode -> feature chain must be
        lossless."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.multimodal import image_decode_features

        def build(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.gifcodec import encode_gif
            from doctr_ray.sources.imagecodec import (
                encode_bmp,
                encode_png,
                encode_pnm,
                encode_tiff,
            )

            enc = {
                "png": encode_png,
                "bmp": encode_bmp,
                "pnm": encode_pnm,
                "gif": encode_gif,
                "tiff": lambda im: encode_tiff(im, "deflate"),
            }
            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            payloads, fmts = [], []
            for did, t in zip(ids, texts):
                d, L = int(did), len(t or "")
                v1 = (d * 37 + L) % 256
                v2 = (v1 + 91) % 256
                h = 16 + d % 17
                w = 16 + (d * 7) % 23
                idx = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(
                    np.uint8
                )
                img = np.where(idx == 0, np.uint8(v1), np.uint8(v2))
                fmt = ("png", "bmp", "pnm", "gif", "tiff")[d % 5]
                payloads.append(enc[fmt](img))
                fmts.append(fmt)
            return pa.Table.from_pydict(
                {
                    "doc_id": [str(i) for i in ids],
                    "fmt": fmts,
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(build, batch_format="pyarrow")
            .map_batches(image_decode_features, batch_format="pyarrow")
        )

    def q_audio_decode(sf_dir: str):
        """REAL multimodal audio decode: every document gets a
        deterministic int16 sawtooth waveform (coefficients and length
        doc-derived), ENCODED as a real RIFF/WAVE PCM file into an
        Arrow binary column and DECODED back by the in-repo WAV codec
        inside the map stage. The oracle recomputes frame count, rate
        and the exact integer sum of absolute samples with a LATERAL
        generate_series — the encode -> binary -> decode chain must be
        sample-exact."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.multimodal import audio_decode_features

        def build(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.audiocodec import encode_wav

            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            payloads = []
            for did, t in zip(ids, texts):
                d, L = int(did), len(t or "")
                n = 400 + d % 200
                a, b = d * 13 + 7, d * 31 + L
                tt = np.arange(n, dtype=np.int64)
                v = ((a * tt + b) % 65536 - 32768).astype(np.int16)
                payloads.append(encode_wav(v, 8000 + (d % 5) * 1000))
            return pa.Table.from_pydict(
                {
                    "doc_id": [str(i) for i in ids],
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(build, batch_format="pyarrow")
            .map_batches(audio_decode_features, batch_format="pyarrow")
        )

    def q_audio_compressed(sf_dir: str):
        """REAL compressed-audio decode (round 5): each document's
        waveform is encoded with a rotating COMPRESSED codec — FLAC
        (lossless; encoder knobs rotate across stereo decorrelation /
        LPC / partitioned Rice so the full decoder surface runs
        in-pipeline), G.711 mu-law and A-law (lossy 2:1 companders) —
        carried as an Arrow binary column and decoded back by the
        in-repo codecs (sources/flaccodec, sources/audiocodec) inside
        the map stage. The oracle recomputes the decode EXACTLY in
        SQL: FLAC rows are lossless (identity on the generated
        samples), mu-law/A-law rows apply the G.711 compander transfer
        function as an integer segment ladder."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.multimodal import audio_decode_features

        def build(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.audiocodec import encode_wav_g711
            from doctr_ray.sources.flaccodec import encode_flac

            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            payloads, codecs = [], []
            for did, t in zip(ids, texts):
                d, L = int(did), len(t or "")
                n = 400 + d % 200
                a, b = d * 13 + 7, d * 31 + L
                tt = np.arange(n, dtype=np.int64)
                v = ((a * tt + b) % 65536 - 32768).astype(np.int16)
                rate = 8000 + (d % 5) * 1000
                which = d % 3
                if which == 0:
                    a2, b2 = d * 17 + 3, d * 29 + 11
                    v2 = ((a2 * tt + b2) % 65536 - 32768).astype(np.int16)
                    x = np.stack([v, v2], axis=1)
                    stereo = (
                        "independent", "left_side", "right_side", "mid_side"
                    )[(d // 3) % 4]
                    payloads.append(
                        encode_flac(
                            x, rate, block_size=256, stereo=stereo,
                            lpc=bool((d // 12) % 2),
                            partition_order=2 if (d // 24) % 2 else 0,
                            method=(d // 48) % 2,
                        )
                    )
                    codecs.append("flac")
                elif which == 1:
                    payloads.append(encode_wav_g711(v, rate, "mulaw"))
                    codecs.append("mulaw")
                else:
                    payloads.append(encode_wav_g711(v, rate, "alaw"))
                    codecs.append("alaw")
            return pa.Table.from_pydict(
                {
                    "doc_id": [str(i) for i in ids],
                    "codec": codecs,
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=100)
            .map_batches(build, batch_format="pyarrow")
            .map_batches(audio_decode_features, batch_format="pyarrow")
        )

    def q_audio_adpcm(sf_dir: str):
        """REAL IMA ADPCM decode (WAV tag 0x11, 4-bit blocks, ~4:1):
        each document's triangle waveform is ADPCM-encoded and decoded
        back by the in-repo codec inside the map stage. ADPCM's decode
        recurrence is sequential per-nibble state (predictor + step
        index), not SQL-expressible at reasonable cost, so the oracle
        is the structural contract (frame count via the fact chunk,
        rate, channels) plus a non-vacuous tracking invariant:
        track_ok = 1 iff the decoded signal stays within 768 LSB of
        the original everywhere (measured worst case 253 across the
        doc_id domain) — wrong step/index tables, nibble order,
        clamping or block/fact handling all break it."""
        import numpy as np
        import pyarrow as pa

        def stage(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.audiocodec import (
                decode_wav,
                encode_wav_ima_adpcm,
            )

            rows = {k: [] for k in (
                "doc_id", "n_frames", "sample_rate", "channels", "track_ok"
            )}
            for did in batch["doc_id"].to_pylist():
                d = int(did)
                n = 500 + d % 300
                period = 64 + d % 64
                slope = 40 + d % 80
                tt = np.arange(n, dtype=np.int64)
                tri = np.abs((tt % (2 * period)) - period)
                v = (tri * slope - (period * slope) // 2).astype(np.int16)
                ch = 1 + d % 2
                x = (
                    v[:, None]
                    if ch == 1
                    else np.stack([v, (-v).astype(np.int16)], axis=1)
                )
                rate = 8000 + (d % 4) * 2000
                wav = encode_wav_ima_adpcm(x, rate, samples_per_block=249)
                dec, r = decode_wav(wav)
                err = np.abs(dec.astype(np.int64) - x.astype(np.int64)).max()
                rows["doc_id"].append(str(d))
                rows["n_frames"].append(dec.shape[0])
                rows["sample_rate"].append(r)
                rows["channels"].append(dec.shape[1])
                rows["track_ok"].append(int(err <= 768))
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(rows["doc_id"]),
                    "n_frames": pa.array(rows["n_frames"], pa.int64()),
                    "sample_rate": pa.array(rows["sample_rate"], pa.int64()),
                    "channels": pa.array(rows["channels"], pa.int64()),
                    "track_ok": pa.array(rows["track_ok"], pa.int64()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id"], rows_per_block=100)
            .map_batches(stage, batch_format="pyarrow")
        )

    def q_video_frames(sf_dir: str):
        """REAL multimodal video decode (round 5): every document gets
        a deterministic checkerboard ANIMATION (per-frame doc-derived
        gray values), encoded into a rotating real VIDEO container —
        animated GIF89a (sub-rect + transparency inter-frame coding,
        disposal rotating), AVI with uncompressed DIB frames, or APNG
        (acTL/fcTL/fdAT, sub-rect rotating) — all lossless, carried as
        an Arrow binary column, and decoded back inside the map stage
        (sources/gifcodec.decode_gif_frames / sources/avicodec.
        decode_avi / sources/imagecodec.decode_apng_frames). The oracle recomputes every
        sampled frame's dims and exact integer gray pixel sum from the
        same integer rule. (AVI-MJPG decodes for real too but is
        lossy; it is pinned in pytest instead of the value oracle.)"""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.multimodal import video_frame_features

        def build(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.avicodec import encode_avi
            from doctr_ray.sources.gifcodec import encode_gif_animation
            from doctr_ray.sources.imagecodec import encode_apng

            ids = batch["doc_id"].to_pylist()
            payloads, containers = [], []
            for did in ids:
                d = int(did)
                nf, h, w = 6 + d % 5, 16 + d % 9, 16 + (d * 7) % 11
                idx = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(
                    np.uint8
                )
                frames = np.stack(
                    [
                        np.where(
                            idx == 0,
                            np.uint8((d * 37 + f * 11) % 256),
                            np.uint8((d * 37 + f * 11 + 91) % 256),
                        )
                        for f in range(nf)
                    ]
                )
                if d % 3 == 0:
                    payloads.append(
                        encode_gif_animation(
                            frames,
                            subrect=bool((d // 3) % 2),
                            disposal=(d // 6) % 2,
                        )
                    )
                    containers.append("gif")
                elif d % 3 == 1:
                    payloads.append(encode_avi(frames, fps=10, codec="DIB "))
                    containers.append("avi")
                else:
                    payloads.append(
                        encode_apng(frames, subrect=bool((d // 3) % 2))
                    )
                    containers.append("apng")
            return pa.Table.from_pydict(
                {
                    "media_id": [str(i) for i in ids],
                    "container": containers,
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id"], rows_per_block=100)
            .map_batches(build, batch_format="pyarrow")
            .map_batches(video_frame_features, batch_format="pyarrow")
        )

    def q_video_mjpeg(sf_dir: str):
        """REAL Motion-JPEG-in-AVI decode: each document's checkerboard
        animation is MJPG-encoded (one baseline JPEG per '00dc' chunk,
        in-repo jpegcodec) and decoded back inside the map stage. JPEG
        is lossy so pixel sums are not SQL-recomputable; the oracle is
        the structural contract (sampled frame indices and dims) plus
        a non-vacuous fidelity invariant: mjpeg_ok = 1 iff every
        decoded pixel is within 8 LSB of the two-tone source (measured
        max 6 across the doc_id domain incl. odd block-padded dims;
        a wrong DCT/quantizer/upsampler breaks it)."""
        import numpy as np
        import pyarrow as pa

        def stage(batch: pa.Table) -> pa.Table:
            from doctr_ray.sources.avicodec import decode_avi, encode_avi

            rows = {k: [] for k in (
                "media_id", "frame_idx", "height", "width", "mjpeg_ok"
            )}
            for did in batch["doc_id"].to_pylist():
                d = int(did)
                nf, h, w = 6 + d % 5, 16 + d % 9, 16 + (d * 7) % 11
                idx = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(
                    np.uint8
                )
                frames = np.stack(
                    [
                        np.where(
                            idx == 0,
                            np.uint8((d * 37 + f * 11) % 256),
                            np.uint8((d * 37 + f * 11 + 91) % 256),
                        )
                        for f in range(nf)
                    ]
                )
                dec, _fps = decode_avi(encode_avi(frames, codec="MJPG"))
                src = np.stack([frames] * 3, axis=3).astype(np.int64)
                for fi in range(0, nf, 2):
                    err = np.abs(dec[fi].astype(np.int64) - src[fi]).max()
                    rows["media_id"].append(str(d))
                    rows["frame_idx"].append(fi)
                    rows["height"].append(dec[fi].shape[0])
                    rows["width"].append(dec[fi].shape[1])
                    rows["mjpeg_ok"].append(int(err <= 8))
            return pa.Table.from_pydict(
                {
                    "media_id": pa.array(rows["media_id"]),
                    "frame_idx": pa.array(rows["frame_idx"], pa.int64()),
                    "height": pa.array(rows["height"], pa.int64()),
                    "width": pa.array(rows["width"], pa.int64()),
                    "mjpeg_ok": pa.array(rows["mjpeg_ok"], pa.int64()),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id"], rows_per_block=100)
            .map_batches(stage, batch_format="pyarrow")
        )

    def q_frame_sample(sf_dir: str):
        """Video frame-sampling fan-out (stubbed decoder, deterministic
        fake): the structural contract — one payload row -> stride-
        sampled frame rows with shape metadata — is SQL-oracled; frame
        bytes are checked by unit tests."""
        import pyarrow as pa

        from doctr_ray.functions.multimodal import FrameSampler
        from doctr_ray.pool import default_pool

        def to_payloads(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "media_id": [str(d) for d in batch["doc_id"].to_pylist()],
                    "payload": pa.array(
                        [(t or "").encode("utf-8") for t in batch["text"].to_pylist()],
                        pa.binary(),
                    ),
                }
            )

        ds = (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .limit(200)
            .map_batches(to_payloads, batch_format="pyarrow")
            .map_batches(
                FrameSampler,
                fn_constructor_kwargs={"stride": 10, "source_frames": 50},
                batch_format="pyarrow",
                batch_size=64,
                concurrency=max(1, default_pool() // 2),
            )
        )
        return ds.select_columns(["media_id", "frame_idx", "height", "width"])

    def q_chunk_dedup(sf_dir: str):
        """C4-style sub-document dedup: fixed token chunks hashed and
        counted globally; per-doc duplicated-chunk fraction."""
        from doctr_ray.functions.dedup import chunk_dedup_stats

        return chunk_dedup_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_embedding_clusters(sf_dir: str):
        """Distributed Lloyd's k-means over the embeddings table —
        centroids are the only mutable state (broadcast per round, one
        streaming partial-sums pass each). Iterative float clustering
        is not SQL-expressible, so this query is rows-only at the
        driver; exactness vs a driver-side numpy reference (identical
        init + iterations) and partitioning-independence are pinned in
        tests/test_functions.py."""
        from doctr_ray.functions.similarity import kmeans_embeddings

        assigns, _C = kmeans_embeddings(
            _emb(sf_dir), k=8, iters=10
        )
        return assigns

    def q_bpe_merges(sf_dir: str):
        """Distributed BPE tokenizer training (Sennrich 2016): ONE
        corpus-scale word-count pass, then merge iterations over the
        compressed word-type table driver-side; the merge table is the
        shipped artifact. Iterative — not SQL-expressible, rows-only at
        the driver; parity vs a textbook full-recount trainer and
        partitioning invariance are pinned in tests/test_bpe.py."""
        from doctr_ray.functions.bpe import train_bpe

        return train_bpe(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            num_merges=200,
            max_word_types=50_000,
        )

    def q_bpe_encode(sf_dir: str):
        """Apply the learned merge table corpus-wide: (doc_id, n_words,
        n_bpe_tokens). The table broadcasts once via ray.put into a
        task stage. Depends on the iterative trainer -> rows-only;
        lossless-encode and compression invariants pinned in tests."""
        from doctr_ray.functions.bpe import apply_bpe, train_bpe

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        merges = train_bpe(
            docs, num_merges=200, max_word_types=50_000
        ).to_pandas()
        return apply_bpe(docs, merges)

    def q_kmeans_cluster_cover(sf_dir: str):
        """Oracled invariants of the rows-only embedding_clusters query
        (VERDICT r4 #6): every embeddings row receives exactly one
        in-range assignment. Computed as streaming per-batch partials
        over the assignment Dataset (never a driver pull of the rows);
        the SQL twin counts the table. The float clustering itself
        stays rows-only — this companion makes its driver gate
        value-checked."""
        import pyarrow as pa

        from doctr_ray.functions.similarity import kmeans_embeddings

        assigns, _C = kmeans_embeddings(_emb(sf_dir), k=8, iters=10)

        def _partial(batch: pa.Table) -> pa.Table:
            c = batch["cluster"].to_numpy()
            return pa.Table.from_pydict(
                {
                    "n_points": [len(c)],
                    "n_in_range": [int(((c >= 0) & (c < 8)).sum())],
                }
            )

        parts = assigns.map_batches(_partial, batch_format="pyarrow").to_pandas()
        return pa.table(
            {
                "n_points": pa.array([int(parts["n_points"].sum())], pa.int64()),
                "n_in_range": pa.array([int(parts["n_in_range"].sum())], pa.int64()),
            }
        )

    def q_bpe_merge_growth(sf_dir: str):
        """Oracled invariants of the rows-only bpe_merges artifact
        (VERDICT r4 #6): the merge table carries exactly num_merges
        contiguous ranks, every merged token is NEW (vocab grows by
        one per merge), and every side is derivable — a base symbol
        (single char / end-of-word) or an earlier merge's product. A
        buggy merge loop (skipped rank, pair referencing a
        never-created token, duplicate product) flips a count."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.bpe import train_bpe

        merges = train_bpe(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            num_merges=200,
            max_word_types=50_000,
        ).to_pandas()  # <= 200 rows: the shipped artifact itself
        # the merge loop may exhaust before num_merges on small
        # corpora (sf0.01 yields 106), so the oracle pins VIOLATION
        # counts (always 0) plus non-emptiness, not the merge count
        n = len(merges)
        rank_breaks = int((merges["rank"].to_numpy() != np.arange(n)).sum())
        vocab: set[str] = set()
        underivable = dup_product = 0
        for left, right, merged in zip(merges["left"], merges["right"], merges["merged"]):
            if (len(left) > 1 and left not in vocab) or (
                len(right) > 1 and right not in vocab
            ):
                underivable += 1
            if merged in vocab:
                dup_product += 1
            vocab.add(merged)
        return pa.table(
            {
                "has_merges": pa.array([int(n > 0)], pa.int64()),
                "n_rank_breaks": pa.array([rank_breaks], pa.int64()),
                "n_underivable": pa.array([underivable], pa.int64()),
                "n_dup_products": pa.array([dup_product], pa.int64()),
            }
        )

    def q_bpe_encode_bounds(sf_dir: str):
        """Oracled per-doc invariants of the rows-only bpe_encode query
        (VERDICT r4 #6): the exact whitespace word count (SQL recomputes
        it from text) and the lower bound n_bpe_tokens >= n_words
        (every word encodes to at least one symbol)."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.bpe import apply_bpe, train_bpe

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        merges = train_bpe(docs, num_merges=200, max_word_types=50_000).to_pandas()

        def _flags(batch: pa.Table) -> pa.Table:
            nw = batch["n_words"].to_numpy()
            nt = batch["n_bpe_tokens"].to_numpy()
            return pa.Table.from_arrays(
                [
                    batch["doc_id"],
                    batch["n_words"],
                    pa.array((nt >= nw).astype(np.int64)),
                ],
                names=["doc_id", "n_words", "lower_ok"],
            )

        return apply_bpe(docs, merges).map_batches(_flags, batch_format="pyarrow")

    def q_ann_lsh_recall(sf_dir: str):
        """Oracled recall gate for the rows-only ann_topk_lsh query
        (VERDICT r4 #6): recall measured in-engine against the exact
        brute-force top-k (which has its own hard SQL oracle); both
        results are k-row pulls. Measured multiprobe-1 recall: 0.20 at
        sf0.01, 0.30 at sf0.1 — the 0.15 bound holds with margin while
        still failing on real breakage (recall was 0.10-0.12 before
        multi-probe)."""
        import pyarrow as pa

        exact = ann_topk(_emb(sf_dir), _ann_queries(sf_dir), k=ANN_K).to_pandas()
        lsh = ann_topk_lsh(_emb(sf_dir), _ann_queries(sf_dir), k=ANN_K).to_pandas()
        expected = set(zip(exact["query_id"], exact["vec_id"]))
        hits = sum((q, v) in expected for q, v in zip(lsh["query_id"], lsh["vec_id"]))
        return pa.table(
            {
                "n_expected": pa.array([len(expected)], pa.int64()),
                "recall_ok": pa.array(
                    [int(hits / max(len(expected), 1) >= 0.15)], pa.int64()
                ),
            }
        )

    def q_bm25_search(sf_dir: str):
        """Distributed lexical retrieval: two-phase BM25 top-k (stats
        pass -> broadcast -> per-batch scoring with partial top-k)."""
        from doctr_ray.functions.search import bm25_topk

        return bm25_topk(
            _read(sf_dir, "documents", ["doc_id", "text"]), BM25_QUERY, k=20
        )

    def q_doc_repetition(sf_dir: str):
        """Gopher-style repetition signals (top-bigram share, type-token
        ratio) — the filter inputs for boilerplate/spam removal."""
        from doctr_ray.functions.text import repetition_stats

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            repetition_stats, batch_format="pyarrow"
        )

    def q_pdf_native(sf_dir: str):
        """PDF native-text path: every document is written as a real
        (Flate-compressed, multi-page) PDF and read back through the
        pure-stdlib text-layer extractor INSIDE the map task — bytes
        never touch the driver. The layout rotates per row through
        FOUR producer forms: PDF 1.5 /ObjStm + /XRef stream,
        AES-128 ENCRYPTED (standard handler, empty user password),
        a TAGGED SUBSET FONT with a /ToUnicode CMap (private glyph
        codes mapped back to text — no rasterization), and the plain
        classic body. The oracle is identity on the source text: the
        whole encode -> (objstm/encrypt/subset-font) -> parse ->
        decode chain must be lossless."""
        import pyarrow as pa

        from doctr_ray.sources.pdfcrypt import encrypt_pdf
        from doctr_ray.sources.pdffont import make_truetype_pdf
        from doctr_ray.sources.pdfimage import repack_with_objstm
        from doctr_ray.sources.pdftext import extract_pdf_text, make_simple_pdf

        def roundtrip(batch: pa.Table) -> pa.Table:
            out = []
            for k, t in enumerate(batch["text"].to_pylist()):
                toks = (t or "").split(" ")
                lines = [" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)]
                pages = [lines[: len(lines) // 2 + 1], lines[len(lines) // 2 + 1 :]]
                pages = [p for p in pages if p]
                if k % 4 == 2:
                    pdf = make_truetype_pdf(pages, to_unicode=True)
                else:
                    pdf = make_simple_pdf(pages)
                    if k % 4 == 0:
                        pdf = repack_with_objstm(pdf)
                    elif k % 4 == 1:
                        pdf = encrypt_pdf(pdf, revision=4)
                out.append(" ".join(extract_pdf_text(pdf)))
            return pa.Table.from_arrays(
                [pa.compute.cast(batch["doc_id"], pa.string()), pa.array(out, pa.string())],
                names=["doc_id", "text"],
            )

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            roundtrip, batch_format="pyarrow"
        )

    def q_normalize_text(sf_dir: str):
        """Unicode NFC + whitespace canonicalization (the cleaning
        stage ahead of dedup hashing). The raw corpus is already clean
        ASCII, so — like pii_redact — the text is deterministically
        dirtied from doc_id (decomposed accents, tabs, doubled and
        trailing spaces) on BOTH sides before cleaning; a vacuous
        oracle would prove nothing."""
        import pyarrow as pa

        from doctr_ray.functions.text import normalize_clean

        def dirty(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = df["doc_id"]
            aug = df["text"].fillna("").copy()
            m = d % 3 == 0
            aug[m] = "Cafe\u0301  " + aug[m]  # decomposed acute: NFC must touch it
            m = d % 2 == 0
            aug[m] = aug[m] + "\tAngstro\u0308m"  # decomposed diaeresis
            m = d % 5 == 0
            aug[m] = aug[m] + "   "
            return pa.Table.from_pydict({"doc_id": d, "text": aug})

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(dirty, batch_format="pyarrow")
            .map_batches(normalize_clean, batch_format="pyarrow")
        )

    def q_pii_redact(sf_dir: str):
        """PII scan + redaction (emails/phones/IPv4 -> placeholders).
        The corpus text is deterministically augmented with synthetic
        PII derived from doc_id (the raw corpus contains none) — the
        SQL oracle applies the identical augmentation, then both sides
        run the same ordered RE2 rules."""
        import pyarrow as pa

        from doctr_ray.functions.pii import pii_scan

        def augment(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = df["doc_id"]
            aug = df["text"].copy()
            m = d % 3 == 0
            aug[m] += " Contact user" + d[m].astype(str) + "@example.org now"
            m = d % 5 == 0
            aug[m] += (
                " from 192.168."
                + (d[m] % 256).astype(str)
                + "."
                + (d[m] % 100).astype(str)
            )
            m = d % 7 == 0
            aug[m] += " call +1-202-555-" + (d[m] % 10000).astype(str).str.zfill(4)
            return pa.Table.from_arrays(
                [batch["doc_id"], pa.array(aug, pa.string())],
                names=["doc_id", "text"],
            )

        return pii_scan(
            _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
                augment, batch_format="pyarrow"
            )
        )

    def q_decontamination(sf_dir: str):
        """Benchmark decontamination: 8-gram overlap of the train split
        against the deterministic eval slice (doc_id % 97 == 0) —
        broadcast eval grams, streaming train scan, zero shuffle.
        A fixed 12-token "benchmark passage" is appended to every
        doc_id % 13 == 0 document on BOTH sides (doc 0 is eval and
        carries it into the eval gram set), so real contamination hits
        are exercised, not just the zero case."""
        import pyarrow as pa

        from doctr_ray.functions.decontam import BENCH_PASSAGE, decontaminate

        def augment(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            m = df["doc_id"] % 13 == 0
            aug = df["text"].copy()
            aug[m] += " " + BENCH_PASSAGE
            return pa.Table.from_arrays(
                [batch["doc_id"], pa.array(aug, pa.string())],
                names=["doc_id", "text"],
            )

        return decontaminate(
            _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
                augment, batch_format="pyarrow"
            )
        )

    def q_bpe_tokens(sf_dir: str):
        """Subword-ish token counting (GPT-2-style RE2 pre-tokenizer):
        the token-budget signal, one vectorized regex scan per batch."""
        from doctr_ray.functions.text import bpe_token_stats

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            bpe_token_stats, batch_format="pyarrow"
        )

    def q_doc_commonness(sf_dir: str):
        """Pruned-vocab unigram commonness (CCNet-style LM quality
        proxy): corpus top-1000 vocab pass -> broadcast -> integer-exact
        per-doc score."""
        from doctr_ray.functions.text import doc_commonness

        return doc_commonness(_read(sf_dir, "documents", ["doc_id", "text"]), k=1000)

    def q_filter_gate_audit(sf_dir: str):
        """Gate-combination census over the cleaning signals (the
        'what is rejecting my corpus' debugging view) — one pass,
        <= 16 counter rows, no data-row shuffle."""
        from doctr_ray.functions.audit import filter_gate_audit

        return filter_gate_audit(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_lang_source_pivot(sf_dir: str):
        """PIVOT crosstab: per-source language counts as columns."""
        from doctr_ray.functions.audit import lang_source_pivot

        return lang_source_pivot(
            _read(sf_dir, "documents", ["doc_id", "text", "source"])
        )

    def q_ann_topk_filtered(sf_dir: str):
        """Predicate-gated exact ANN (the RAG shape): cosine top-k over
        vectors whose document passes lang='en' AND n_chars >= 200.
        The gate is a co-partitioned semi-join (both sides shuffle once
        on vec_id & mask) — the allowed set is corpus-sized, only the
        query matrix broadcasts."""
        import pyarrow.parquet as pq

        from doctr_ray.functions.similarity import ann_topk_filtered

        from doctr_ray.tableio import table_num_rows

        n_rows = table_num_rows(sf_dir, "embeddings")
        allowed = (
            _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
            .filter(expr="lang == 'en' and n_chars >= 200")
            .select_columns(["doc_id"])
        )
        return ann_topk_filtered(
            _emb(sf_dir), allowed, _ann_queries(sf_dir), k=ANN_K, rows_hint=n_rows
        )

    def q_rag_chunks(sf_dir: str):
        """RAG ingest chunking: overlapping 128-token windows every 96
        tokens — pure per-row fan-out, zero shuffle."""
        from doctr_ray.functions.text import rag_chunks

        return rag_chunks(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_quantile_gated(sf_dir: str):
        """Percentile-gated filter: keep docs at or above their OWN
        source's exact p25 length — exact-quantile pass, broadcast
        thresholds, vectorized gate; zero shuffle of data rows."""
        from doctr_ray.functions.stats import quantile_gated_docs

        return quantile_gated_docs(
            _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        )

    def q_embedding_quantize(sf_dir: str):
        """Symmetric int8 embedding quantization — the 4x-storage op
        for cluster-scale ANN indexes; bit-identical sign*floor
        half-away rounding on both engines; zero shuffle."""
        from doctr_ray.functions.similarity import embedding_quantize

        return embedding_quantize(_emb(sf_dir))

    def q_source_distinct(sf_dir: str):
        """EXACT distinct tokens per source — the precise counterpart
        to hll_registers (sketch-vs-exact trade-off pairing): distinct
        (source, hash) int64 pairs shuffle once, raw tokens never."""
        import pyarrow.parquet as pq

        from doctr_ray.functions.sketch import source_distinct_tokens

        from doctr_ray.tableio import table_num_rows

        n_rows = table_num_rows(sf_dir, "documents")
        return source_distinct_tokens(
            _read(sf_dir, "documents", ["source", "text"]), rows_hint=n_rows
        )

    def q_hll_registers(sf_dir: str):
        """HyperLogLog register file per source: fixed-size mergeable
        distinct-count state — the shuffle moves register partials,
        never tokens. Registers (not the estimate) are integer-exact,
        so the oracle reproduces them in SQL."""
        from doctr_ray.functions.sketch import hll_registers

        return hll_registers(_read(sf_dir, "documents", ["source", "text"]), b=12)

    def q_cms_top_tokens(sf_dir: str):
        """Count-Min heavy hitters: true top-20 tokens with exact and
        CMS-estimated counts in ONE corpus pass (tagged sketch + token
        partials share one coarse shuffle)."""
        import pyarrow.parquet as pq

        from doctr_ray.functions.sketch import cms_top_tokens

        from doctr_ray.tableio import table_num_rows

        n_rows = table_num_rows(sf_dir, "documents")
        return cms_top_tokens(
            _read(sf_dir, "documents", ["text"]), k=20, rows_hint=n_rows
        )

    def q_stratified_sample(sf_dir: str):
        """Balanced per-source eval-set draw: exactly n rows per source
        by smallest md5(doc_id|salt) — membership independent of
        parallelism; one adaptive coarse shuffle of n x groups rows."""
        import pyarrow.parquet as pq

        from doctr_ray.functions.sampling import stratified_sample

        from doctr_ray.tableio import table_num_rows

        n_rows = table_num_rows(sf_dir, "documents")
        return stratified_sample(
            _read(sf_dir, "documents", ["doc_id", "source"]),
            n_per_group=5,
            rows_hint=n_rows,
        )

    def q_doc_sample(sf_dir: str):
        """Deterministic 10% sample — md5-keyed membership, identical
        across runs/retries/cluster sizes; no shuffle, no RNG state."""
        from doctr_ray.functions.sampling import deterministic_sample

        ds = deterministic_sample(
            _read(sf_dir, "documents", ["doc_id", "text"]), rate=0.1
        )
        return ds.map_batches(
            lambda b: b.append_column(
                "n_chars",
                __import__("pyarrow").compute.utf8_length(b["text"]),
            ).drop_columns(["text"]),
            batch_format="pyarrow",
        )

    def q_epoch_shuffle(sf_dir: str):
        """Deterministic epoch shuffle: keyed-hash global sort (the
        reproducible, resumable alternative to random_shuffle), head-k
        with ranks as the verification surface."""
        from doctr_ray.functions.sampling import epoch_shuffle_head

        return epoch_shuffle_head(_read(sf_dir, "documents", ["doc_id"]), epoch=1)

    def q_doc_split(sf_dir: str):
        """Deterministic 90/5/5 train/val/test labels per document."""
        from doctr_ray.functions.sampling import hash_split

        return hash_split(
            _read(sf_dir, "documents", ["doc_id"])
        ).select_columns(["doc_id", "split"])

    def q_dup_ngrams(sf_dir: str):
        """Cross-doc duplicate n-gram fraction (MassiveText signal):
        sliding 8-grams, distinct-doc dup rule, two honest shuffles of
        md5 rows only — never text."""
        from doctr_ray.functions.dedup import dup_ngram_stats

        return dup_ngram_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_substring_dup(sf_dir: str):
        """Exact substring-level duplication (Lee et al. 2022 signal):
        character 32-gram positions duplicated across documents, via
        int64 double rolling-hash keys — the shuffle never carries
        gram strings."""
        from doctr_ray.functions.dedup import substring_dup_stats

        return substring_dup_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_seq_packing(sf_dir: str):
        """GPT-style concat-and-chunk packing layout: which training
        sequence(s) each doc lands in. Shuffles (doc_id, n_tokens,
        bucket) triples only — never text; fixed 8 streams so the SQL
        window oracle recomputes the identical layout."""
        from doctr_ray.functions.packing import pack_layout

        return pack_layout(
            _read(sf_dir, "documents", ["doc_id", "text"]), seq_len=512, buckets=8
        )

    def q_source_mix(sf_dir: str):
        """Deterministic source mixing (Pile/Dolma-style): largest
        corpus with the target per-source proportions, membership by
        integer md5 threshold — tiny count aggregate + one filter pass."""
        from doctr_ray.functions.packing import source_mix

        return source_mix(
            _read(sf_dir, "documents", ["doc_id", "source"]), _MIX_WEIGHTS
        )

    def q_corpus_filter(sf_dir: str):
        """Composed C4/Gopher cleaning chain: language + repetition +
        quality gates then exact-dedup keep-first — one signal pass
        (text never leaves it) + one coarse fp-bucket shuffle."""
        from doctr_ray.functions.filter_chain import corpus_filter

        return corpus_filter(
            _read(sf_dir, "documents", ["doc_id", "text", "source"])
        )

    def q_bloom_dedup(sf_dir: str):
        """Incremental-ingest dedup: Bloom filter over the base corpus
        (doc_id % 5 != 0) broadcast once, incoming shard flagged in one
        map_batches pass — oracle reproduces the exact flag set,
        false positives included."""
        import numpy as np
        import pyarrow as pa

        from doctr_ray.functions.bloom import incremental_dedup_flags

        def _part(keep_incoming: bool):
            def _f(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                mask = (ids % 5 == 0) == keep_incoming
                return batch.filter(pa.array(mask))

            return _f

        base = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _part(False), batch_format="pyarrow"
        )
        incoming = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _part(True), batch_format="pyarrow"
        )
        return incremental_dedup_flags(base, incoming)

    def q_fuzzy_name_pairs(sf_dir: str):
        """Fuzzy join (record linkage): customer-name pairs at edit
        distance 1 via deletion-neighborhood blocking — two coarse
        shuffles of variant/pair rows; the O(n^2) Levenshtein oracle
        is the recall gate at sf0.01."""
        from doctr_ray.functions.fuzzy import fuzzy_pairs

        return fuzzy_pairs(_read(sf_dir, "customer", ["c_name"]), "c_name")

    def q_source_moments(sf_dir: str):
        """Exact distributed moments (mergeable n/sum/sumsq partials,
        HUGEINT-exact fixed-point mean and population variance)."""
        from doctr_ray.functions.stats import group_moments

        return group_moments(
            _read(sf_dir, "documents", ["source", "n_chars"]), "n_chars", "source"
        )

    def q_top_tokens_by_source(sf_dir: str):
        """Grouped top-k ranking (ROW_NUMBER-window shape): 5 most
        frequent tokens per source, partial counts shuffled as
        (source, token, n) pairs only."""
        from doctr_ray.functions.text import top_tokens_by_group

        return top_tokens_by_group(
            _read(sf_dir, "documents", ["source", "text"]), "source", k=5
        )

    def q_doc_length_quantiles(sf_dir: str):
        """Exact distributed quantiles (histogram-merge): per-source
        document-length percentiles; the shuffle moves (source, value,
        count) partials only, and integer ceil-rank arithmetic matches
        DuckDB's quantile_disc bit-for-bit."""
        from doctr_ray.functions.stats import group_quantiles

        return group_quantiles(
            _read(sf_dir, "documents", ["source", "n_chars"]),
            value_col="n_chars",
            group_col="source",
        )

    def q_pretraining_corpus(sf_dir: str):
        """The composed Dolma-shaped chain (filter -> mix -> pack) as
        ONE operator, hash-gated end-to-end against a single spliced
        SQL statement — composition introduces no new semantics."""
        from doctr_ray.functions.pretrain import pretraining_corpus

        return pretraining_corpus(
            _read(sf_dir, "documents", ["doc_id", "text", "source"]), _MIX_WEIGHTS
        )

    def q_dedup_exact(sf_dir: str):
        return exact_dedup_groups(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_dedup_keep_first(sf_dir: str):
        ds = exact_dedup_keep_first(_read(sf_dir, "documents", ["doc_id", "text"]))
        return ds.select_columns(["doc_id", "fp"])

    def q_minhash_dups(sf_dir: str):
        return minhash_near_dups(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
        )

    def q_simhash_dups(sf_dir: str):
        return simhash_near_dups(
            _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=8
        )

    def q_dedup_jaccard(sf_dir: str):
        from doctr_ray.functions.dedup import jaccard_pairs_exact

        return jaccard_pairs_exact(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
        )

    def q_dedup_clusters(sf_dir: str):
        """Near-dup pairs -> transitive-closure clusters: the operator
        that turns pairwise LSH matches into actual dedup groups.
        Pair generation is the scale path (MinHash+LSH, recall 1 on
        this corpus per the dedup_minhash oracle); clustering is
        distributed hash-min + pointer-jump label propagation."""
        from doctr_ray.functions.dedup import connected_components

        pairs = minhash_near_dups(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
        )
        return connected_components(pairs)

    def q_dedup_embedding(sf_dir: str):
        from doctr_ray.functions.dedup import embedding_near_dups

        return embedding_near_dups(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            threshold=0.5,
            n_planes=0,  # exact within-bucket verify (oracle = O(n^2) join)
        )

    def q_gopher_quality(sf_dir: str):
        """The FULL Gopher quality rule set (Rae et al. 2021 A1.1) as
        integer counts + flags per document — ratio thresholds
        cross-multiplied so the whole filter is integer-exact (round
        5). One vectorized streaming pass, zero shuffle."""
        from doctr_ray.functions.text import gopher_quality_stats

        return gopher_quality_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_gopher_repetition(sf_dir: str):
        """The FULL Gopher repetition rule set (Rae et al. 2021 A1.2)
        — top-{2,3,4}-gram and duplicated-{5..10}-gram character
        masses with the paper's caps as integer cross-multiplied
        flags; hash-exact oracle (round 5)."""
        from doctr_ray.functions.text import gopher_repetition_stats

        return gopher_repetition_stats(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_semdedup(sf_dir: str):
        """SemDeDup (round 5): integer-exact semantic dedup — quantized
        int64 embeddings, deterministic hyperplane buckets (the
        SQL-expressible stand-in for k-means clusters), within-bucket
        integer cosine gate (400*dot^2 >= 49*|a|^2*|b|^2, i.e. cosine
        >= 0.35 on the quantized vectors), keep-first dominance. The
        DuckDB oracle replays the identical integer pipeline."""
        from doctr_ray.functions.dedup import semdedup

        return semdedup(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))

    def _emb(sf_dir: str):
        from doctr_ray.pool import default_pool

        # the parquet read yields a handful of blocks; spread them so
        # the scorer pool saturates (cheap relative to the matmuls)
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).repartition(
            max(8, default_pool())
        )

    def q_ann_topk(sf_dir: str):
        return ann_topk(_emb(sf_dir), _ann_queries(sf_dir), k=ANN_K)

    def q_ann_ivf(sf_dir: str):
        """Adaptive exact IVF: branch-and-bound cell pruning, provably
        equal to brute force (hence the hard ann_topk oracle); the
        fixed-probe approximate variant stays recall-tested in tests."""
        from doctr_ray.functions.similarity import ann_topk_ivf_exact

        return ann_topk_ivf_exact(_emb(sf_dir), _ann_queries(sf_dir), k=ANN_K)

    def q_ann_lsh(sf_dir: str):
        return ann_topk_lsh(_emb(sf_dir), _ann_queries(sf_dir), k=ANN_K)

    return {
        "ocr_roundtrip": q_ocr_roundtrip,
        "ocr_spans": q_ocr_spans,
        "ocr_spans_staged": q_ocr_spans_staged,
        "kie_predictions": q_kie,
        "kie_word_text": q_kie_word_text,
        "ocr_rotated": q_ocr_rotated,
        "ocr_skewed": q_ocr_skewed,
        "table_grids": q_table_grids,
        "table_grids_pdf": q_table_grids_pdf,
        "recognition_training_set": q_training_set,
        "ocr_page_hocr": q_page_hocr,
        "page_reconstitution": q_page_reconstitution,
        "ocr_eval": q_ocr_eval,
        "doc_token_stats": q_token_stats,
        "doc_quality": q_quality,
        "doc_lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "top_tokens": q_top_tokens,
        "inverted_index": q_inverted_index,
        "shared_vocab": q_shared_vocab,
        "source_overlap": q_source_overlap,
        "token_cooccurrence": q_token_cooccurrence,
        "winnow_fingerprints": q_winnow_fingerprints,
        "html_main_content": q_html_main_content,
        "ocr_html_media": q_ocr_html_media,
        "ocr_image_media": q_ocr_image_media,
        "ocr_video_media": q_ocr_video_media,
        "ocr_scanned_pdf": q_ocr_scanned_pdf,
        "ocr_jbig2_pdf": q_ocr_jbig2_pdf,
        "ocr_jpx_pdf": q_ocr_jpx_pdf,
        "ocr_truetype_pdf": q_ocr_truetype_pdf,
        "ocr_cff_pdf": q_ocr_cff_pdf,
        "ocr_type1_pdf": q_ocr_type1_pdf,
        "ocr_type3_pdf": q_ocr_type3_pdf,
        "ocr_cid_pdf": q_ocr_cid_pdf,
        "ocr_rotated_pdf": q_ocr_rotated_pdf,
        "multimodal_features": q_multimodal_features,
        "image_decode": q_image_decode,
        "audio_decode": q_audio_decode,
        "audio_compressed": q_audio_compressed,
        "audio_adpcm": q_audio_adpcm,
        "video_frames": q_video_frames,
        "video_mjpeg": q_video_mjpeg,
        "frame_sample": q_frame_sample,
        "ocr_markdown": q_ocr_markdown,
        "bm25_search": q_bm25_search,
        "chunk_dedup": q_chunk_dedup,
        "embedding_clusters": q_embedding_clusters,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        # oracled invariant companions of the four rows-only queries
        # (VERDICT r4 #6): the driver gate on them is value-checked
        "kmeans_cluster_cover": q_kmeans_cluster_cover,
        "bpe_merge_growth": q_bpe_merge_growth,
        "bpe_encode_bounds": q_bpe_encode_bounds,
        "ann_lsh_recall": q_ann_lsh_recall,
        "doc_repetition": q_doc_repetition,
        "pdf_native_text": q_pdf_native,
        "pii_redact": q_pii_redact,
        "normalize_text": q_normalize_text,
        "decontamination": q_decontamination,
        "doc_bpe_tokens": q_bpe_tokens,
        "doc_commonness": q_doc_commonness,
        "filter_gate_audit": q_filter_gate_audit,
        "lang_source_pivot": q_lang_source_pivot,
        "ann_topk_filtered": q_ann_topk_filtered,
        "rag_chunks": q_rag_chunks,
        "source_distinct_tokens": q_source_distinct,
        "embedding_quantize": q_embedding_quantize,
        "quantile_gated_docs": q_quantile_gated,
        "hll_registers": q_hll_registers,
        "cms_top_tokens": q_cms_top_tokens,
        "doc_sample": q_doc_sample,
        "doc_split": q_doc_split,
        "epoch_shuffle": q_epoch_shuffle,
        "dup_ngram_fraction": q_dup_ngrams,
        "dsir_weights": q_dsir_weights,
        "substring_dup": q_substring_dup,
        "seq_packing": q_seq_packing,
        "source_mix": q_source_mix,
        "corpus_filter": q_corpus_filter,
        "pretraining_corpus": q_pretraining_corpus,
        "bloom_dedup": q_bloom_dedup,
        "doc_length_quantiles": q_doc_length_quantiles,
        "top_tokens_by_source": q_top_tokens_by_source,
        "source_moments": q_source_moments,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "dedup_exact": q_dedup_exact,
        "dedup_keep_first": q_dedup_keep_first,
        "dedup_minhash": q_minhash_dups,
        "dedup_simhash": q_simhash_dups,
        "dedup_embedding": q_dedup_embedding,
        "semdedup": q_semdedup,
        "gopher_quality": q_gopher_quality,
        "gopher_repetition": q_gopher_repetition,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_lsh,
        "ann_topk_ivf": q_ann_ivf,
        "pricing_summary": pricing_summary,
        "top_customers": top_customer_revenue,
        "events_hourly": events_hourly,
        "events_sliding": events_sliding_window,
        "user_sessions": user_sessions,
        "asof_attribution": asof_click_attribution,
        "range_join": range_join_error_clicks,
        "order_priority": order_priority_check,
        "orphan_orders": orphan_orders,
        "shipping_priority": shipping_priority,
        "event_gaps": event_gaps,
        "events_rollup": events_rollup,
        "funnel_conversion": funnel_conversion,
        "small_qty_revenue": small_quantity_revenue,
        "source_ntiles": source_ntiles,
        "user_running_total": user_running_total,
        "props_stats": props_stats,
        "latest_user_event": latest_user_event,
        "events_seasonality": events_seasonality,
        "event_type_transitions": event_type_transitions,
        "nation_revenue": nation_revenue,
        "promo_revenue": promo_revenue,
        "user_moving_average": user_moving_average,
        "user_retention": user_retention,
        "source_rank": source_rank,
        "power_users": power_users,
        "rolling_active_users": rolling_active_users,
        "source_mad": source_mad,
        "value_histogram": value_histogram,
        "stratified_sample": q_stratified_sample,
        "supplier_balance": supplier_balance_by_nation,
    }


def _bm25_sql(query: str, k: int) -> str:
    """Oracle for bm25_topk: identical rational-idf BM25 expression —
    both engines evaluate the same IEEE-double formula, so score_e6 is
    bit-stable (same trick as cosine_e6 / jaccard_e6)."""
    from doctr_ray.functions.search import B, K1

    terms_sql = ", ".join(f"'{t}'" for t in sorted(set(query.split())))
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), "
        "stats AS (SELECT count(*) AS n, sum(len(toks)) * 1.0 / count(*) AS avgdl FROM d), "
        f"terms AS (SELECT unnest([{terms_sql}]) AS term), "
        "df AS (SELECT term, (SELECT count(*) FROM d WHERE list_contains(d.toks, term)) AS df FROM terms), "
        "tf AS (SELECT d.doc_id, t.term, len(list_filter(d.toks, x -> x = t.term)) AS tf, len(d.toks) AS dl "
        "FROM d CROSS JOIN terms t), "
        "sc AS (SELECT tf.doc_id, sum((s.n - df.df + 0.5) / (df.df + 0.5) * tf.tf * "
        f"({K1} + 1) / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / s.avgdl))) AS score "
        "FROM tf JOIN df USING (term) CROSS JOIN stats s WHERE tf.tf > 0 GROUP BY tf.doc_id) "
        "SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_e6, "
        "row_number() OVER (ORDER BY CAST(round(score * 1000000) AS BIGINT) DESC, CAST(doc_id AS VARCHAR)) AS rank "
        f"FROM sc ORDER BY score_e6 DESC, doc_id LIMIT {k}"
    )


def _pii_sql() -> str:
    """pii_redact oracle: the same deterministic doc_id-derived PII
    augmentation as the Ray query, then the shared RE2 rule chain."""
    from doctr_ray.functions.pii import pii_redact_sql

    aug = (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.org now' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' call +1-202-555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    return pii_redact_sql(source="documents", text_expr=aug)


def _normalize_sql() -> str:
    """normalize_text oracle: the same deterministic dirtying (chr(769)
    = combining acute, chr(776) = combining diaeresis, chr(9) = tab)
    as the Ray query, then the shared NFC + whitespace cleanup."""
    from doctr_ray.functions.text import normalize_clean_sql

    aug = (
        "CASE WHEN doc_id % 3 = 0 THEN 'Cafe' || chr(769) || '  ' ELSE '' END"
        " || text"
        " || CASE WHEN doc_id % 2 = 0 THEN chr(9) || 'Angstro' || chr(776) || 'm' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN '   ' ELSE '' END"
    )
    return normalize_clean_sql(source="documents", text_expr=aug)


def _decontam_sql() -> str:
    """decontamination oracle: same benchmark-passage augmentation as
    the Ray query, then the shared n-gram overlap definition."""
    from doctr_ray.functions.decontam import BENCH_PASSAGE, decontaminate_sql

    aug = (
        "text || CASE WHEN doc_id % 13 = 0 THEN ' "
        + BENCH_PASSAGE
        + "' ELSE '' END"
    )
    return decontaminate_sql(text_expr=aug)


def _gopher_sql() -> str:
    from doctr_ray.functions.text import gopher_quality_sql

    return gopher_quality_sql()


def _gopher_rep_sql() -> str:
    from doctr_ray.functions.text import gopher_repetition_sql

    return gopher_repetition_sql()


def oracle_sql() -> dict[str, str]:
    from doctr_ray.functions.sampling import rate_to_hex as _rate_hex
    jaccard_sql = (
        # exact all-pairs word-3-gram Jaccard >= 0.5 — also the oracle
        # for the MinHash path (banded LSH at num_perm=64/bands=16 has
        # recall 1 on this corpus; candidates are verified with the same
        # exact kernel, so precision is 1 by construction)
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "g AS (SELECT doc_id, list_distinct(list(toks[s.i] || ' ' || toks[s.i + 1] || ' ' || toks[s.i + 2])) AS sh "
        "FROM d CROSS JOIN generate_series(1, 200) s(i) WHERE s.i + 2 <= len(toks) GROUP BY doc_id), "
        "p AS (SELECT a.doc_id AS a, b.doc_id AS b, "
        "len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) + len(b.sh) AS tot "
        "FROM g a JOIN g b ON a.doc_id < b.doc_id) "
        "SELECT a, b, CAST(round(inter * 1000000.0 / (tot - inter)) AS BIGINT) AS jaccard_e6 "
        "FROM p WHERE inter * 1.0 / (tot - inter) >= 0.5"
    )
    cluster_sql = (
        # transitive closure of the near-dup pairs via recursive CTE;
        # node ids compared as VARCHAR on both sides (the Ray operator
        # propagates lexicographic-min string labels)
        f"WITH RECURSIVE pairs AS ({jaccard_sql}), "
        "edges AS (SELECT CAST(a AS VARCHAR) AS u, CAST(b AS VARCHAR) AS v FROM pairs "
        "UNION SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM pairs), "
        "reach AS (SELECT u AS node, v AS m FROM edges "
        "UNION SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v) "
        "SELECT node AS doc_id, least(node, min(m)) AS cluster_id "
        "FROM reach GROUP BY node"
    )
    ann_topk_sql = (
        f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_ANN_QUERIES})), "
        "s AS (SELECT q.query_id, e.vec_id, "
        "CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_e6 "
        "FROM embeddings e CROSS JOIN q) "
        "SELECT query_id, vec_id, cosine_e6, rank FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY cosine_e6 DESC, vec_id) AS rank FROM s) WHERE rank <= {ANN_K}"
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    marker_counts = ",\n           ".join(
        f"len(list_filter(string_split(text, ' '), x -> x IN ({', '.join(chr(39) + w + chr(39) for w in LANG_MARKERS[lang])}))) AS c_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    # argmax CASE generated from the SAME marker table as the engine —
    # first-in-lexicographic-order wins ties, exactly like lang_id's
    # strictly-greater scan over LANG_ORDER
    _langs = sorted(LANG_MARKERS)
    _all_c = ", ".join(f"c_{l}" for l in _langs)
    _whens = " ".join(
        f"WHEN {' AND '.join(f'c_{l} >= c_{r}' for r in _langs[i + 1:])} THEN '{l}'"
        for i, l in enumerate(_langs[:-1])
    )
    lang_case = (
        f"CASE WHEN greatest({_all_c}) = 0 THEN 'und' "
        + _whens
        + f" ELSE '{_langs[-1]}' END AS pred_lang"
    )
    return {
        "ocr_roundtrip": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text FROM documents"
        ),
        "doc_token_stats": (
            "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
            "length(text) AS n_chars, "
            "CAST(round((length(text) - (len(string_split(text, ' ')) - 1)) * 1000000.0 "
            "/ len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_e6 FROM documents"
        ),
        "doc_quality": (
            "WITH b AS (SELECT doc_id, "
            f"CAST(round(len(list_filter(string_split(text, ' '), x -> x IN ({stop_list}))) * 1000000.0 "
            "/ greatest(len(string_split(text, ' ')), 1)) AS BIGINT) AS stopword_ratio_e6, "
            "CAST(round(len(list_filter(string_split(text, ' '), x -> length(x) < 3)) * 1000000.0 "
            "/ greatest(len(string_split(text, ' ')), 1)) AS BIGINT) AS short_token_ratio_e6 "
            "FROM documents) "
            "SELECT doc_id, stopword_ratio_e6, short_token_ratio_e6, "
            "least(greatest(1000000 - short_token_ratio_e6, 0), 1000000) AS quality_e6 FROM b"
        ),
        "doc_lang_id": (
            "WITH c AS (SELECT doc_id,\n           "
            + marker_counts
            + "\n      FROM documents)\n"
            "SELECT doc_id, " + lang_case + " FROM c"
        ),
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "pii_redact": _pii_sql(),
        "normalize_text": _normalize_sql(),
        "decontamination": _decontam_sql(),
        "doc_bpe_tokens": __import__(
            "doctr_ray.functions.text", fromlist=["bpe_token_sql"]
        ).bpe_token_sql(),
        "doc_commonness": __import__(
            "doctr_ray.functions.text", fromlist=["doc_commonness_sql"]
        ).doc_commonness_sql(k=1000),
        "filter_gate_audit": __import__(
            "doctr_ray.functions.audit", fromlist=["filter_gate_audit_sql"]
        ).filter_gate_audit_sql(),
        "lang_source_pivot": __import__(
            "doctr_ray.functions.audit", fromlist=["lang_source_pivot_sql"]
        ).lang_source_pivot_sql(),
        "rag_chunks": __import__(
            "doctr_ray.functions.text", fromlist=["rag_chunks_sql"]
        ).rag_chunks_sql(),
        "hll_registers": __import__(
            "doctr_ray.functions.sketch", fromlist=["hll_registers_sql"]
        ).hll_registers_sql(b=12),
        "cms_top_tokens": __import__(
            "doctr_ray.functions.sketch", fromlist=["cms_top_tokens_sql"]
        ).cms_top_tokens_sql(k=20),
        "top_tokens": (
            "SELECT token, count(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
            "WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        "html_main_content": (
            "SELECT doc_id, text AS main_text FROM documents"
        ),
        "ocr_html_media": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 100)"
        ),
        "ocr_scanned_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 60)"
        ),
        "ocr_image_media": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 60)"
        ),
        "ocr_video_media": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 40)"
        ),
        "ocr_jbig2_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 24)"
        ),
        "ocr_jpx_pdf": (
            # same 120-token clip as the fixture writer
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "array_to_string(string_split(text, ' ')[1:120], ' ') AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 12)"
        ),
        "ocr_truetype_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 40)"
        ),
        "ocr_cff_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)"
        ),
        "ocr_type1_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)"
        ),
        "ocr_type3_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)"
        ),
        "ocr_cid_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)"
        ),
        "ocr_rotated_pdf": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 30)"
        ),
        "multimodal_features": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes, "
            "sha256(text) AS sha256, lower(hex(substr(text, 1, 4))) AS magic "
            "FROM documents"
        ),
        "image_decode": (
            # the same integer image-generation rule recomputed in SQL:
            # checkerboard of v1/v2 with n1 = ceil(h/2)*ceil(w/2) +
            # floor(h/2)*floor(w/2) even-parity cells
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' "
            "WHEN 2 THEN 'pnm' WHEN 3 THEN 'gif' ELSE 'tiff' END AS fmt, "
            "h AS height, w AS width, "
            "CAST(v1 * n1 + v2 * (h * w - n1) AS BIGINT) AS px_sum FROM ("
            "SELECT doc_id, v1, (v1 + 91) % 256 AS v2, h, w, "
            "((h + 1) // 2) * ((w + 1) // 2) + (h // 2) * (w // 2) AS n1 "
            "FROM (SELECT doc_id, "
            "(doc_id * 37 + length(coalesce(text, ''))) % 256 AS v1, "
            "16 + doc_id % 17 AS h, 16 + (doc_id * 7) % 23 AS w "
            "FROM documents))"
        ),
        "audio_decode": (
            # the same integer sawtooth recomputed sample-by-sample:
            # v(t) = (a*t + b) % 65536 - 32768 over a fixed series
            # 0..598 (max n-1), filtered to each doc's length
            "SELECT CAST(p.doc_id AS VARCHAR) AS doc_id, "
            "p.n AS n_frames, p.rate AS sample_rate, "
            "CAST(1 AS BIGINT) AS channels, "
            "CAST(SUM(ABS((p.a * g.t + p.b) % 65536 - 32768)) AS BIGINT) "
            "AS abs_sum FROM "
            "(SELECT doc_id, 400 + doc_id % 200 AS n, "
            "8000 + (doc_id % 5) * 1000 AS rate, "
            "doc_id * 13 + 7 AS a, "
            "doc_id * 31 + length(coalesce(text, '')) AS b "
            "FROM documents) p "
            "JOIN generate_series(0, 598) AS g(t) ON g.t < p.n "
            "GROUP BY p.doc_id, p.n, p.rate"
        ),
        "audio_compressed": (
            # the COMPRESSED decode recomputed exactly in SQL: FLAC is
            # lossless (identity on the generated samples); mu-law and
            # A-law apply the G.711 compander transfer function
            # decode(encode(v)) as an integer segment ladder (Sun
            # g711.c semantics; see sources/audiocodec).
            "WITH p AS (SELECT doc_id AS d, CAST(doc_id AS VARCHAR) AS doc_id, "
            "400 + doc_id % 200 AS n, 8000 + (doc_id % 5) * 1000 AS rate, "
            "doc_id * 13 + 7 AS a, "
            "doc_id * 31 + length(coalesce(text, '')) AS b, "
            "doc_id * 17 + 3 AS a2, doc_id * 29 + 11 AS b2, "
            "CASE doc_id % 3 WHEN 0 THEN 'flac' WHEN 1 THEN 'mulaw' "
            "ELSE 'alaw' END AS codec FROM documents), "
            "s AS (SELECT p.*, (p.a * g.t + p.b) % 65536 - 32768 AS v, "
            "(p.a2 * g.t + p.b2) % 65536 - 32768 AS v2 "
            "FROM p JOIN generate_series(0, 598) AS g(t) ON g.t < p.n), "
            "s1 AS (SELECT *, CAST(floor(v / 4.0) AS BIGINT) AS mfl, "
            "CAST(floor(v / 8.0) AS BIGINT) AS pfl FROM s), "
            "s2 AS (SELECT *, "
            "least(CASE WHEN v >= 0 THEN mfl ELSE -mfl END, 8159) + 33 AS mm, "
            "CASE WHEN v >= 0 THEN pfl ELSE -pfl - 1 END AS amag FROM s1), "
            "s3 AS (SELECT *, "
            "CASE WHEN mm >= 4096 THEN 7 WHEN mm >= 2048 THEN 6 "
            "WHEN mm >= 1024 THEN 5 WHEN mm >= 512 THEN 4 "
            "WHEN mm >= 256 THEN 3 WHEN mm >= 128 THEN 2 "
            "WHEN mm >= 64 THEN 1 ELSE 0 END AS mseg, "
            "CASE WHEN amag > 2047 THEN 7 WHEN amag > 1023 THEN 6 "
            "WHEN amag > 511 THEN 5 WHEN amag > 255 THEN 4 "
            "WHEN amag > 127 THEN 3 WHEN amag > 63 THEN 2 "
            "WHEN amag > 31 THEN 1 ELSE 0 END AS aseg FROM s2), "
            "s4 AS (SELECT *, "
            "(amag >> (CASE WHEN aseg < 2 THEN 1 ELSE aseg END)) & 15 "
            "AS aman FROM s3), "
            "dec AS (SELECT doc_id, codec, n, rate, "
            "CASE WHEN codec = 'flac' THEN ABS(v) + ABS(v2) "
            "WHEN codec = 'mulaw' THEN ABS("
            "(CASE WHEN mm >= 8192 THEN 32124 ELSE "
            "(((mm >> (mseg + 1)) & 15) * 8 + 132) * (1 << mseg) - 132 END) "
            "* (CASE WHEN v < 0 THEN -1 ELSE 1 END)) "
            "ELSE ABS((CASE WHEN aseg = 0 THEN (aman << 4) + 8 "
            "WHEN aseg = 1 THEN (aman << 4) + 264 "
            "ELSE ((aman << 4) + 264) << (aseg - 1) END) "
            "* (CASE WHEN v >= 0 THEN 1 ELSE -1 END)) END AS a_v FROM s4) "
            "SELECT doc_id, codec, n AS n_frames, rate AS sample_rate, "
            "CAST(CASE WHEN codec = 'flac' THEN 2 ELSE 1 END AS BIGINT) "
            "AS channels, CAST(SUM(a_v) AS BIGINT) AS abs_sum "
            "FROM dec GROUP BY doc_id, codec, n, rate"
        ),
        "audio_adpcm": (
            # structural contract (frame count honors the fact chunk,
            # rate, channels) + the tracking invariant: the engine sets
            # track_ok=1 only if its real ADPCM decode stays within
            # 768 LSB of the source everywhere
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(500 + doc_id % 300 AS BIGINT) AS n_frames, "
            "CAST(8000 + (doc_id % 4) * 2000 AS BIGINT) AS sample_rate, "
            "CAST(1 + doc_id % 2 AS BIGINT) AS channels, "
            "CAST(1 AS BIGINT) AS track_ok FROM documents"
        ),
        "video_frames": (
            # the decoded video recomputed exactly in SQL: stride-2
            # sampled frames of the checkerboard animation — per-frame
            # gray values v1/v2, doc-derived dims, n1 even-parity cells
            # (both containers are lossless, so decode == generation)
            "SELECT CAST(p.doc_id AS VARCHAR) AS media_id, "
            "CAST(g.t * 2 AS BIGINT) AS frame_idx, "
            "p.h AS height, p.w AS width, "
            "CAST(v1 * n1 + ((v1 + 91) % 256) * (p.h * p.w - n1) AS BIGINT) "
            "AS px_sum FROM "
            "(SELECT doc_id, 6 + doc_id % 5 AS nf, 16 + doc_id % 9 AS h, "
            "16 + (doc_id * 7) % 11 AS w, "
            "((16 + doc_id % 9 + 1) // 2) * ((16 + (doc_id * 7) % 11 + 1) // 2) "
            "+ ((16 + doc_id % 9) // 2) * ((16 + (doc_id * 7) % 11) // 2) AS n1 "
            "FROM documents) p "
            "JOIN generate_series(0, 5) AS g(t) ON g.t * 2 < p.nf "
            "CROSS JOIN LATERAL (SELECT (p.doc_id * 37 + g.t * 2 * 11) % 256 "
            "AS v1) v"
        ),
        "video_mjpeg": (
            # structural contract (stride-2 sampled frames, doc-derived
            # dims) + the fidelity invariant the engine computes from
            # its real MJPEG decode (within 8 LSB of the source)
            "SELECT CAST(p.doc_id AS VARCHAR) AS media_id, "
            "CAST(g.t * 2 AS BIGINT) AS frame_idx, "
            "p.h AS height, p.w AS width, CAST(1 AS BIGINT) AS mjpeg_ok "
            "FROM (SELECT doc_id, 6 + doc_id % 5 AS nf, "
            "16 + doc_id % 9 AS h, 16 + (doc_id * 7) % 11 AS w "
            "FROM documents) p "
            "JOIN generate_series(0, 5) AS g(t) ON g.t * 2 < p.nf"
        ),
        "frame_sample": (
            # fan-out contract: 50 source frames, stride 10 -> frame_idx
            # {0,10,20,30,40} per media, 32x32 shape metadata
            "SELECT CAST(doc_id AS VARCHAR) AS media_id, "
            "CAST((s.i - 1) * 10 AS INT) AS frame_idx, "
            "CAST(32 AS INT) AS height, CAST(32 AS INT) AS width "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200) "
            "CROSS JOIN generate_series(1, 5) s(i)"
        ),
        "ocr_eval": (
            # extraction is exact by construction -> every document must
            # match its ground truth at every tolerance level
            "SELECT count(*) AS raw_matches, count(*) AS caseless_matches, "
            "count(*) AS total FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200)"
        ),
        "ocr_rotated": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "array_to_string(string_split(text, ' ')[1:30], ' ') AS full_text "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 100)"
        ),
        "ocr_skewed": (
            # the renderer's greedy word layout recomputed in SQL:
            # skew-aware margins (media.skew_margins), word width
            # len*CHAR_PITCH - CHAR_SPACE, wrap at the column edge,
            # LINE_PITCH rows — every extracted word must land at its
            # exact pristine-frame pixel box
            "WITH RECURSIVE d AS ("
            "  SELECT doc_id, string_split(text, ' ')[1:30] AS toks,"
            "         radians((15 + doc_id % 70) / 10.0) AS th"
            "  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 100)), "
            "p AS ("
            "  SELECT doc_id, toks, len(toks) AS n,"
            "         16 + CAST(ceil(400 * (1 - cos(th)) + 300 * sin(th)) AS BIGINT) AS mx,"
            "         16 + CAST(ceil(300 * (1 - cos(th)) + 400 * sin(th)) AS BIGINT) AS my"
            "  FROM d), "
            "lay AS ("
            "  SELECT doc_id, toks, n, mx, my, 1 AS i,"
            "         mx AS x0, CAST(0 AS BIGINT) AS line_i,"
            "         len(toks[1]) * 12 - 2 AS ww"
            "  FROM p WHERE n >= 1 AND toks[1] <> ''"
            "  UNION ALL"
            "  SELECT doc_id, toks, n, mx, my, i + 1,"
            "         CASE WHEN x0 + ww + 8 + (len(toks[i + 1]) * 12 - 2) > 800 - mx"
            "              THEN mx ELSE x0 + ww + 8 END,"
            "         CASE WHEN x0 + ww + 8 + (len(toks[i + 1]) * 12 - 2) > 800 - mx"
            "              THEN line_i + 1 ELSE line_i END,"
            "         len(toks[i + 1]) * 12 - 2"
            "  FROM lay WHERE i < n) "
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, toks[i] AS word,"
            " CAST(x0 AS INT) AS x0, CAST(my + line_i * 24 AS INT) AS y0,"
            " CAST(x0 + ww AS INT) AS x1, CAST(my + line_i * 24 + 14 AS INT) AS y1 "
            "FROM lay"
        ),
        "table_grids": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, "
            "2 + doc_id % 2 AS R, 2 + doc_id % 3 AS C "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 80)) "
            "SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, "
            "CAST((s.i - 1) // d.C AS INT) AS row, "
            "CAST((s.i - 1) % d.C AS INT) AS col, d.toks[s.i] AS value "
            "FROM d CROSS JOIN generate_series(1, 20) s(i) "
            "WHERE s.i <= d.R * d.C AND s.i <= len(d.toks)"
        ),
        "table_grids_pdf": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, "
            "2 + doc_id % 2 AS R, 2 + doc_id % 3 AS C "
            "FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 40)) "
            "SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, "
            "CAST((s.i - 1) // d.C AS INT) AS row, "
            "CAST((s.i - 1) % d.C AS INT) AS col, d.toks[s.i] AS value "
            "FROM d CROSS JOIN generate_series(1, 20) s(i) "
            "WHERE s.i <= d.R * d.C AND s.i <= len(d.toks)"
        ),
        "kie_word_text": (
            # the engine renders the first 20 tokens of each of the
            # first 100 documents; KIE must read them back in order
            "WITH d AS (SELECT doc_id, string_split(text, ' ')[1:20] AS toks "
            "FROM documents ORDER BY doc_id LIMIT 100) "
            "SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, "
            "CAST(s.i - 1 AS INT) AS rank, d.toks[s.i] AS value "
            "FROM d CROSS JOIN generate_series(1, 20) s(i) WHERE s.i <= len(d.toks)"
        ),
        "dup_ngram_fraction": __import__(
            "doctr_ray.functions.dedup", fromlist=["dup_ngram_sql"]
        ).dup_ngram_sql(),
        "dsir_weights": __import__(
            "doctr_ray.functions.dsir", fromlist=["dsir_weights_sql"]
        ).dsir_weights_sql("src0"),
        "substring_dup": __import__(
            "doctr_ray.functions.dedup", fromlist=["substring_dup_sql"]
        ).substring_dup_sql(),
        "epoch_shuffle": __import__(
            "doctr_ray.functions.sampling", fromlist=["epoch_shuffle_sql"]
        ).epoch_shuffle_sql(epoch=1),
        "seq_packing": __import__(
            "doctr_ray.functions.packing", fromlist=["pack_layout_sql"]
        ).pack_layout_sql(512, 8),
        "source_mix": __import__(
            "doctr_ray.functions.packing", fromlist=["source_mix_sql"]
        ).source_mix_sql(_MIX_WEIGHTS),
        "corpus_filter": __import__(
            "doctr_ray.functions.filter_chain", fromlist=["corpus_filter_sql"]
        ).corpus_filter_sql(),
        "pretraining_corpus": __import__(
            "doctr_ray.functions.pretrain", fromlist=["pretraining_corpus_sql"]
        ).pretraining_corpus_sql(_MIX_WEIGHTS),
        "bloom_dedup": __import__(
            "doctr_ray.functions.bloom", fromlist=["bloom_dedup_sql"]
        ).bloom_dedup_sql(),
        "doc_length_quantiles": __import__(
            "doctr_ray.functions.stats", fromlist=["group_quantiles_sql"]
        ).group_quantiles_sql("n_chars", "source"),
        "top_tokens_by_source": __import__(
            "doctr_ray.functions.text", fromlist=["top_tokens_by_group_sql"]
        ).top_tokens_by_group_sql("source", 5),
        "source_moments": __import__(
            "doctr_ray.functions.stats", fromlist=["group_moments_sql"]
        ).group_moments_sql("n_chars", "source"),
        "fuzzy_name_pairs": __import__(
            "doctr_ray.functions.fuzzy", fromlist=["fuzzy_pairs_sql"]
        ).fuzzy_pairs_sql("c_name", "customer"),
        "dedup_exact": (
            "SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_dups "
            "FROM documents GROUP BY md5(text)"
        ),
        "dedup_keep_first": (
            "SELECT doc_id, fp FROM ("
            "SELECT doc_id, md5(text) AS fp, "
            "row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn "
            "FROM documents) WHERE rn = 1"
        ),
        "dedup_jaccard": jaccard_sql,
        "dedup_minhash": jaccard_sql,
        "dedup_clusters": cluster_sql,
        "pdf_native_text": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents"
        ),
        "bm25_search": _bm25_sql(BM25_QUERY, 20),
        "chunk_dedup": (
            "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), "
            "ch AS (SELECT doc_id, array_to_string(toks[s.i * 12 + 1 : s.i * 12 + 12], ' ') AS chunk "
            "FROM d CROSS JOIN generate_series(0, 200) s(i) WHERE s.i * 12 < len(toks)), "
            "cnt AS (SELECT chunk, count(*) AS n FROM ch GROUP BY chunk), "
            "per AS (SELECT ch.doc_id, count(*) AS n_chunks, sum(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS n_dup "
            "FROM ch JOIN cnt USING (chunk) GROUP BY ch.doc_id) "
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_chunks, CAST(n_dup AS BIGINT) AS n_dup_chunks, "
            "CAST(round(n_dup * 1000000.0 / n_chunks) AS BIGINT) AS dup_frac_e6 FROM per"
        ),
        "doc_repetition": (
            "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents), "
            "b AS (SELECT doc_id, toks, CASE WHEN len(toks) >= 2 THEN "
            "list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]) "
            "ELSE [] END AS bis FROM d), "
            "u AS (SELECT doc_id, unnest(bis) AS bi FROM b), "
            "c AS (SELECT doc_id, bi, count(*) AS n FROM u GROUP BY doc_id, bi), "
            "t AS (SELECT doc_id, max(n) AS top_n FROM c GROUP BY doc_id) "
            "SELECT d.doc_id, greatest(len(d.toks) - 1, 0) AS n_bigrams, "
            "COALESCE(t.top_n, 0) AS top_bigram_n, "
            "CASE WHEN len(d.toks) = 0 THEN 0 ELSE CAST(round(len(list_distinct(d.toks)) * 1000000.0 / len(d.toks)) AS BIGINT) END AS ttr_e6 "
            "FROM d LEFT JOIN t USING (doc_id)"
        ),
        "doc_sample": (
            # same md5-prefix decision recomputed in SQL: 8-hex-digit
            # prefixes compare identically as strings and integers
            "SELECT doc_id, length(text) AS n_chars FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|sample'), 1, 8) "
            f"< '{_rate_hex(0.1)}'"
        ),
        "doc_split": (
            # thresholds computed with the engine's own accumulation so
            # float rounding at the 0.9+0.05 boundary cannot diverge
            "SELECT doc_id, CASE "
            f"WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 8) < '{_rate_hex(0.9)}' THEN 'train' "
            f"WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 8) < '{_rate_hex(0.9 + 0.05)}' THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "dedup_simhash": (
            # exact SimHash in SQL: md5_number_upper == the engine's
            # md5-first-8-bytes-little-endian token hash; per-bit votes
            # over token occurrences, then all-pairs Hamming <= 8.
            # The banded engine path is exact for bands >= max_hamming+1
            # (pigeonhole), so the sets coincide.
            "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents), "
            "h AS (SELECT doc_id, md5_number_upper(tok) AS h FROM t WHERE tok <> ''), "
            "v AS (SELECT doc_id, s.i AS bit, "
            "sum(CASE WHEN (h >> s.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote "
            "FROM h CROSS JOIN generate_series(0, 63) s(i) GROUP BY doc_id, s.i), "
            "sh0 AS (SELECT doc_id, "
            "sum(CASE WHEN vote > 0 AND bit < 32 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS lo, "
            "sum(CASE WHEN vote > 0 AND bit >= 32 THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS hi "
            "FROM v GROUP BY doc_id), "
            "sh AS (SELECT d.doc_id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi "
            "FROM documents d LEFT JOIN sh0 s ON d.doc_id = s.doc_id) "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 8"
        ),
        "gopher_quality": _gopher_sql(),
        "gopher_repetition": _gopher_rep_sql(),
        "semdedup": (
            # the identical integer pipeline replayed in SQL:
            # floor(x*1024) quantization (bit-identical to numpy),
            # small-integer hyperplane sign buckets, within-bucket
            # integer cosine gate, keep-first dominance
            "WITH f AS (SELECT vec_id, g.i AS i, "
            "CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1024) AS BIGINT) AS v "
            "FROM embeddings JOIN generate_series(1, 64) g(i) ON TRUE), "
            "h AS (SELECT p.j, g.i, "
            "((p.j * 131 + (g.i - 1) * 31 + 7) % 19) - 9 AS w "
            "FROM generate_series(0, 5) p(j), generate_series(1, 64) g(i)), "
            "dots AS (SELECT f.vec_id, h.j, SUM(f.v * h.w) AS dot "
            "FROM f JOIN h ON f.i = h.i GROUP BY f.vec_id, h.j), "
            "bk AS (SELECT vec_id, CAST(SUM(CASE WHEN dot > 0 "
            "THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket "
            "FROM dots GROUP BY vec_id), "
            "n2 AS (SELECT vec_id, SUM(v * v) AS n2 FROM f GROUP BY vec_id), "
            "fb AS (SELECT f.vec_id, bk.bucket, f.i, f.v "
            "FROM f JOIN bk USING (vec_id)), "
            "pd AS (SELECT a.vec_id AS hi, b.vec_id AS lo, "
            "SUM(a.v * b.v) AS dot FROM fb a JOIN fb b "
            "ON a.bucket = b.bucket AND a.i = b.i AND b.vec_id < a.vec_id "
            "GROUP BY a.vec_id, b.vec_id), "
            "dom AS (SELECT DISTINCT pd.hi AS vec_id FROM pd "
            "JOIN n2 na ON na.vec_id = pd.hi "
            "JOIN n2 nb ON nb.vec_id = pd.lo "
            "WHERE pd.dot > 0 AND 400 * pd.dot * pd.dot >= 49 * na.n2 * nb.n2) "
            "SELECT bk.vec_id, bk.bucket, "
            "CAST(CASE WHEN dom.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS keep FROM bk LEFT JOIN dom USING (vec_id)"
        ),
        "dedup_embedding": (
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "CAST(round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_e6 "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5"
        ),
        "ann_topk": ann_topk_sql,
        "ann_topk_filtered": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            f"WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_ANN_QUERIES})), "
            "f AS (SELECT e.vec_id, e.embedding FROM embeddings e "
            "JOIN documents d ON e.vec_id = d.doc_id "
            "WHERE d.lang = 'en' AND d.n_chars >= 200), "
            "s AS (SELECT q.query_id, f.vec_id, "
            "CAST(round(list_cosine_similarity(f.embedding::DOUBLE[], q.qe::DOUBLE[]) * 1000000) AS BIGINT) AS cosine_e6 "
            "FROM f CROSS JOIN q) "
            "SELECT query_id, vec_id, cosine_e6, rank FROM ("
            "SELECT *, row_number() OVER (PARTITION BY query_id "
            f"ORDER BY cosine_e6 DESC, vec_id) AS rank FROM s) WHERE rank <= {ANN_K}"
        ),
        # IVF is probe-pruned but must still return the exact top-k on
        # this corpus (recall 1 at n_probe=4/16 cells — measured, and now
        # gated by the exact oracle)
        "ann_topk_ivf": ann_topk_sql,
        "ocr_spans": (
            _chunk_cte()
            + "SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(chunk_idx AS INT) AS ord, "
            "CASE WHEN is_media AND chunk_text <> '' THEN 'ocr_text' ELSE 'text' END AS kind, "
            "chunk_text AS text, CAST(char_off AS INT) AS \"offset\" FROM spans"
        ),
        "ocr_spans_staged": (
            _chunk_cte(64)
            + "SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(chunk_idx AS INT) AS ord, "
            "CASE WHEN is_media AND chunk_text <> '' THEN 'ocr_text' ELSE 'text' END AS kind, "
            "chunk_text AS text, CAST(char_off AS INT) AS \"offset\" FROM spans"
        ),
        "ocr_markdown": (
            _chunk_cte(100)
            + "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "COALESCE(string_agg(chunk_text, chr(10) || chr(10) ORDER BY chunk_idx) "
            "FILTER (WHERE chunk_text <> ''), '') AS markdown "
            "FROM spans GROUP BY doc_id"
        ),
        "ocr_page_hocr": (
            _chunk_cte(60)
            + "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS words "
            "FROM spans WHERE is_media AND chunk_text <> '' GROUP BY doc_id"
        ),
        "page_reconstitution": (
            _chunk_cte(60)
            + "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS words "
            "FROM spans WHERE is_media AND chunk_text <> '' GROUP BY doc_id"
        ),
        "recognition_training_set": (
            _chunk_cte(60)
            + "SELECT tok AS label, count(*) AS n FROM ("
            "SELECT unnest(string_split(chunk_text, ' ')) AS tok FROM spans "
            "WHERE is_media AND chunk_text <> '') WHERE tok <> '' GROUP BY tok"
        ),
        "kie_predictions": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ')[1:20] AS toks "
            "FROM documents ORDER BY doc_id LIMIT 100), "
            "w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'words' AS class_name, "
            "CAST(s.i - 1 AS INT) AS rank, toks[s.i] AS value "
            "FROM d CROSS JOIN generate_series(1, 20) s(i) WHERE s.i <= len(toks)), "
            "a AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'artefacts' AS class_name, "
            "CAST(s.i - 1 AS INT) AS rank, '' AS value "
            "FROM d CROSS JOIN generate_series(1, 3) s(i) WHERE s.i <= 1 + doc_id % 3) "
            "SELECT * FROM w UNION ALL SELECT * FROM a"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty, "
            "CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_c, "
            "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS sum_revenue_c4, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "top_customers": (
            "SELECT c.c_custkey, c.c_name, c.c_mktsegment, "
            "CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS revenue_c "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_custkey, c.c_name, c.c_mktsegment "
            "ORDER BY revenue_c DESC, c.c_custkey LIMIT 20"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c FROM events GROUP BY 1, 2"
        ),
        "events_sliding": (
            # 60-min windows sliding every 15 min: an event belongs to
            # the 4 slide-aligned windows covering it
            "WITH f AS (SELECT event_type, value, "
            "time_bucket(INTERVAL 15 MINUTE, ts) - (s.i - 1) * INTERVAL 15 MINUTE AS window_start, ts "
            "FROM events CROSS JOIN generate_series(1, 4) s(i)) "
            "SELECT event_type, window_start, count(*) AS n_events, "
            "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c "
            "FROM f WHERE ts >= window_start AND ts < window_start + INTERVAL 60 MINUTE "
            "GROUP BY event_type, window_start"
        ),
        "user_sessions": (
            "WITH e AS (SELECT user_id, event_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS session_idx FROM e) "
            "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "count(*) AS n_events, CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c "
            "FROM s GROUP BY user_id, session_idx"
        ),
        "asof_attribution": (
            # as-of join: latest same-user view with v.ts <= c.ts; ties
            # on ts resolved toward the higher event_id (max over the
            # (ts, event_id) pair — the engine's lexsort + running-max)
            "WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'), "
            "v AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'view'), "
            "m AS (SELECT c.event_id AS click_id, c.user_id, c.tsu AS click_ts_us, "
            "max(row(v.tsu, v.event_id)) AS best "
            "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.tsu <= c.tsu "
            "GROUP BY c.event_id, c.user_id, c.tsu) "
            "SELECT click_id, user_id, click_ts_us, "
            "COALESCE(best[2], -1) AS view_id, "
            "CASE WHEN best[2] IS NULL THEN -1 ELSE click_ts_us - best[1] END AS gap_us FROM m"
        ),
        "range_join": (
            # interval join: same-user clicks within +/- 5 min of each
            # error, inclusive bounds (engine: searchsorted left/right)
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'error'), "
            "c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click') "
            "SELECT e.event_id AS error_id, e.user_id, count(c.event_id) AS n_clicks "
            "FROM e LEFT JOIN c ON c.user_id = e.user_id "
            "AND c.tsu BETWEEN e.tsu - 300000000 AND e.tsu + 300000000 "
            "GROUP BY e.event_id, e.user_id"
        ),
        "order_priority": (
            # TPC-H Q4 shape adapted to the available columns: a
            # lineitem shipped > 90 days after the order date
            "SELECT o_orderpriority, count(*) AS order_count FROM orders o "
            "WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
            "AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 7776000000000) "
            "GROUP BY o_orderpriority"
        ),
        "orphan_orders": (
            # anti-join: orders with no lineitems, by priority
            "SELECT o_orderpriority, count(*) AS n_orphans FROM orders o "
            "WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) "
            "GROUP BY o_orderpriority"
        ),
        "shipping_priority": (
            # TPC-H Q3 shape: large-large orders x lineitem equi-join.
            # Revenue in the exact int64 e4 domain (cents x (100 -
            # discount bp)) so sums are order-independent and no float
            # round() half-even/half-away divergence can flip the cut.
            "SELECT l_orderkey, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_e4, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < DATE '1997-06-30' AND l_shipdate > DATE '1997-06-30' "
            "GROUP BY l_orderkey, o_orderdate_us, o_orderpriority "
            "ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10"
        ),
        "source_ntiles": __import__(
            "doctr_ray.functions.relational", fromlist=["source_ntiles_sql"]
        ).source_ntiles_sql(),
        "user_running_total": __import__(
            "doctr_ray.functions.relational", fromlist=["user_running_total_sql"]
        ).user_running_total_sql(),
        "props_stats": __import__(
            "doctr_ray.functions.relational", fromlist=["props_stats_sql"]
        ).props_stats_sql(),
        "latest_user_event": __import__(
            "doctr_ray.functions.relational", fromlist=["latest_user_event_sql"]
        ).latest_user_event_sql(),
        "events_seasonality": __import__(
            "doctr_ray.functions.relational", fromlist=["events_seasonality_sql"]
        ).events_seasonality_sql(),
        "event_type_transitions": __import__(
            "doctr_ray.functions.relational", fromlist=["event_type_transitions_sql"]
        ).event_type_transitions_sql(),
        "nation_revenue": __import__(
            "doctr_ray.functions.relational", fromlist=["nation_revenue_sql"]
        ).nation_revenue_sql(),
        "promo_revenue": __import__(
            "doctr_ray.functions.relational", fromlist=["promo_revenue_sql"]
        ).promo_revenue_sql(),
        "user_moving_average": __import__(
            "doctr_ray.functions.relational", fromlist=["user_moving_average_sql"]
        ).user_moving_average_sql(),
        "user_retention": __import__(
            "doctr_ray.functions.relational", fromlist=["user_retention_sql"]
        ).user_retention_sql(),
        "source_rank": __import__(
            "doctr_ray.functions.relational", fromlist=["source_rank_sql"]
        ).source_rank_sql(),
        "power_users": __import__(
            "doctr_ray.functions.relational", fromlist=["power_users_sql"]
        ).power_users_sql(),
        "rolling_active_users": __import__(
            "doctr_ray.functions.relational", fromlist=["rolling_active_users_sql"]
        ).rolling_active_users_sql(),
        "source_mad": __import__(
            "doctr_ray.functions.relational", fromlist=["source_mad_sql"]
        ).source_mad_sql(),
        "value_histogram": __import__(
            "doctr_ray.functions.relational", fromlist=["value_histogram_sql"]
        ).value_histogram_sql(),
        "inverted_index": __import__(
            "doctr_ray.functions.text", fromlist=["inverted_index_sql"]
        ).inverted_index_sql(),
        "shared_vocab": __import__(
            "doctr_ray.functions.text", fromlist=["shared_vocab_sql"]
        ).shared_vocab_sql(),
        "source_overlap": __import__(
            "doctr_ray.functions.dedup", fromlist=["source_overlap_sql"]
        ).source_overlap_sql(),
        "token_cooccurrence": __import__(
            "doctr_ray.functions.text", fromlist=["token_cooccurrence_sql"]
        ).token_cooccurrence_sql(),
        "winnow_fingerprints": __import__(
            "doctr_ray.functions.dedup", fromlist=["winnow_fingerprints_sql"]
        ).winnow_fingerprints_sql(),
        "source_distinct_tokens": __import__(
            "doctr_ray.functions.sketch", fromlist=["source_distinct_tokens_sql"]
        ).source_distinct_tokens_sql(),
        "embedding_quantize": __import__(
            "doctr_ray.functions.similarity", fromlist=["embedding_quantize_sql"]
        ).embedding_quantize_sql(),
        "quantile_gated_docs": __import__(
            "doctr_ray.functions.stats", fromlist=["quantile_gated_docs_sql"]
        ).quantile_gated_docs_sql(),
        "small_qty_revenue": (
            # TPC-H Q17 shape: per-part avg-quantity scalar subquery;
            # exact-integer threshold (5*qty*cnt < sum_qty)
            "WITH pt AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'), "
            "a AS (SELECT l_partkey, count(*) AS cnt, "
            "sum(CAST(l_quantity AS BIGINT)) AS sq FROM lineitem GROUP BY l_partkey) "
            "SELECT l.l_partkey, count(*) AS n_small, "
            "CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT) AS small_revenue_c "
            "FROM lineitem l JOIN pt ON l.l_partkey = pt.p_partkey "
            "JOIN a ON a.l_partkey = l.l_partkey "
            "WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sq "
            "GROUP BY l.l_partkey"
        ),
        "funnel_conversion": (
            # ordered-sequence funnel with lexicographic (ts, event_id)
            # anchors: first view -> first later click -> any later purchase
            "WITH v AS (SELECT user_id, ts, event_id FROM ("
            "SELECT user_id, ts, event_id, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events "
            "WHERE event_type = 'view') WHERE rn = 1), "
            "c AS (SELECT user_id, ts, event_id FROM ("
            "SELECT e.user_id, e.ts, e.event_id, row_number() OVER ("
            "PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn "
            "FROM events e JOIN v ON e.user_id = v.user_id "
            "WHERE e.event_type = 'click' AND (e.ts > v.ts OR "
            "(e.ts = v.ts AND e.event_id > v.event_id))) WHERE rn = 1), "
            "p AS (SELECT c.user_id FROM events e JOIN c ON e.user_id = c.user_id "
            "WHERE e.event_type = 'purchase' AND (e.ts > c.ts OR "
            "(e.ts = c.ts AND e.event_id > c.event_id)) GROUP BY c.user_id) "
            "SELECT 'view' AS stage, count(*) AS n_users FROM v "
            "UNION ALL SELECT 'click', count(*) FROM c "
            "UNION ALL SELECT 'purchase', count(*) FROM p"
        ),
        "event_gaps": (
            # per-user LAG window; -1 sentinel for the user's first event
            "SELECT event_id, user_id, CAST(coalesce(epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), "
            "-1) AS BIGINT) AS gap_us FROM events"
        ),
        "events_rollup": (
            # GROUPING SETS in one corpus pass; sentinels 'ALL' / -1
            "WITH e AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) "
            "AS h, value FROM events) "
            "SELECT coalesce(event_type, 'ALL') AS event_type, "
            "CAST(coalesce(h, -1) AS BIGINT) AS hour_us, "
            "count(*) AS n, CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c "
            "FROM e GROUP BY GROUPING SETS ((event_type, h), (event_type), ())"
        ),
        "stratified_sample": __import__(
            "doctr_ray.functions.sampling", fromlist=["stratified_sample_sql"]
        ).stratified_sample_sql(),
        "supplier_balance": (
            "SELECT n.n_name, CAST(round(sum(s.s_acctbal) * 100) AS BIGINT) AS total_acctbal_c, "
            "count(*) AS n_suppliers FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        # ann_topk_lsh: single-table LSH is approximate by construction
        # (bucket-boundary recall < 1) -> rows-only; its recall is
        # measured against ann_topk in tests AND gated by the oracled
        # ann_lsh_recall companion below.
        # oracled invariant companions (VERDICT r4 #6): the Ray side
        # computes the invariant from the live result; the SQL side
        # pins the expected counts (from the table where derivable,
        # literals where the invariant is structural) — a violation
        # flips a value and fails the hash compare.
        "kmeans_cluster_cover": (
            "SELECT count(*) AS n_points, count(*) AS n_in_range FROM embeddings"
        ),
        "bpe_merge_growth": (
            "SELECT CAST(1 AS BIGINT) AS has_merges, CAST(0 AS BIGINT) AS n_rank_breaks, "
            "CAST(0 AS BIGINT) AS n_underivable, CAST(0 AS BIGINT) AS n_dup_products"
        ),
        "bpe_encode_bounds": (
            "SELECT doc_id, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words, "
            "CAST(1 AS BIGINT) AS lower_ok FROM documents"
        ),
        "ann_lsh_recall": (
            f"SELECT CAST({N_ANN_QUERIES * ANN_K} AS BIGINT) AS n_expected, CAST(1 AS BIGINT) AS recall_ok"
        ),
    }
