"""Interleaved text+media docs corpus, derived from a documents table.

Produces the north-rule input shape (BASELINE.json ``input_hint``)::

    docs(doc_id: string,
         spans: list<struct<kind: string, text: string,
                            media_ref: string, offset: int32>>)

deterministically from any ``documents(doc_id, text, ...)`` table: each
document's token stream is cut into chunks; a deterministic per-chunk
hash decides whether a chunk stays a native ``kind='text'`` span or
becomes a ``kind='media'`` span whose ``synth://`` media_ref renders the
chunk's words (doctr_ray.media). Because media assets are
self-describing, OCR-ing them recovers the chunk text exactly — so the
full extraction pipeline has a strict SQL oracle: concatenating all
output span texts per doc equals the original ``documents.text``.

Span ``offset`` is the character offset of the chunk in the original
text. Page sizes vary deterministically per chunk (3 size classes) to
exercise size-bucketed batching and skew handling.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .media import encode_media_ref

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
)

DOCS_SCHEMA = pa.schema([pa.field("doc_id", pa.string()), pa.field("spans", SPANS_TYPE)])

# (page_w, page_h) size classes — deliberately skewed page dimensions
PAGE_SIZES = [(640, 480), (800, 600), (480, 360)]


def _h(*parts: object) -> int:
    """Stable 64-bit hash (Python's builtin hash is salted per process)."""
    m = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(m[:8], "little")


def doc_spans(doc_id: str, text: str, media_fraction: float = 0.4) -> list[dict]:
    """Deterministic chunking of one document into interleaved spans."""
    tokens = text.split(" ")
    spans: list[dict] = []
    i = 0
    chunk_idx = 0
    char_off = 0
    while i < len(tokens):
        size = 6 + _h(doc_id, chunk_idx, "size") % 12  # 6..17 tokens
        chunk = tokens[i : i + size]
        chunk_text = " ".join(chunk)
        is_media = (_h(doc_id, chunk_idx, "kind") % 1000) < media_fraction * 1000
        if is_media and chunk_text:
            pw, ph = PAGE_SIZES[_h(doc_id, chunk_idx, "page") % len(PAGE_SIZES)]
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": encode_media_ref(chunk_text, pw, ph),
                    "offset": char_off,
                }
            )
        else:
            spans.append(
                {"kind": "text", "text": chunk_text, "media_ref": "", "offset": char_off}
            )
        char_off += len(chunk_text) + 1  # the joining space
        i += size
        chunk_idx += 1
    return spans


def documents_to_docs(
    batch: pa.Table, media_fraction: float = 0.4, copies: int = 1
) -> pa.Table:
    """``map_batches`` kernel: documents(doc_id, text) -> docs(doc_id, spans).

    ``copies > 1`` derives several distinct docs per source row
    (suffixed doc_ids -> different deterministic chunkings) — used by
    the benchmark to scale the workload without new input data.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for d, t in zip(doc_ids, texts):
        for c in range(copies):
            did = str(d) if copies == 1 else f"{d}-c{c}"
            out_ids.append(did)
            out_spans.append(doc_spans(did, t or "", media_fraction))
    return pa.Table.from_arrays(
        [pa.array(out_ids, pa.string()), pa.array(out_spans, SPANS_TYPE)],
        schema=DOCS_SCHEMA,
    )


def docs_dataset(
    sf_dir: str,
    media_fraction: float = 0.4,
    limit: int | None = None,
    copies: int = 1,
):
    """Ray Dataset of interleaved docs derived from ``{sf_dir}/documents.parquet``.

    The read is pre-split (``override_num_blocks``) and every
    downstream map is per-block (``batch_size=None``), so the whole
    pipeline STREAMS: the OCR worker pool starts on the first block
    instead of waiting behind a repartition barrier (an all-to-all
    that materializes the entire work set before the first worker
    task). Block count is ~4 waves per worker — measured on the
    zero-shuffle fused path at sf0.1/32 cpus: 48 blocks 12.0s,
    96 blocks 7.9s, 144 blocks 10.3s, 192 blocks 12.9s (few blocks
    leave the pool straggler-bound; many blocks pay per-task
    scheduling overhead).
    """
    import ray.data as rd

    from .pool import default_pool
    from .tableio import resolve_table_paths

    paths = resolve_table_paths(sf_dir, "documents")
    # >= one block per shard: at production scale the shard is the
    # resume/lineage unit; on the single-file bench tables the wave
    # policy dominates
    blocks = max(48, default_pool() * 4, len(paths))
    ds = rd.read_parquet(
        paths,
        columns=["doc_id", "text"],
        override_num_blocks=blocks,
    )
    if limit is not None and limit <= 50_000:
        # a limit collapses to the first few read blocks, starving the
        # downstream actor pool (observed: ocr_markdown 18 s for 100
        # docs — ~3 blocks feeding a 28-actor pool). Two tempting fixes
        # both break the engine at low CPU counts:
        #  - a post-limit repartition()'s split finalize blocks the
        #    scheduling loop in ray.get while the already-spawned stage
        #    pools hold every slot -> whole-pipeline DEADLOCK (observed:
        #    ocr_spans_staged wedged at 16 cpus);
        #  - from_arrow_refs blocks keep the downstream actor pool
        #    ALIVE for as long as the consumed Dataset object is
        #    referenced (observed: 12 OcrDocWorker actors pinned after
        #    entry(), starving every later pipeline in the session —
        #    the driver holds entry()'s result by contract).
        # Split at the READ instead: a bounded driver-side pruned read
        # of the first `limit` rows (row-group order == ds.limit
        # order), rewritten once as a small parquet file with one row
        # group per target block, re-read pre-split like any other
        # table — no barrier op, no pinned pool, still streaming.
        chunks, got = [], 0
        for path in paths:
            pf = pq.ParquetFile(path)
            for g in range(pf.num_row_groups):
                t = pf.read_row_group(g, columns=["doc_id", "text"])
                take = min(len(t), limit - got)
                chunks.append(t.slice(0, take))
                got += take
                if got >= limit:
                    break
            if got >= limit:
                break
        tbl = pa.concat_tables(chunks)
        k = max(1, min(len(tbl), max(8, default_pool())))
        key = hashlib.md5(
            repr((sorted(paths), limit, k, "v1")).encode()
        ).hexdigest()[:16]
        tmpdir = os.path.join(tempfile.gettempdir(), "doctr_ray_limit")
        os.makedirs(tmpdir, exist_ok=True)
        slice_path = os.path.join(tmpdir, f"{key}.parquet")
        if not os.path.exists(slice_path):
            tmp = f"{slice_path}.{os.getpid()}.tmp"
            pq.write_table(
                tbl, tmp, row_group_size=(len(tbl) + k - 1) // k
            )
            os.replace(tmp, slice_path)
        ds = rd.read_parquet(
            slice_path, columns=["doc_id", "text"], override_num_blocks=k
        )
    elif limit is not None:
        ds = ds.limit(limit)  # big limit: keep the streaming read
    out = ds.map_batches(
        lambda b: documents_to_docs(b, media_fraction, copies),
        batch_format="pyarrow",
        batch_size=None,
    )
    if limit is not None:
        # size hint for downstream pool sizing: a worker pool larger
        # than the work only pays actor spin-up (aged-session fresh
        # worker spawns are eviction-paced — see pipelines/ocr.py)
        out._doctr_n_docs = limit * copies
    return out


def expected_full_text(text: str) -> str:
    """What the extraction pipeline must reconstruct for this document."""
    return " ".join(t for t in text.split(" ") if t) if text else ""


def make_inline_docs(rows: list[tuple[str, str]], media_fraction: float = 0.4) -> pa.Table:
    """Small in-memory docs table from (doc_id, text) pairs — test helper."""
    t = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([r[1] for r in rows], pa.string()),
        ],
        names=["doc_id", "text"],
    )
    return documents_to_docs(t, media_fraction)


def raw_documents_dataset(sf_dir: str, limit: int | None = None, pool: int | None = None):
    """Pre-split RAW (doc_id, text) read for the feed-fused flagship.

    The expansion to interleaved docs happens INSIDE the OCR worker
    (``OcrDocWorker(expand_media_fraction=..., expand_copies=...)``),
    so the pipeline is read -> one actor-pool map and nothing else.
    Read tasks run with ``num_cpus=0``: they are footer-sized parquet
    decodes (microseconds per block), and a zero-cost reservation lets
    the actor pool take EVERY cpu without starving the stream — the
    fixed feed reserve was 25% of an 8-cpu node but 6% of a 32-cpu one,
    the round-2 scaling-efficiency gap (BASELINE.md).
    """
    import ray.data as rd

    from .pool import default_pool
    from .tableio import resolve_table_paths

    paths = resolve_table_paths(sf_dir, "documents")
    blocks = max(48, (pool or default_pool()) * 4, len(paths))
    ds = rd.read_parquet(
        paths,
        columns=["doc_id", "text"],
        override_num_blocks=blocks,
        ray_remote_args={"num_cpus": 0},
    )
    if limit is not None:
        ds = ds.limit(limit)
    return ds
