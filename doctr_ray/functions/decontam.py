"""Benchmark decontamination: flag training documents that share long
word n-grams with a held-out evaluation set.

The standard published recipe (GPT-3 appendix C / Llama / Dolma): build
the set of all N-grams (N≈8..13 words) occurring in the eval
benchmarks, then scan the training corpus and mark any document
containing one of them. The reference has no data-plane analog; this is
a first-class training-data operator.

Scale shape (the part that matters at 100 TB):

- the EVAL side is small by nature — benchmark suites are megabytes —
  so its distinct n-grams are collected once and **broadcast** via
  ``ray.put`` (the canonical small-side pattern; a shuffle join against
  a few-MB set would be absurd). The collect is bounded by the eval
  set's size, never by the corpus.
- the TRAIN side streams: one ``map_batches`` pass builds each doc's
  n-grams and counts membership against the broadcast frozenset. No
  shuffle anywhere; output is one row per (sufficiently long) doc.
- at real scale the broadcast set holds 8-byte hashes rather than gram
  strings (~16 bytes/gram for a 1M-gram suite); here the grams
  themselves are kept so the DuckDB oracle can reproduce membership
  verbatim with a plain join — semantics are identical either way.

In this harness the "benchmark" is a deterministic slice of the corpus
itself (``doc_id % eval_mod == 0``), which exercises the interesting
case: near-duplicates of eval docs in the train split light up with
partial gram overlap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# Harness stand-in for a benchmark passage (12 tokens -> five 8-grams);
# the driver query appends it to a deterministic doc_id slice on both
# sides so contamination hits are actually exercised.
BENCH_PASSAGE = (
    "benchmark passage tokens that mark a contaminated training "
    "document for the decontamination scan"
)


def _doc_grams(text: str, n: int) -> list[str]:
    toks = [w for w in (text or "").split(" ") if w]
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def collect_eval_grams(eval_ds, n: int = 8, text_col: str = "text") -> frozenset[str]:
    """Distinct n-grams of the (small) eval set. Per-batch local dedup
    runs distributed; only distinct grams reach the driver."""

    def _grams(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch[text_col].to_pylist():
            out.update(_doc_grams(t, n))
        return pa.Table.from_pydict({"g": sorted(out)})

    grams = eval_ds.map_batches(_grams, batch_format="pyarrow")
    # bounded by eval-suite size (MBs), not corpus size
    return frozenset(
        g for b in grams.iter_batches(batch_format="pyarrow") for g in b["g"].to_pylist()
    )


def decontaminate(
    docs_ds,
    n: int = 8,
    eval_mod: int = 97,
    text_col: str = "text",
    eval_ds=None,
):
    """Dataset(doc_id:int, text) -> Dataset(doc_id, n_grams,
    n_contaminated, contaminated) over the TRAIN split
    (``doc_id % eval_mod != 0``); docs with fewer than ``n`` tokens are
    dropped (they carry no n-gram evidence either way — mirrored by the
    oracle).

    ``n_contaminated`` counts gram *positions* whose gram occurs in the
    eval set (so a doc that repeats a contaminated gram k times scores
    k), matching the SQL oracle's per-occurrence sum.

    Pass ``eval_ds`` explicitly in production (the benchmark suite is
    its own small table; no reason to scan the corpus for it). Without
    it, the harness derives the eval slice from ``docs_ds`` by
    ``doc_id % eval_mod`` — note that costs one extra corpus scan, which
    is fine at test scale and exactly what you avoid with ``eval_ds``.
    """

    def _is_eval(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % eval_mod == 0))

    def _is_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % eval_mod != 0))

    if eval_ds is None:
        eval_ds = docs_ds.map_batches(_is_eval, batch_format="pyarrow")
    eval_grams = collect_eval_grams(eval_ds, n=n, text_col=text_col)
    gram_ref = ray.put(eval_grams)

    def _scan(batch: pa.Table) -> pa.Table:
        grams_set = ray.get(gram_ref)
        ids, n_g, n_c = [], [], []
        for d, t in zip(
            batch["doc_id"].to_pylist(), batch[text_col].to_pylist()
        ):
            grams = _doc_grams(t, n)
            if not grams:
                continue
            ids.append(d)
            n_g.append(len(grams))
            n_c.append(sum(g in grams_set for g in grams))
        n_c_arr = np.asarray(n_c, dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(n_g, pa.int64()),
                pa.array(n_c_arr, pa.int64()),
                pa.array(n_c_arr > 0),
            ],
            names=["doc_id", "n_grams", "n_contaminated", "contaminated"],
        )

    return docs_ds.map_batches(_is_train, batch_format="pyarrow").map_batches(
        _scan, batch_format="pyarrow"
    )


def decontaminate_sql(
    n: int = 8, eval_mod: int = 97, text_expr: str = "text"
) -> str:
    """DuckDB mirror: explode word n-grams per doc, eval grams =
    distinct grams of the ``doc_id % eval_mod = 0`` slice, per-train-doc
    occurrence counts via join. ``text_expr`` lets the harness apply the
    same deterministic augmentation on both sides."""
    m = n - 1
    return (
        "WITH toks AS (SELECT doc_id, "
        f"list_filter(string_split({text_expr}, ' '), x -> x <> '') AS t FROM documents), "
        "grams AS (SELECT doc_id, "
        f"unnest([array_to_string(t[i:i+{m}], ' ') "
        f"for i in range(1, greatest(len(t)-{m},0)+1)]) AS g FROM toks), "
        f"ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {eval_mod} = 0) "
        "SELECT doc_id, count(*) AS n_grams, "
        "CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated, "
        "CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) > 0 AS contaminated "
        f"FROM grams LEFT JOIN ev ON grams.g = ev.g WHERE doc_id % {eval_mod} <> 0 "
        "GROUP BY doc_id"
    )
