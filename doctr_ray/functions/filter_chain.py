"""Composed corpus-filter chain: the C4/Gopher-style cleaning pipeline.

One operator that strings the engine's per-document signals into the
standard pre-training cleanup: language gate -> quality gate ->
repetition gate -> exact-dedup keep-first, emitting the surviving
corpus. Each signal reuses the exact kernel that backs its standalone
oracled query (functions/text.py), so the composed SQL oracle is
assembled from already-validated pieces.

Scale shape: ONE streaming pass computes every signal and applies the
row-local gates (text never leaves the stage — survivors project to
(fp-bucket, fp, doc_id, source, n_tokens) rows); ONE coarse fp-bucket
shuffle of those small rows picks the keep-first representative per
exact-duplicate group in a vectorized reducer. No full-corpus
broadcast, no per-key Python groups.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from .dedup import PAIR_BUCKETS
from .text import lang_id, quality_score, repetition_stats


def corpus_filter(
    docs_ds,
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
    buckets: int | None = None,
):
    """Surviving (doc_id, source, n_tokens) after the filter chain:

    1. language gate: marker-heuristic ``pred_lang != 'und'``;
    2. repetition gate: type-token ratio ``ttr_e6 >= min_ttr_e6``
       (Gopher's symbol/word-repetition family);
    3. quality gate: ``short_token_ratio_e6 <= max_short_e6`` (C4-style
       junk heuristic) and ``n_tokens >= min_tokens``;
    4. exact dedup: among surviving rows sharing ``md5(text)``, keep
       the smallest doc_id.
    """
    n_docs = docs_ds.count()
    from doctr_ray.pool import adaptive_buckets

    B = buckets or min(PAIR_BUCKETS, adaptive_buckets(n_docs))

    def _signals(batch: pa.Table) -> pa.Table:
        # row-aligned reuse of the standalone oracled kernels
        langs = lang_id(batch)["pred_lang"].to_numpy()
        short = quality_score(batch)["short_token_ratio_e6"].to_numpy()
        ttr = repetition_stats(batch)["ttr_e6"].to_numpy()
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        out_ids, out_srcs, out_nt, out_fp, out_fb = [], [], [], [], []
        for i, t in enumerate(texts):
            if langs[i] == "und" or ttr[i] < min_ttr_e6 or short[i] > max_short_e6:
                continue
            nt = len([w for w in (t or "").split(" ") if w])
            if nt < min_tokens:
                continue
            fp = hashlib.md5((t or "").encode("utf-8")).hexdigest()
            out_ids.append(ids[i])
            out_srcs.append(srcs[i])
            out_nt.append(nt)
            out_fp.append(fp)
            out_fb.append(int(fp[:8], 16) % B)
        return pa.Table.from_arrays(
            [
                pa.array(out_fb, pa.int32()),
                pa.array(out_fp, pa.string()),
                pa.array(out_ids, batch.schema.field("doc_id").type),
                pa.array(out_srcs, pa.string()),
                pa.array(out_nt, pa.int64()),
            ],
            names=["fb", "fp", "doc_id", "source", "n_tokens"],
        )

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of an fp live in this bucket: keeper = min doc_id
        keep = g.loc[g.groupby("fp", sort=False)["doc_id"].idxmin()]
        return keep[["doc_id", "source", "n_tokens"]]

    return (
        docs_ds.map_batches(_signals, batch_format="pyarrow")
        .groupby("fb")
        .map_groups(_keep_first, batch_format="pandas")
    )


def corpus_filter_sql(
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
) -> str:
    """DuckDB mirror of :func:`corpus_filter`, assembled from the same
    SQL fragments as the standalone doc_lang_id / doc_quality /
    doc_repetition oracles."""
    return (
        "WITH "
        + corpus_filter_ctes(min_tokens, min_ttr_e6, max_short_e6)
        + " SELECT s.doc_id, s.source, s.n_tokens FROM surv s JOIN keep USING (doc_id)"
    )


def corpus_filter_ctes(
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
) -> str:
    """The filter chain as a reusable CTE body (``surv`` + ``keep``):
    composed oracles (pretraining_corpus) splice it ahead of their own
    CTEs so the chained query stays bit-identical to the standalone."""
    return (
        "c AS (SELECT doc_id, "
        "len(list_filter(string_split(text, ' '), x -> x IN ('und', 'der', 'das', 'nicht'))) AS c_de, "
        "len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'value', 'row'))) AS c_en, "
        "len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'los', 'una'))) AS c_es, "
        "len(list_filter(string_split(text, ' '), x -> x IN ('le', 'les', 'des', 'une'))) AS c_fr, "
        "len(list_filter(string_split(text, ' '), x -> x IN ('de', 'shi', 'bu', 'wo'))) AS c_zh "
        "FROM documents), "
        "lang AS (SELECT doc_id, CASE WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'und' "
        "WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de' "
        "WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en' "
        "WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es' "
        "WHEN c_fr >= c_zh THEN 'fr' ELSE 'zh' END AS pred_lang FROM c), "
        "sig AS (SELECT d.doc_id, d.source, d.text, "
        "len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_tokens, "
        "CASE WHEN len(list_filter(string_split(d.text, ' '), x -> x <> '')) = 0 THEN 0 "
        "ELSE CAST(round(len(list_distinct(list_filter(string_split(d.text, ' '), x -> x <> ''))) * 1000000.0 "
        "/ len(list_filter(string_split(d.text, ' '), x -> x <> ''))) AS BIGINT) END AS ttr_e6, "
        "CAST(round(len(list_filter(string_split(d.text, ' '), x -> length(x) < 3)) * 1000000.0 "
        "/ greatest(len(string_split(d.text, ' ')), 1)) AS BIGINT) AS short_e6, "
        "l.pred_lang FROM documents d JOIN lang l USING (doc_id)), "
        "surv AS (SELECT * FROM sig WHERE pred_lang <> 'und' "
        f"AND ttr_e6 >= {min_ttr_e6} AND short_e6 <= {max_short_e6} "
        f"AND n_tokens >= {min_tokens}), "
        "keep AS (SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM surv GROUP BY md5(text))"
    )
