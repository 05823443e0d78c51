"""Pipeline-audit shapes over the cleaning signals: the gate-combination
census (which filter combinations hit how many documents) and the
language-by-source crosstab (PIVOT).

Both reuse the exact row-level kernels that back the standalone oracled
queries (functions/text.py lang_id / quality_score / repetition_stats),
and their SQL oracles splice the same validated CTE fragments
(filter_chain.corpus_filter_ctes), so the audit numbers cannot drift
from the filters they audit. Both are ONE streaming pass: per-batch
partials collapse to a handful of counter rows (<= 16 masks / sources x
languages), merged in a single final task — no shuffle of data rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .filter_chain import corpus_filter_ctes
from .text import lang_id, quality_score, repetition_stats

LANGS = ("de", "en", "es", "fr", "zh", "und")


def filter_gate_audit(
    docs_ds,
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
):
    """Gate-combination census for the corpus_filter chain: one row per
    observed 4-bit mask (1=lang ok, 2=ttr ok, 4=short-ratio ok,
    8=length ok) with its document count — the data-cleaning debugging
    view ("what exactly is rejecting my corpus") computed in the same
    pass that would apply the gates.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        langs = lang_id(batch)["pred_lang"].to_numpy()
        short = quality_score(batch)["short_token_ratio_e6"].to_numpy()
        ttr = repetition_stats(batch)["ttr_e6"].to_numpy()
        nt = np.array(
            [len([w for w in (t or "").split(" ") if w])
             for t in batch["text"].to_pylist()],
            np.int64,
        )
        mask = (
            (langs != "und").astype(np.int64)
            + 2 * (ttr >= min_ttr_e6)
            + 4 * (short <= max_short_e6)
            + 8 * (nt >= min_tokens)
        )
        counts = np.bincount(mask, minlength=16)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"gate_mask": pa.array(nz.astype(np.int64), pa.int64()),
             "n_docs": pa.array(counts[nz].astype(np.int64), pa.int64())}
        )

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("gate_mask", sort=True)["n_docs"].sum().reset_index()
        return pa.Table.from_pandas(
            out.astype(np.int64), preserve_index=False
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def filter_gate_audit_sql(
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
) -> str:
    """DuckDB mirror spliced from the corpus_filter CTEs (the unused
    surv/keep CTEs ride along harmlessly)."""
    return (
        "WITH "
        + corpus_filter_ctes(min_tokens, min_ttr_e6, max_short_e6)
        + " SELECT CAST(CASE WHEN pred_lang <> 'und' THEN 1 ELSE 0 END"
        f" + CASE WHEN ttr_e6 >= {min_ttr_e6} THEN 2 ELSE 0 END"
        f" + CASE WHEN short_e6 <= {max_short_e6} THEN 4 ELSE 0 END"
        f" + CASE WHEN n_tokens >= {min_tokens} THEN 8 ELSE 0 END AS BIGINT)"
        " AS gate_mask, count(*) AS n_docs FROM sig GROUP BY gate_mask"
    )


def lang_source_pivot(docs_ds):
    """PIVOT crosstab: one row per source with per-language document
    counts as columns ``n_de .. n_und`` (the marker-heuristic language
    from the oracled lang_id kernel)."""

    def _partial(batch: pa.Table) -> pa.Table:
        langs = lang_id(batch)["pred_lang"].to_numpy()
        df = pd.DataFrame({"source": batch["source"].to_pylist(), "lang": langs})
        g = df.groupby(["source", "lang"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _pivot(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["source", "lang"], sort=False)["n"].sum().reset_index()
        wide = g.pivot_table(
            index="source", columns="lang", values="n", fill_value=0,
            aggfunc="sum",
        ).reset_index()
        for lang in LANGS:
            if lang not in wide.columns:
                wide[lang] = 0
        out = wide[["source", *LANGS]].copy()
        out.columns = ["source", *(f"n_{lang}" for lang in LANGS)]
        for c in out.columns[1:]:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_pivot, batch_format="pyarrow", batch_size=None)
    )


def lang_source_pivot_sql() -> str:
    """DuckDB mirror: conditional sums over the same lang CASE (portable
    PIVOT — no engine-specific PIVOT keyword)."""
    cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE pred_lang = '{lang}') AS BIGINT) AS n_{lang}"
        for lang in LANGS
    )
    return (
        "WITH "
        + corpus_filter_ctes()
        + f" SELECT source, {cols} FROM sig GROUP BY source"
    )
