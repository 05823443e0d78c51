"""The composed pre-training corpus pipeline: filter -> mix -> pack.

The Dolma/Pile-shaped end-to-end data-prep chain as ONE operator, every
stage reusing the standalone oracled kernel:

1. :func:`..filter_chain.corpus_filter` — language/repetition/quality
   gates + exact-dedup keep-first (text leaves the pipeline HERE; all
   later stages run on (doc_id, source, n_tokens) meta rows);
2. :func:`..packing.mix_thresholds` — exact-rational weighted source
   mixing over the FILTERED per-source counts;
3. :func:`..packing.pack_layout_from_counts` — concat-and-chunk
   sequence-packing layout of the mixed survivors.

The matching oracle (:func:`pretraining_corpus_sql`) splices the same
three stages' SQL fragments into one statement, so the chained result
is hash-gated end-to-end — composition introduces no new semantics.

Scale notes: the filter output is materialized once (meta-only rows, a
few dozen bytes each — the small side by construction) because both the
per-source count aggregate and the mixing filter consume it; without
the materialize the forked Dataset would re-run the whole filter chain
per branch (CLAUDE.md landmine). The only other exchanges are the
filter's fp-bucket shuffle and the packer's bucket shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from .filter_chain import corpus_filter, corpus_filter_ctes
from .packing import _U64, _h64, mix_thresholds, pack_layout_from_counts


def pretraining_corpus(
    docs_ds,
    weights: dict[str, int],
    seq_len: int = 512,
    buckets: int = 8,
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
    mix_salt: str = "mix",
):
    """-> (doc_id, source, n_tokens, bucket, start_offset, first_seq,
    last_seq) for every document surviving the full chain."""
    from ray.data.aggregate import Count

    surv = corpus_filter(
        docs_ds, min_tokens=min_tokens, min_ttr_e6=min_ttr_e6,
        max_short_e6=max_short_e6,
    ).materialize()  # meta-only rows consumed by two stages (see module doc)
    counts_rows = (
        surv.select_columns(["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    th = mix_thresholds({r["source"]: int(r["n"]) for r in counts_rows}, weights)

    def _mix(batch: pa.Table) -> pa.Table:
        # same md5-bridge loop shape as packing.source_mix._filter:
        # skip hashing for weightless sources, minimal per-row Python
        import hashlib

        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        md5, suffix, get = hashlib.md5, f"|{mix_salt}".encode(), th.get
        keep = [
            (t := get(s)) is not None
            and int.from_bytes(md5(str(d).encode() + suffix).digest()[:8], "little") < t
            for d, s in zip(ids, srcs)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    mixed = surv.map_batches(_mix, batch_format="pyarrow")
    return pack_layout_from_counts(mixed, seq_len=seq_len, buckets=buckets)


def pretraining_corpus_sql(
    weights: dict[str, int],
    seq_len: int = 512,
    buckets: int = 8,
    min_tokens: int = 20,
    min_ttr_e6: int = 350_000,
    max_short_e6: int = 120_000,
    mix_salt: str = "mix",
    pack_salt: str = "pack",
) -> str:
    """One DuckDB statement splicing the filter CTEs, the exact-rational
    mixing thresholds, and the packing window."""
    vals = ", ".join(f"('{s}', {int(w)})" for s, w in weights.items() if w > 0)
    return (
        "WITH "
        + corpus_filter_ctes(min_tokens, min_ttr_e6, max_short_e6)
        + ", fsurv AS (SELECT s.doc_id, s.source, s.n_tokens FROM surv s "
        "JOIN keep USING (doc_id)), "
        f"w(source, wgt) AS (VALUES {vals}), "
        "cnt AS (SELECT source, count(*) AS n FROM fsurv GROUP BY source), "
        "cw AS (SELECT source, n, wgt FROM cnt JOIN w USING (source)), "
        "t AS (SELECT s.source, "
        f"min(CAST(r.n AS HUGEINT) * s.wgt * CAST('{_U64}' AS HUGEINT) // "
        "(CAST(r.wgt AS HUGEINT) * s.n)) AS th "
        "FROM cw s CROSS JOIN cw r GROUP BY s.source), "
        "mixed AS (SELECT f.doc_id, f.source, f.n_tokens FROM fsurv f "
        "JOIN t USING (source) "
        f"WHERE md5_number_upper(CAST(f.doc_id AS VARCHAR) || '|{mix_salt}') < t.th), "
        "bkt AS (SELECT doc_id, source, n_tokens, "
        f"CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || '|{pack_salt}') % {buckets} AS BIGINT) AS bucket "
        "FROM mixed), "
        # CAST back to BIGINT: SUM(BIGINT) OVER is HUGEINT -> float64 in
        # pandas, which broke the driver's int-vs-float value hash (r2).
        "wnd AS (SELECT doc_id, source, n_tokens, bucket, "
        "CAST(COALESCE(SUM(n_tokens + 1) OVER (PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset FROM bkt) "
        "SELECT doc_id, source, n_tokens, bucket, start_offset, "
        f"start_offset // {seq_len} AS first_seq, "
        f"(start_offset + n_tokens) // {seq_len} AS last_seq FROM wnd"
    )
