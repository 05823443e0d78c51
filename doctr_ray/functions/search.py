"""Distributed lexical retrieval over a documents table.

BM25-style top-k scoring as a two-phase Ray Data pipeline — the shape a
100 TB corpus search needs:

1. **stats phase**: one pass of per-batch partials (document count,
   total token count, per-query-term document frequencies). The
   partials are a handful of integers per batch — they collapse on the
   driver, never the corpus.
2. **score phase**: the tiny stats dict broadcasts into a second
   ``map_batches`` pass that scores every document against the query
   and keeps a per-batch top-k; the final merge sorts k*num_blocks
   rows.

Scoring uses the BM25 term-saturation form with a RATIONAL idf
(``(N - df + 0.5) / (df + 0.5)``, no logarithm): a monotone transform
of classic BM25's idf, chosen so the DuckDB oracle reproduces the
score bit-for-bit (both engines evaluate the same IEEE-double
expression; ``ln`` implementations may differ by ulps across libms).
Scores are emitted as int64 micro-units.
"""

from __future__ import annotations

import pyarrow as pa

K1 = 1.2
B = 0.75


def _doc_tokens(text: str) -> list[str]:
    return [t for t in (text or "").split(" ") if t]


def corpus_query_stats(docs_ds, terms: list[str]) -> dict:
    """One streaming pass -> {N, total_len, df: {term: n_docs}}."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        total = 0
        dfs = [0] * len(terms)
        for t in texts:
            toks = _doc_tokens(t)
            total += len(toks)
            toks_set = set(toks)
            for i, term in enumerate(terms):
                if term in toks_set:
                    dfs[i] += 1
        return pa.Table.from_arrays(
            [
                pa.array([n], pa.int64()),
                pa.array([total], pa.int64()),
                pa.array([dfs], pa.list_(pa.int64())),
            ],
            names=["n", "total", "dfs"],
        )

    rows = docs_ds.map_batches(partial, batch_format="pyarrow").take_all()
    N = sum(r["n"] for r in rows)
    total = sum(r["total"] for r in rows)
    df = {t: 0 for t in terms}
    for r in rows:
        for t, d in zip(terms, r["dfs"]):
            df[t] += d
    return {"N": N, "avgdl": total / N if N else 0.0, "df": df}


def bm25_topk(docs_ds, query: str, k: int = 20, k1: float = K1, b: float = B):
    """Top-k documents for a whitespace query, scored with rational-idf
    BM25. Returns (doc_id, score_e6, rank) — ties broken by doc_id."""
    terms = sorted(set(_doc_tokens(query)))
    stats = corpus_query_stats(docs_ds, terms)
    N, avgdl, df = stats["N"], stats["avgdl"], stats["df"]
    idf = {t: (N - df[t] + 0.5) / (df[t] + 0.5) for t in terms}

    def score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_score = [], []
        for did, t in zip(ids, texts):
            toks = _doc_tokens(t)
            dl = len(toks)
            s = 0.0
            for term in terms:
                tf = toks.count(term)
                if tf:
                    s += idf[term] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            if s > 0:
                out_id.append(did)
                out_score.append(int(round(s * 1_000_000)))
        tbl = pa.Table.from_arrays(
            [
                pa.array([str(x) for x in out_id], pa.string()),
                pa.array(out_score, pa.int64()),
            ],
            names=["doc_id", "score_e6"],
        )
        # per-batch partial top-k: only k rows per block reach the merge
        import pyarrow.compute as pc

        order = pc.sort_indices(
            tbl, sort_keys=[("score_e6", "descending"), ("doc_id", "ascending")]
        )
        return tbl.take(order[:k])

    scored = docs_ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score_e6", "doc_id"], descending=[True, False]).limit(k)

    def add_rank(batch: pa.Table) -> pa.Table:
        # the limit guarantees one final small block; rank is its row order
        return batch.append_column(
            "rank", pa.array(range(1, len(batch) + 1), pa.int64())
        )

    return top.repartition(1).map_batches(add_rank, batch_format="pyarrow", batch_size=None)
