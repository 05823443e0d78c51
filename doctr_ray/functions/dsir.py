"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every document by how much its hashed n-gram
feature distribution looks like a TARGET corpus versus the rest, then
keep the highest-weight documents. The classic formulation multiplies
per-feature probability ratios (a log-sum); logarithms are not
bit-stable across engines (``ln`` differs by ulps between libms), so —
like the rational-idf BM25 in functions/search.py — the weight here is
the INTEGER RATIONAL form: per-bucket score

    s_e6[b] = (1e6 * (ct[b]+1) * (Nr+B)) // ((cr[b]+1) * (Nt+B))

(add-one smoothed target/rest probability ratio in e6 fixed point,
floor division) and a document's weight is the integer MEAN of its
grams' bucket scores. Monotone per bucket in the same direction as the
log-ratio, additive over grams, and exactly reproducible in DuckDB
(HUGEINT arithmetic) — the whole operator is hash-oracled end to end.

Features: unigrams + bigrams of the whitespace tokens, hashed into
B = 4096 buckets by the LAST THREE HEX CHARS of md5(gram) — a bucket
key both engines can compute without hex-to-int conversion (the engine
parses the 3 chars; SQL groups by the substring directly).

Scale shape: pass 1 streams the corpus once, emitting per-batch
(bucket, target?, count) partials that collapse to <= 2*B rows — the
score table is a broadcast, never a shuffle; pass 2 streams again and
scores each document against the broadcast table. Document text never
shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

B_BUCKETS = 4096  # 16^3: bucket key = last 3 hex chars of md5(gram)
SCALE_E6 = 1_000_000


def _grams(text: str) -> list[str]:
    toks = [t for t in (text or "").split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_ids(grams: list[str]) -> np.ndarray:
    return np.array(
        [int(hashlib.md5(g.encode("utf-8")).hexdigest()[29:32], 16) for g in grams],
        dtype=np.int64,
    )


def dsir_weights(docs_ds, target_source: str):
    """documents(doc_id, source, text) -> (doc_id, n_grams, weight_e6).

    ``weight_e6`` is the integer-mean bucket ratio score described in
    the module docstring; documents with no tokens are omitted (no
    grams — exactly the rows the SQL oracle's join drops).
    """
    import ray

    def _partial_hist(batch: pa.Table) -> pa.Table:
        ct = np.zeros(B_BUCKETS, np.int64)
        cr = np.zeros(B_BUCKETS, np.int64)
        for src, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            ids = _bucket_ids(_grams(text))
            if not len(ids):
                continue
            binc = np.bincount(ids, minlength=B_BUCKETS)
            if src == target_source:
                ct += binc
            else:
                cr += binc
        nz = np.flatnonzero(ct | cr)
        return pa.Table.from_arrays(
            [
                pa.array(nz, pa.int64()),
                pa.array(ct[nz], pa.int64()),
                pa.array(cr[nz], pa.int64()),
            ],
            names=["b", "ct", "cr"],
        )

    def _combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("b", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        docs_ds.map_batches(_partial_hist, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )  # <= B rows by construction: a bounded driver materialization
    nt = int(hist["ct"].sum())
    nr = int(hist["cr"].sum())
    scores = np.zeros(B_BUCKETS, np.int64)
    for b, ct_b, cr_b in zip(hist["b"], hist["ct"], hist["cr"]):
        # python ints: 1e6 * (ct+1) * (Nr+B) exceeds int64 at scale
        scores[int(b)] = (SCALE_E6 * (int(ct_b) + 1) * (nr + B_BUCKETS)) // (
            (int(cr_b) + 1) * (nt + B_BUCKETS)
        )
    sref = ray.put(scores)

    def _weights(batch: pa.Table) -> pa.Table:
        s = ray.get(sref)
        out = {"doc_id": [], "n_grams": [], "weight_e6": []}
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ids = _bucket_ids(_grams(text))
            if not len(ids):
                continue  # no grams: absent from the oracle's join too
            out["doc_id"].append(did)
            out["n_grams"].append(len(ids))
            out["weight_e6"].append(int(s[ids].sum()) // len(ids))
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"]),
                pa.array(out["n_grams"], pa.int64()),
                pa.array(out["weight_e6"], pa.int64()),
            ],
            names=["doc_id", "n_grams", "weight_e6"],
        )

    return docs_ds.map_batches(_weights, batch_format="pyarrow")


def dsir_weights_sql(target_source: str) -> str:
    """DuckDB mirror: same grams, same 3-hex-char buckets, same
    add-one-smoothed integer rational scores (HUGEINT sums cast back)."""
    return (
        "WITH toks AS (SELECT doc_id, source, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents), "
        "grams AS (SELECT doc_id, source, unnest(list_concat(t, "
        "[array_to_string(t[i:i+1], ' ') "
        "for i in range(1, greatest(len(t) - 1, 0) + 1)])) AS g FROM toks), "
        "bg AS (SELECT doc_id, source, substr(md5(g), 30, 3) AS b FROM grams), "
        "hist AS (SELECT b, "
        f"CAST(count(*) FILTER (WHERE source = '{target_source}') AS BIGINT) AS ct, "
        f"CAST(count(*) FILTER (WHERE source <> '{target_source}') AS BIGINT) AS cr "
        "FROM bg GROUP BY b), "
        "tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, "
        "CAST(sum(cr) AS BIGINT) AS nr FROM hist), "
        "score AS (SELECT b, "
        f"(1000000 * (ct + 1) * (nr + {B_BUCKETS})) "
        f"// ((cr + 1) * (nt + {B_BUCKETS})) AS s_e6 FROM hist, tot), "
        "per AS (SELECT doc_id, count(*) AS n_grams, sum(s_e6) AS tot_s "
        "FROM bg JOIN score USING (b) GROUP BY doc_id) "
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, "
        "CAST(tot_s // n_grams AS BIGINT) AS weight_e6 FROM per"
    )
