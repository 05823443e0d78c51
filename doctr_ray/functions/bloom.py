"""Bloom-filter incremental dedup: flag new documents against an
existing corpus without shuffling either side.

The standard shape for continuous-ingest pipelines (a crawl shard
arrives; which documents has the corpus already seen?): build a Bloom
filter over the base corpus' exact-text fingerprints, broadcast it
(``ray.put`` once, read per task), and stream the incoming shard
through a membership test. Nothing shuffles — the base pass emits one
partial bitset per block (OR-merged on the driver), the flag pass is a
single map_batches filter.

Determinism end-to-end: fingerprints are ``md5(text)`` first-8-bytes
little-endian (== DuckDB's ``md5_number_upper``; the engine/oracle hash
bridge), and the k probe positions use Kirsch-Mitzenmacher double
hashing over the fingerprint's 32-bit halves —
``pos_j = (lo32 + j * hi32) % m_bits`` — all int64-exact, so the SQL
oracle reproduces the EXACT flag set including the filter's false
positives (a maybe_dup on a never-seen text is part of the contract,
not noise).

Scale notes: a 1%-FP filter for 1e9 fingerprints is ~1.2 GB — still a
broadcast (one object-store copy per node), but the driver OR-merge of
per-block partials should then become a tree reduce (or a sharded
filter keyed by ``fp % shards``); at the bench scales the partials are
8 KiB each and the flat merge is exact and instant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4


def _fp_halves(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """(lo32, hi32) int64 arrays of md5-first-8-bytes-little per text."""
    lo = np.empty(len(texts), dtype=np.int64)
    hi = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = int.from_bytes(
            hashlib.md5((t or "").encode("utf-8")).digest()[:8], "little"
        )
        lo[i] = h & 0xFFFFFFFF
        hi[i] = h >> 32
    return lo, hi


def bloom_positions(lo: np.ndarray, hi: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(N, k) probe positions, Kirsch-Mitzenmacher: (lo + j*hi) % m.
    All operands < 2^32 so products stay well inside int64 (this
    numpy's uint64 kernels hit scalar fallbacks — int64 domain only)."""
    j = np.arange(k, dtype=np.int64)[None, :]
    return (lo[:, None] + j * hi[:, None]) % m_bits


def build_bloom(docs_ds, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                text_col: str = "text") -> np.ndarray:
    """Packed uint8 bitset (m_bits/8 bytes) over md5(text) fingerprints.

    One partial bitset per block, OR-merged driver-side (partials are
    m_bits/8 bytes each regardless of corpus size).
    """
    nbytes = (m_bits + 7) // 8

    def _partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        lo, hi = _fp_halves(batch[text_col].to_pylist())
        pos = bloom_positions(lo, hi, m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.Table.from_arrays(
            [pa.array([bits.tobytes()], pa.binary())], names=["bits"]
        )

    merged = np.zeros(nbytes, dtype=np.uint8)
    for row in docs_ds.map_batches(_partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged


class BloomFlag:
    """Task-stage callable (state = one broadcast ref, per CLAUDE.md no
    actor pool needed): incoming rows -> (doc_id, maybe_dup)."""

    def __init__(self, bloom_ref, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                 text_col: str = "text") -> None:
        self.bloom_ref = bloom_ref
        self.m_bits = m_bits
        self.k = k
        self.text_col = text_col
        self._bits: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._bits is None:  # resolved once per task/actor
            self._bits = ray.get(self.bloom_ref)
        lo, hi = _fp_halves(batch[self.text_col].to_pylist())
        pos = bloom_positions(lo, hi, self.m_bits, self.k)
        probe = (self._bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        maybe = probe.all(axis=1).astype(np.int64)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(maybe, pa.int64())],
            names=["doc_id", "maybe_dup"],
        )


def incremental_dedup_flags(base_ds, incoming_ds, m_bits: int = DEFAULT_M_BITS,
                            k: int = DEFAULT_K):
    """Build the base filter, broadcast it, flag the incoming shard."""
    import ray

    bloom_ref = ray.put(build_bloom(base_ds, m_bits, k))
    return incoming_ds.map_batches(
        BloomFlag(bloom_ref, m_bits, k), batch_format="pyarrow"
    )


def bloom_dedup_sql(m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                    split_mod: int = 5) -> str:
    """DuckDB mirror of the bloom_dedup query (base = doc_id %
    split_mod != 0, incoming = the rest): the same probe positions, so
    the oracle reproduces the exact flag set — false positives
    included."""
    probe = (
        f"((md5_number_upper(text) & 4294967295) + j.j * (md5_number_upper(text) >> 32)) % {m_bits}"
    )
    return (
        f"WITH j(j) AS (SELECT unnest(generate_series(0, {k - 1}))), "
        f"basepos AS (SELECT DISTINCT {probe} AS p FROM documents CROSS JOIN j "
        f"WHERE doc_id % {split_mod} <> 0), "
        f"inc AS (SELECT doc_id, {probe} AS p FROM documents CROSS JOIN j "
        f"WHERE doc_id % {split_mod} = 0), "
        "hits AS (SELECT inc.doc_id, count(basepos.p) AS c FROM inc "
        "LEFT JOIN basepos ON inc.p = basepos.p GROUP BY inc.doc_id) "
        f"SELECT doc_id, CAST(c = {k} AS BIGINT) AS maybe_dup FROM hits"
    )
