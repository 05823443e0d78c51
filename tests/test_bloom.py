"""Bloom incremental dedup: no false negatives, deterministic probes,
broadcast-flag stage semantics."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from doctr_ray.functions.bloom import (
    _fp_halves,
    bloom_positions,
    build_bloom,
    incremental_dedup_flags,
)


def _ds(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(start_id, start_id + len(texts))),
                "text": texts,
            }
        )
    )


def test_positions_deterministic_and_in_range():
    lo, hi = _fp_halves(["alpha", "beta", "alpha"])
    assert lo[0] == lo[2] and hi[0] == hi[2]  # same text, same fp
    pos = bloom_positions(lo, hi, 1 << 16, 4)
    assert pos.shape == (3, 4)
    assert (pos >= 0).all() and (pos < (1 << 16)).all()
    assert (pos[0] == pos[2]).all()


def test_no_false_negatives(ray_session):
    base_texts = [f"document number {i} body" for i in range(200)]
    bloom = build_bloom(_ds(base_texts))
    ref = ray.put(bloom)
    from doctr_ray.functions.bloom import BloomFlag

    # every base text must be flagged when replayed (Bloom guarantee)
    out = (
        _ds(base_texts, start_id=1000)
        .map_batches(BloomFlag(ref), batch_format="pyarrow")
        .take_all()
    )
    assert all(r["maybe_dup"] == 1 for r in out)


def test_unseen_mostly_unflagged(ray_session):
    base = _ds([f"seen {i}" for i in range(100)])
    incoming = _ds([f"unseen {i}" for i in range(100)], start_id=500)
    flags = {r["doc_id"]: r["maybe_dup"] for r in incremental_dedup_flags(base, incoming).take_all()}
    assert len(flags) == 100
    # 400 bits set in 65536: FP probability ~ (400/65536*4)^4 — zero here
    assert sum(flags.values()) == 0


def test_mixed_shard(ray_session):
    base = _ds(["a b c", "d e f", "g h i"])
    incoming = _ds(["d e f", "x y z"], start_id=10)
    flags = {r["doc_id"]: r["maybe_dup"] for r in incremental_dedup_flags(base, incoming).take_all()}
    assert flags[10] == 1  # exact dup of a base text
    assert flags[11] == 0


def test_partial_merge_independent_of_blocks(ray_session):
    texts = [f"block layout {i}" for i in range(300)]
    a = build_bloom(_ds(texts))
    b = build_bloom(_ds(texts).repartition(7))
    assert (a == b).all()


# ------------------- cross-engine hash-bridge property test (no Ray)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(
    text=st.text(max_size=60).filter(lambda s: "\x00" not in s),
    salt=st.sampled_from(["", "mix", "pack"]),
)
def test_h64_matches_duckdb_md5_number_upper(text, salt):
    """The engine/oracle hash bridge holds for ARBITRARY unicode text:
    md5-first-8-bytes-little-endian == DuckDB md5_number_upper over the
    same UTF-8 bytes (the foundation under the bloom/dedup/mix
    oracles)."""
    import duckdb

    from doctr_ray.functions.bloom import _fp_halves
    from doctr_ray.functions.packing import _h64

    s = text + ("|" + salt if salt else "")
    got = duckdb.execute(
        "SELECT md5_number_upper(?)", [s]
    ).fetchone()[0]
    assert _h64(s) == got
    lo, hi = _fp_halves([s])
    assert (int(lo[0]) | (int(hi[0]) << 32)) == got
