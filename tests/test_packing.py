"""Sequence packing layout + source mixing: determinism, layout
invariants, mixture proportions, and parallelism-independence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.packing import (
    _h64,
    mix_thresholds,
    pack_buckets_for,
    pack_layout,
    source_mix,
)


def _docs(n=300):
    # variable-length texts incl. empty and double-space edge cases
    texts = []
    for i in range(n):
        if i % 17 == 0:
            texts.append("")
        elif i % 11 == 0:
            texts.append("a  b")  # double space -> one empty split slot
        else:
            texts.append(" ".join(f"w{j}" for j in range((i * 7) % 40 + 1)))
    return rd.from_arrow(
        pa.table({"doc_id": [f"d{i:05d}" for i in range(n)], "text": texts})
    )


def test_pack_buckets_adaptive():
    assert pack_buckets_for(10) == 1
    assert pack_buckets_for(49_999) == 1
    assert pack_buckets_for(50_000) == 2
    assert pack_buckets_for(500_000) == 11


def test_pack_layout_invariants(ray_session):
    rows = pack_layout(_docs(), seq_len=64, buckets=4).take_all()
    assert len(rows) == 300
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) <= set(range(4))
    for b, docs in by_bucket.items():
        docs.sort(key=lambda r: r["doc_id"])
        # streams are gapless: each doc starts where the previous ended
        off = 0
        for r in docs:
            assert r["start_offset"] == off
            slots = r["n_tokens"] + 1  # +1 EOD separator
            assert r["first_seq"] == off // 64
            assert r["last_seq"] == (off + slots - 1) // 64
            assert r["first_seq"] <= r["last_seq"]
            off += slots


def test_pack_layout_counts_nonempty_tokens(ray_session):
    rows = {r["doc_id"]: r for r in pack_layout(_docs(), seq_len=64, buckets=2).take_all()}
    assert rows["d00000"]["n_tokens"] == 0  # empty text
    assert rows["d00011"]["n_tokens"] == 2  # "a  b" -> empty middle slot dropped
    assert rows["d00001"]["n_tokens"] == 8  # (1*7)%40+1 words


def test_pack_layout_block_layout_independent(ray_session):
    a = sorted(map(tuple, (r.values() for r in pack_layout(_docs(), 64, 4).take_all())))
    b = sorted(
        map(
            tuple,
            (r.values() for r in pack_layout(_docs().repartition(7), 64, 4).take_all()),
        )
    )
    assert a == b


def test_mix_thresholds_binding_source_kept_whole():
    counts = {"a": 100, "b": 100, "c": 50}
    th = mix_thresholds(counts, {"a": 1, "b": 1, "c": 1})
    # c binds (smallest count per unit weight): kept whole
    assert th["c"] == 1 << 64
    assert th["a"] == th["b"] == (1 << 63)  # a, b thinned to 50%
    # zero-weight / absent sources are dropped entirely
    assert "d" not in mix_thresholds(counts, {"a": 1})
    assert mix_thresholds({}, {"a": 1}) == {}


def test_source_mix_proportions(ray_session):
    n = 1200
    srcs = ["web", "books", "code"]
    tbl = pa.table(
        {
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "source": [srcs[i % 3] for i in range(n)],
        }
    )
    # equal input counts (400 each), target 2:1:1 -> books binds at 400,
    # web keeps ~all 400 of a 2-share = 400 is feasible only if
    # K = min(400e6/2, 400e6/1) = 2e8 -> web target 400, books/code 200
    rows = source_mix(rd.from_arrow(tbl), {"web": 2, "books": 1, "code": 1}).take_all()
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    assert got["web"] == 400  # binding source: kept whole
    # thinned sources land near the target with binomial noise
    assert 170 < got["books"] < 230
    assert 170 < got["code"] < 230
    # deterministic on re-run
    rows2 = source_mix(rd.from_arrow(tbl), {"web": 2, "books": 1, "code": 1}).take_all()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in rows2)


def test_source_mix_membership_matches_thresholds(ray_session):
    tbl = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(200)],
            "source": ["x" if i < 150 else "y" for i in range(200)],
        }
    )
    th = mix_thresholds({"x": 150, "y": 50}, {"x": 1, "y": 1})
    kept = {r["doc_id"] for r in source_mix(rd.from_arrow(tbl), {"x": 1, "y": 1}).take_all()}
    for i in range(200):
        d = f"d{i:03d}"
        s = "x" if i < 150 else "y"
        assert (d in kept) == (_h64(f"{d}|mix") < th[s])


def test_pretraining_corpus_composition(ray_session):
    """filter -> mix -> pack composition: survivors are a subset of the
    filter output, the binding source is kept whole, and the pack
    layout is gapless per bucket."""
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.filter_chain import corpus_filter
    from doctr_ray.functions.pretrain import pretraining_corpus

    n = 400
    texts = [
        "the " + " ".join(f"w{i}x{j}" for j in range(25)) for i in range(n)
    ]
    tbl = pa.table(
        {
            "doc_id": list(range(n)),
            "text": texts,
            "source": ["a" if i % 4 else "b" for i in range(n)],
        }
    )
    weights = {"a": 1, "b": 1}
    out = pretraining_corpus(rd.from_arrow(tbl), weights, seq_len=64, buckets=4).take_all()
    surv = {r["doc_id"] for r in corpus_filter(rd.from_arrow(tbl)).take_all()}
    kept = {r["doc_id"] for r in out}
    assert kept <= surv
    # b is the scarce source (100 docs vs 300): kept whole by mixing
    n_b = sum(1 for r in out if r["source"] == "b")
    assert n_b == sum(1 for i in range(n) if i % 4 == 0)
    # per-bucket gapless layout
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_offset"] == off
            off += r["n_tokens"] + 1
