"""Deterministic hash-based sampling / splitting: reproducibility,
rate accuracy, and parallelism-independence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.sampling import (
    deterministic_sample,
    hash_split,
    rate_to_hex,
    split_counts,
)


def _docs(n=1000):
    return rd.from_arrow(
        pa.table({"doc_id": [f"d{i:05d}" for i in range(n)], "text": ["x"] * n})
    )


def test_rate_to_hex_bounds():
    assert rate_to_hex(0.0) == "00000000"
    assert rate_to_hex(1.0) == "ffffffff"
    with pytest.raises(ValueError):
        rate_to_hex(1.5)


def test_sample_deterministic_and_accurate(ray_session):
    a = sorted(r["doc_id"] for r in deterministic_sample(_docs(), 0.2).take_all())
    b = sorted(r["doc_id"] for r in deterministic_sample(_docs(), 0.2).take_all())
    assert a == b  # same membership on re-run
    assert 0.15 < len(a) / 1000 < 0.25  # binomial ~N(200, 12.6)
    # membership is independent of block layout
    c = sorted(
        r["doc_id"]
        for r in deterministic_sample(_docs().repartition(7), 0.2).take_all()
    )
    assert a == c
    # nested rates: a 10% sample is a subset of a 20% sample (same salt)
    d = set(r["doc_id"] for r in deterministic_sample(_docs(), 0.1).take_all())
    assert d <= set(a)


def test_hash_split_partitions_everything(ray_session):
    rows = hash_split(_docs(400)).take_all()
    assert len(rows) == 400
    by = {}
    for r in rows:
        by.setdefault(r["split"], []).append(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert len(by["train"]) > 300
    # disjoint + exhaustive by construction (every row got one label)
    total = sum(len(v) for v in by.values())
    assert total == 400


def test_split_counts_summary(ray_session):
    rows = split_counts(_docs(500)).take_all()
    got = {r["split"]: r["n_docs"] for r in rows}
    assert sum(got.values()) == 500


def test_bad_weights_raise(ray_session):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_docs(10), weights={"a": 0.5, "b": 0.2}).take_all()


def test_stratified_sample_exact_n_per_group(ray_session):
    from doctr_ray.functions.sampling import stratified_sample

    n = 900
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [f"d{i:05d}" for i in range(n)],
                "source": [["web", "books", "code"][i % 3] for i in range(n)],
            }
        )
    )
    rows = stratified_sample(ds, n_per_group=5, rows_hint=n).take_all()
    by = {}
    for r in rows:
        by.setdefault(r["source"], []).append((r["rk"], r["doc_id"]))
    assert set(by) == {"web", "books", "code"}
    assert all(sorted(rk for rk, _ in v) == [1, 2, 3, 4, 5] for v in by.values())
    # membership independent of block layout
    rows2 = stratified_sample(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": [f"d{i:05d}" for i in range(n)],
                    "source": [["web", "books", "code"][i % 3] for i in range(n)],
                }
            )
        ).repartition(7),
        n_per_group=5,
        rows_hint=n,
    ).take_all()
    key = lambda rs: sorted((r["source"], r["rk"], r["doc_id"]) for r in rs)
    assert key(rows) == key(rows2)
    # a group smaller than n yields the whole group
    small = rd.from_arrow(
        pa.table({"doc_id": ["a", "b"], "source": ["tiny", "tiny"]})
    )
    assert len(stratified_sample(small, n_per_group=5, rows_hint=2).take_all()) == 2


def test_epoch_shuffle_deterministic_and_epoch_independent(ray_session):
    from doctr_ray.functions.sampling import epoch_shuffle_head

    a = [(r["doc_id"], r["rank"]) for r in epoch_shuffle_head(_docs(300), epoch=1, k=20).take_all()]
    b = [(r["doc_id"], r["rank"]) for r in epoch_shuffle_head(_docs(300), epoch=1, k=20).take_all()]
    assert a == b and len(a) == 20
    assert [r[1] for r in a] == list(range(1, 21))
    # a different epoch yields a different permutation
    c = [r["doc_id"] for r in epoch_shuffle_head(_docs(300), epoch=2, k=20).take_all()]
    assert c != [r[0] for r in a]
    # block layout does not change the permutation
    d = [(r["doc_id"], r["rank"]) for r in epoch_shuffle_head(_docs(300).repartition(7), epoch=1, k=20).take_all()]
    assert d == a
