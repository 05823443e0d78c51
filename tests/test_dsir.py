"""DSIR importance weights: target-affinity ordering on planted
fixtures, empty-doc omission, integer-exact DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.dsir import (
    B_BUCKETS,
    _bucket_ids,
    _grams,
    dsir_weights,
    dsir_weights_sql,
)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_grams_are_unigrams_plus_bigrams():
    assert _grams("a b c") == ["a", "b", "c", "a b", "b c"]
    assert _grams("") == [] and _grams("  ") == []
    ids = _bucket_ids(_grams("a b"))
    assert ids.shape == (3,) and ((ids >= 0) & (ids < B_BUCKETS)).all()


def test_target_affinity_orders_weights(ray_session):
    # docs sharing the target corpus' vocabulary must outrank docs
    # sharing the rest's vocabulary
    rows = (
        [(i, "wiki", "alpha beta gamma delta epsilon") for i in range(4)]
        + [(10 + i, "crawl", "spam eggs ham junk noise") for i in range(4)]
        + [(100, "crawl", "alpha beta gamma delta epsilon")]  # target-like
        + [(101, "crawl", "spam eggs alpha junk noise")]      # mixed
    )
    got = (
        dsir_weights(_docs(rows), target_source="wiki")
        .to_pandas()
        .set_index("doc_id")["weight_e6"]
    )
    assert got[100] > got[101] > got[10]
    # a pure-target doc and the identical-text target doc weigh the same
    assert got[100] == got[0]


def test_empty_docs_omitted(ray_session):
    rows = [(1, "wiki", "hello world"), (2, "crawl", ""), (3, "crawl", "x")]
    got = dsir_weights(_docs(rows), target_source="wiki").to_pandas()
    assert sorted(got["doc_id"]) == [1, 3]
    assert (got["n_grams"] > 0).all()


def test_duckdb_parity_fixture(ray_session):
    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (
            i,
            "wiki" if i % 3 == 0 else f"src{i % 2}",
            " ".join(rng.choice(vocab, size=rng.randint(0, 30))),
        )
        for i in range(60)
    ]
    got = (
        dsir_weights(_docs(rows), target_source="wiki")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }
        ),
    )
    want = (
        con.sql(dsir_weights_sql("wiki")).df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
