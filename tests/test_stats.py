"""Exact distributed quantiles: DuckDB quantile_disc parity, rank
arithmetic, block-layout independence."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.stats import group_quantiles, group_quantiles_sql


def _tbl(n=1000, groups=("a", "b", "c")):
    rng = np.random.RandomState(7)
    return pa.table(
        {
            "source": [groups[i % len(groups)] for i in range(n)],
            "n_chars": rng.randint(0, 500, size=n).astype(np.int64),
        }
    )


def test_matches_duckdb_quantile_disc(ray_session):
    t = _tbl()
    mine = (
        group_quantiles(rd.from_arrow(t), "n_chars", "source")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    oracle = (
        con.sql(group_quantiles_sql("n_chars", "source"))
        .df()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert mine[oracle.columns].astype("int64", errors="ignore").equals(
        oracle.astype({c: "int64" for c in oracle.columns if c != "source"})
    ) or mine.to_dict("records") == oracle.to_dict("records")


def test_exact_rank_arithmetic(ray_session):
    # p90 over n=10 must be rank 9 (exact 0.9*10), not float-ulp rank 10
    t = pa.table(
        {"source": ["x"] * 10, "n_chars": np.arange(1, 11, dtype=np.int64)}
    )
    row = group_quantiles(rd.from_arrow(t), "n_chars", "source", percents=(90,)).take_all()[0]
    assert row["n"] == 10 and row["p90"] == 9


def test_block_layout_independent(ray_session):
    t = _tbl(600)
    a = sorted(
        map(tuple, (r.values() for r in group_quantiles(rd.from_arrow(t), "n_chars", "source").take_all()))
    )
    b = sorted(
        map(
            tuple,
            (
                r.values()
                for r in group_quantiles(
                    rd.from_arrow(t).repartition(9), "n_chars", "source"
                ).take_all()
            ),
        )
    )
    assert a == b


def test_bad_percent_rejected():
    with pytest.raises(ValueError):
        group_quantiles(None, "v", "g", percents=(0,))


def test_top_tokens_by_group(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.text import top_tokens_by_group

    t = pa.table(
        {
            "source": ["a", "a", "b"],
            "text": ["x x y z", "y x", "q q  r"],  # double space -> empty tok
        }
    )
    rows = sorted(
        (r["source"], r["rank"], r["token"], r["n"])
        for r in top_tokens_by_group(rd.from_arrow(t), "source", k=2).take_all()
    )
    assert rows == [
        ("a", 1, "x", 3),
        ("a", 2, "y", 2),
        ("b", 1, "q", 2),
        ("b", 2, "r", 1),
    ]
