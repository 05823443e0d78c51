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


# ---------------------------- property tests (no Ray) ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=120),
    p=st.integers(min_value=1, max_value=100),
)
def test_rank_formula_matches_quantile_disc(vals, p):
    """The engine's integer ceil-rank must equal DuckDB quantile_disc
    for every list and percent — the exactness contract behind
    doc_length_quantiles."""
    import duckdb

    n = len(vals)
    rank = -(-p * n // 100)
    mine = sorted(vals)[rank - 1]
    got = duckdb.sql(
        f"SELECT quantile_disc(x, {p / 100}) FROM (SELECT unnest({vals}) AS x)"
    ).fetchone()[0]
    assert mine == got


@settings(max_examples=60, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=50),
        min_size=1,
    ),
)
def test_mix_thresholds_invariants(counts, weights):
    """source_mix contract: some weighted source is kept whole (the
    binding source, threshold == 2^64), no threshold exceeds 2^64, and
    expected kept counts realize the requested proportions."""
    from doctr_ray.functions.packing import mix_thresholds

    th = mix_thresholds(counts, weights)
    keyed = {s for s in counts if weights.get(s, 0) > 0}
    assert set(th) == keyed
    if not th:
        return
    U64 = 1 << 64
    assert all(0 < v <= U64 for v in th.values())
    assert max(th.values()) == U64  # binding source kept whole
    # expected kept mass: count_s * th_s / 2^64 ~ K * w_s / SCALE,
    # so kept ratios track weight ratios within integer-floor slack
    exp = {s: counts[s] * th[s] / U64 for s in th}
    ws = {s: weights[s] for s in th}
    ref_s = max(th, key=lambda s: exp[s])
    for s in th:
        want = exp[ref_s] * ws[s] / ws[ref_s]
        assert abs(exp[s] - want) <= 2.0  # floor slack only


def test_group_moments_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.stats import group_moments

    t = pa.table(
        {
            "source": ["a"] * 4 + ["b"] * 2,
            "n_chars": [1, 2, 3, 4, 10, 20],
        }
    )
    rows = {r["source"]: r for r in group_moments(rd.from_arrow(t), "n_chars", "source").take_all()}
    a = rows["a"]
    assert (a["n"], a["sum"]) == (4, 10)
    assert a["mean_e6"] == 2_500_000
    # var = (4*30 - 100)/16 = 1.25
    assert a["var_e6"] == 1_250_000
    b = rows["b"]
    assert b["mean_e6"] == 15_000_000 and b["var_e6"] == 25_000_000
    # block-layout independence (mergeable partials)
    rows2 = {r["source"]: r for r in group_moments(rd.from_arrow(t).repartition(5), "n_chars", "source").take_all()}
    assert rows2 == rows


def test_quantile_gated_docs_edge(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.stats import quantile_gated_docs

    # group g: values 1..4 -> p25 = value at rank ceil(0.25*4)=1 -> 1
    # group h: values 10,20,30 -> p25 = rank ceil(0.75)=1 -> 10
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(7)),
                "source": ["g"] * 4 + ["h"] * 3,
                "n_chars": [1, 2, 3, 4, 10, 20, 30],
            }
        )
    )
    got = quantile_gated_docs(ds).to_pandas().sort_values("doc_id")
    # thresholds: g -> 1 (all pass, boundary INCLUDED), h -> 10 (all pass)
    assert got["doc_id"].tolist() == list(range(7))
    # raise group g's p25: values 1..8 -> rank 2 -> threshold 2, doc 0 drops
    ds2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(8)),
                "source": ["g"] * 8,
                "n_chars": [1, 2, 3, 4, 5, 6, 7, 8],
            }
        )
    )
    got2 = quantile_gated_docs(ds2).to_pandas().sort_values("doc_id")
    assert got2["doc_id"].tolist() == list(range(1, 8))
