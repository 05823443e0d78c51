"""Round-3 operator semantics on hand-built fixtures: frame windows,
sequence bigrams, histogram/seasonality binning, the Q5 star join, and
the vocabulary/index/overlap text shapes."""

import duckdb
import numpy as np
import ray
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doctr_ray.functions.relational import (
    event_type_transitions,
    events_seasonality,
    nation_revenue,
    user_moving_average,
    value_histogram,
)

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [pd.Timestamp(r[3]) for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_moving_average_frame_and_reset(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            # user 1: five events; window=4 means full frames from row 4
            (1, 1, "a", "2024-01-01 00:00:00", 1.0),
            (2, 1, "a", "2024-01-01 00:01:00", 2.0),
            (3, 1, "a", "2024-01-01 00:02:00", 3.0),
            (4, 1, "a", "2024-01-01 00:03:00", 4.0),
            (5, 1, "a", "2024-01-01 00:04:00", 5.0),
            # ts tie within user 1 (event_id breaks it) — 6 before 7
            (6, 2, "a", "2024-01-01 00:00:00", 10.0),
            (7, 2, "a", "2024-01-01 00:00:00", 20.0),
        ],
    )
    got = (
        user_moving_average(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["w_sum_c"].tolist() == [100, 300, 600, 1000, 1400, 1000, 3000]
    assert got["w_n"].tolist() == [1, 2, 3, 4, 4, 1, 2]


def test_event_transitions_semantics(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1, "view", "2024-01-01 00:00:00", 0.0),
            (2, 1, "click", "2024-01-01 00:01:00", 0.0),
            (3, 1, "click", "2024-01-01 00:02:00", 0.0),
            # user 2's first event starts a new chain (no cross-user pair)
            (4, 2, "view", "2024-01-01 00:00:00", 0.0),
            (5, 2, "purchase", "2024-01-01 00:01:00", 0.0),
        ],
    )
    got = event_type_transitions(sf).to_pandas()
    rows = {
        (r.prev_type, r.event_type): r.n for r in got.itertuples()
    }
    assert rows == {
        ("view", "click"): 1,
        ("click", "click"): 1,
        ("view", "purchase"): 1,
    }


def test_value_histogram_bin_edges(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1, "a", "2024-01-01", 0.01),    # bin 0
            (2, 1, "a", "2024-01-01", 24.99),   # bin 0 (2499 // 2500)
            (3, 1, "a", "2024-01-01", 25.00),   # bin 1 exactly on the edge
            (4, 1, "a", "2024-01-01", 50.00),   # bin 2
        ],
    )
    got = value_histogram(sf).to_pandas().sort_values("bin")
    assert got["bin"].tolist() == [0, 1, 2]
    assert got["n"].tolist() == [2, 1, 1]
    assert got["sum_value_c"].tolist() == [2500, 2500, 5000]


def test_seasonality_epoch_dow(ray_session, tmp_path):
    # 1970-01-01 was a Thursday -> DuckDB dayofweek=4
    sf = _write_events(
        tmp_path,
        [
            (1, 1, "a", "1970-01-01 13:00:00", 1.0),
            (2, 1, "a", "1970-01-04 02:30:00", 2.0),  # Sunday -> dow 0
            (3, 1, "a", "1970-01-04 02:59:59", 3.0),
        ],
    )
    got = events_seasonality(sf).to_pandas()
    rows = {(r.dow, r.hour): (r.n, r.sum_value_c) for r in got.itertuples()}
    assert rows == {(4, 13): (1, 100), (0, 2): (2, 500)}


def _write_star(tmp_path):
    """Two regions, three nations, customers/suppliers split across
    them; one order with lineitems whose suppliers match / mismatch the
    customer's nation."""
    pq.write_table(
        pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                  "r_name": ["ASIA", "EUROPE"]}),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([0, 1, 2], pa.int32()),
            "n_name": ["N0", "N1", "N2"],
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        }),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([10, 11, 12], pa.int64()),
            "c_nationkey": pa.array([0, 1, 2], pa.int32()),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([100, 101, 102], pa.int64()),
            "s_nationkey": pa.array([0, 1, 2], pa.int32()),
        }),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([10, 11, 12], pa.int64()),
        }),
        str(tmp_path / "orders.parquet"),
    )
    # order 1 (cust nation 0): supplier nation 0 counts, nation 1 doesn't
    # order 2 (cust nation 1): supplier nation 1 counts
    # order 3 (cust nation 2, EUROPE): excluded by region filter
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_suppkey": pa.array([100, 101, 101, 102], pa.int64()),
            "l_extendedprice": pa.array([10.00, 99.0, 20.00, 5.0], pa.float64()),
            "l_discount": pa.array([0.10, 0.0, 0.25, 0.0], pa.float64()),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_nation_revenue_semantics(ray_session, tmp_path, dim_max):
    sf = _write_star(tmp_path)
    got = (
        nation_revenue(sf, dim_broadcast_max_rows=dim_max)
        .to_pandas()
        .sort_values("n_name")
    )
    # N0: 1000c * (100-10) = 90_000; N1: 2000c * 75 = 150_000
    assert got["n_name"].tolist() == ["N0", "N1"]
    assert got["revenue_e4"].tolist() == [90_000, 150_000]


def test_nation_revenue_copartition_no_driver_dim_read(
    ray_session, tmp_path, monkeypatch
):
    # Above the threshold customer/supplier must never hit driver pandas;
    # nation/region (constant-size) still may.
    import doctr_ray.functions.relational as rel

    sf = _write_star(tmp_path)
    real_read = rel.read_dim_pandas

    def _guarded(sf_dir, table, *a, **k):
        assert table not in ("customer", "supplier"), table
        return real_read(sf_dir, table, *a, **k)

    monkeypatch.setattr(rel, "read_dim_pandas", _guarded)
    got = (
        nation_revenue(sf, dim_broadcast_max_rows=0)
        .to_pandas()
        .sort_values("n_name")
    )
    assert got["revenue_e4"].tolist() == [90_000, 150_000]


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_inverted_index_postings(ray_session, tmp_path):
    import ray

    from doctr_ray.functions.text import inverted_index

    sf = _write_docs(
        tmp_path,
        [
            (1, "apple banana", "s0"),
            (2, "apple cherry cherry", "s0"),  # dup token: one posting
            (3, "banana apple", "s1"),
        ],
    )
    docs = ray.data.read_parquet(f"{sf}/documents.parquet")
    got = inverted_index(docs, k=2, head=2).to_pandas()
    assert got["token"].tolist() == ["apple", "banana"]  # df desc, token asc
    assert got["df"].tolist() == [3, 2]
    assert got["postings_head"].tolist() == ["1,2", "1,3"]


def test_shared_vocab_set_ops(ray_session, tmp_path):
    from doctr_ray.functions.text import shared_vocab

    sf = _write_docs(
        tmp_path,
        [
            (1, "common only0", "s0"),
            (2, "common only1 common", "s1"),
        ],
    )
    got = shared_vocab(sf).to_pandas().set_index("token")
    assert got.loc["common", "n_sources"] == 2
    assert got.loc["common", "in_all"] == 1
    assert got.loc["common", "only_src"] == ""
    assert got.loc["only0", "n_sources"] == 1
    assert got.loc["only0", "only_src"] == "s0"
    assert got.loc["only1", "only_src"] == "s1"


def test_source_overlap_counts(ray_session, tmp_path):
    from doctr_ray.functions.dedup import source_overlap

    # 4-gram windows (n=4 keeps the fixture readable)
    sf = _write_docs(
        tmp_path,
        [
            (1, "a b c d e", "s0"),    # grams: abcd, bcde
            (2, "a b c d x", "s1"),    # grams: abcd, bcdx
            (3, "a b c d e", "s2"),    # grams: abcd, bcde
            (4, "z z z z", "s2"),      # gram: zzzz (unshared)
        ],
    )
    got = source_overlap(sf, n=4).to_pandas()
    rows = {(r.src_a, r.src_b): r.shared_grams for r in got.itertuples()}
    assert rows == {
        ("s0", "s1"): 1,            # abcd
        ("s0", "s2"): 2,            # abcd + bcde
        ("s1", "s2"): 1,            # abcd
    }


def test_duckdb_parity_sf(ray_session):
    """New operators vs DuckDB on the real sf0.001 tables."""
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders", "customer",
              "supplier", "nation", "region"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sqls = entry.oracle_sql()
    qs = entry.queries()
    for name in (
        "user_moving_average",
        "event_type_transitions",
        "value_histogram",
        "nation_revenue",
        "inverted_index",
        "shared_vocab",
        "source_overlap",
    ):
        got = qs[name](SF)
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = con.sql(sqls[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False), name


def test_user_retention_cohorts(ray_session, tmp_path):
    from doctr_ray.functions.relational import user_retention

    sf = _write_events(
        tmp_path,
        [
            # user 1: first day 0, active days 0 and 2 (two events day 0)
            (1, 1, "a", "1970-01-01 08:00:00", 0.0),
            (2, 1, "a", "1970-01-01 20:00:00", 0.0),
            (3, 1, "a", "1970-01-03 01:00:00", 0.0),
            # user 2: first day 0, active day 0 only
            (4, 2, "a", "1970-01-01 12:00:00", 0.0),
            # user 3: first day 2, active days 2 and 3
            (5, 3, "a", "1970-01-03 00:00:00", 0.0),
            (6, 3, "a", "1970-01-04 00:00:00", 0.0),
        ],
    )
    got = user_retention(sf).to_pandas()
    cells = {
        (r.cohort_day, r.day_offset): r.n_users for r in got.itertuples()
    }
    assert cells == {(0, 0): 2, (0, 2): 1, (2, 0): 1, (2, 1): 1}


def _write_promo(tmp_path, promo_type="PROMO"):
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": [promo_type, "STANDARD"],
        }),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table({
            "l_partkey": pa.array([1, 2, 1], pa.int64()),
            "l_shipdate": pa.array(
                [pd.Timestamp("1995-03-01"), pd.Timestamp("1995-06-01"),
                 pd.Timestamp("1996-01-01")], pa.timestamp("us")),
            "l_extendedprice": pa.array([10.0, 30.0, 7.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_promo_revenue_share(ray_session, tmp_path, dim_max):
    from doctr_ray.functions.relational import promo_revenue

    sf = _write_promo(tmp_path)
    got = (
        promo_revenue(sf, dim_broadcast_max_rows=dim_max)
        .to_pandas()
        .sort_values("yr")
    )
    # 1995: promo 10.00 of 40.00 -> share 250000; 1996: all promo
    assert got["yr"].tolist() == [1995, 1996]
    assert got["promo_e4"].tolist() == [100_000, 70_000]
    assert got["total_e4"].tolist() == [400_000, 70_000]
    assert got["promo_share_e6"].tolist() == [250_000, 1_000_000]


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_promo_revenue_no_promo_parts(ray_session, tmp_path, dim_max):
    # ADVICE round 3: an empty PROMO key set used to IndexError on
    # keys[pos] of an empty array. Shares must come back 0.
    from doctr_ray.functions.relational import promo_revenue

    sf = _write_promo(tmp_path, promo_type="DELUXE")
    got = (
        promo_revenue(sf, dim_broadcast_max_rows=dim_max)
        .to_pandas()
        .sort_values("yr")
    )
    assert got["promo_e4"].tolist() == [0, 0]
    assert got["promo_share_e6"].tolist() == [0, 0]


def test_token_cooccurrence_apriori(ray_session, tmp_path):
    from doctr_ray.functions.text import token_cooccurrence

    sf = _write_docs(
        tmp_path,
        [
            (1, "a b c rare", "s0"),   # 'rare' df=1 pruned by min_df=2
            (2, "a b b", "s0"),        # repeated token: one doc count
            (3, "a c", "s1"),
        ],
    )
    got = token_cooccurrence(sf, min_df=2, k=3).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == [
        ("a", "b", 2), ("a", "c", 2), ("b", "c", 1),
    ]


def test_winnow_fingerprints_brute_force(ray_session, tmp_path):
    """Operator vs an independent brute-force winnower (min over every
    explicit window slice) on random token streams, plus the MOSS
    guarantee: docs sharing a run of >= w+k-1 words share a
    fingerprint."""
    import hashlib as hl

    from doctr_ray.functions.dedup import winnow_fingerprints

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=n))
        for n in (3, 4, 5, 9, 40, 120)  # below/at/above the window size
    ]
    # two docs sharing an 8-token run (w+k-1 = 8 at k=4, w=5)
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    texts += [f"x y z {shared}", f"{shared} p q r"]
    sf = _write_docs(
        tmp_path, [(i, t, "s0") for i, t in enumerate(texts)]
    )

    def brute(text, k=4, w=5):
        toks = [t for t in text.split(" ") if t]
        n = len(toks) - k + 1
        if n <= 0:
            return None
        keys = [
            hl.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
            + f"{i + 1:012d}"
            for i in range(n)
        ]
        if n <= w:
            return {min(keys)}
        return {min(keys[max(0, i - w + 1):i + 1]) for i in range(w - 1, n)}

    got = winnow_fingerprints(
        ray.data.read_parquet(f"{sf}/documents.parquet")
    ).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        sel = brute(t)
        if sel is None:  # zero k-grams: dropped on both engines
            assert i not in got.index
            continue
        assert got.loc[i, "n_selected"] == len(sel)
        assert got.loc[i, "fp_digest"] == hl.md5(
            ",".join(sorted(sel)).encode()
        ).hexdigest()
    # the winnowing guarantee: the shared 8-run yields a common key
    a, b = brute(texts[-2]), brute(texts[-1])
    assert {s[:32] for s in a} & {s[:32] for s in b}


def test_source_rank_ties(ray_session, tmp_path):
    from doctr_ray.functions.relational import source_rank

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "source": ["s0", "s0", "s0", "s0", "s1"],
            "n_chars": pa.array([10, 10, 20, 5, 7], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = source_rank(str(tmp_path)).to_pandas().set_index("doc_id")
    # s0 order: 5, 10, 10, 20 -> ranks 1,2,2,4 dense 1,2,2,3
    assert got.loc[4, ["rnk", "dense_rnk", "n_src"]].tolist() == [1, 1, 4]
    assert got.loc[1, ["rnk", "dense_rnk"]].tolist() == [2, 2]
    assert got.loc[2, ["rnk", "dense_rnk"]].tolist() == [2, 2]
    assert got.loc[3, ["rnk", "dense_rnk"]].tolist() == [4, 3]
    assert got.loc[5, ["rnk", "n_src"]].tolist() == [1, 1]


def test_power_users_having_gate(ray_session, tmp_path):
    from doctr_ray.functions.relational import power_users

    sf = _write_events(
        tmp_path,
        [
            (1, 1, "view", "2024-01-01 00:00:00", 0.0),
            (2, 1, "click", "2024-01-01 00:01:00", 0.0),
            (3, 1, "view", "2024-01-01 00:02:00", 0.0),   # dup type
            (4, 2, "view", "2024-01-01 00:00:00", 0.0),
            (5, 2, "click", "2024-01-01 00:01:00", 0.0),
            (6, 2, "purchase", "2024-01-01 00:02:00", 0.0),
        ],
    )
    got = power_users(sf, min_types=2).to_pandas().set_index("user_id")
    assert got.loc[1, ["n_types", "n_events"]].tolist() == [2, 3]
    assert got.loc[2, ["n_types", "n_events"]].tolist() == [3, 3]
    assert len(power_users(sf, min_types=3).to_pandas()) == 1


def test_source_mad_exact_domains(ray_session, tmp_path):
    from doctr_ray.functions.relational import source_mad

    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "source": ["a"] * 4 + ["b"] * 3,
            "n_chars": pa.array([1, 3, 5, 100, 10, 10, 40], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = source_mad(str(tmp_path)).to_pandas().set_index("source")
    # a: median(1,3,5,100)=4 -> med_x2=8; |2x-8|: 6,2,2,192 -> med=2 -> x4=8... 
    # in the 2x domain median of (6,2,2,192) = (2+6)/2=4 -> mad_x4=8
    assert got.loc["a", ["n", "med_x2", "mad_x4"]].tolist() == [4, 8, 8]
    # b: median(10,10,40)=10 -> med_x2=20; |2x-20|: 0,0,60 -> median 0
    assert got.loc["b", ["n", "med_x2", "mad_x4"]].tolist() == [3, 20, 0]


def test_rolling_active_users_semantics(ray_session, tmp_path):
    from doctr_ray.functions.relational import rolling_active_users

    sf = _write_events(
        tmp_path,
        [
            # user 1 active day 0 (twice: distinct!) and day 8
            (1, 1, "a", "1970-01-01 01:00:00", 0.0),
            (2, 1, "a", "1970-01-01 23:00:00", 0.0),
            (3, 1, "a", "1970-01-09 00:00:00", 0.0),
            # user 2 active days 0 and 5
            (4, 2, "a", "1970-01-01 12:00:00", 0.0),
            (5, 2, "a", "1970-01-06 12:00:00", 0.0),
        ],
    )
    got = rolling_active_users(sf).to_pandas().set_index("day")
    # observed days: 0, 5, 8
    assert got.loc[0, ["dau", "wau"]].tolist() == [2, 2]
    # day 5: window [-1..5] -> both users (day 0 within 7 days)
    assert got.loc[5, ["dau", "wau"]].tolist() == [1, 2]
    # day 8: window [2..8] -> user 1 (day 8), user 2 (day 5)
    assert got.loc[8, ["dau", "wau"]].tolist() == [1, 2]
    assert len(got) == 3
