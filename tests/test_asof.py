"""As-of join (click -> latest prior same-user view): match semantics,
ties, LEFT behavior, cross-user isolation, block independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from doctr_ray.functions.relational import asof_click_attribution


def _write_events(tmp_path, rows):
    # rows: (event_id, ts_us, user_id, event_type)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_semantics(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1000, 7, "view"),
            (2, 2000, 7, "view"),
            (3, 2500, 7, "click"),   # -> view 2
            (4, 3000, 7, "view"),
            (5, 3000, 7, "click"),   # equal ts: view 4 eligible
            (6, 100, 8, "click"),    # no prior view for user 8 -> -1
            (7, 50, 9, "view"),      # other user's view must not leak
            (8, 9999, 8, "view"),
            (9, 10000, 8, "click"),  # -> view 8
            (10, 500, 9, "error"),   # other types ignored
        ],
    )
    out = {r["click_id"]: r for r in asof_click_attribution(sf).take_all()}
    assert out[3]["view_id"] == 2 and out[3]["gap_us"] == 500
    assert out[5]["view_id"] == 4 and out[5]["gap_us"] == 0
    assert out[6]["view_id"] == -1 and out[6]["gap_us"] == -1
    assert out[9]["view_id"] == 8 and out[9]["gap_us"] == 1
    assert len(out) == 4


def test_equal_ts_views_highest_event_id_wins(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1000, 3, "view"),
            (2, 1000, 3, "view"),   # same ts: higher event_id wins
            (3, 1500, 3, "click"),
        ],
    )
    (row,) = asof_click_attribution(sf).take_all()
    assert row["view_id"] == 2


def test_matches_duckdb_asof(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                int(rng.randint(0, 1_000_000)),
                int(rng.randint(0, 20)),
                ["view", "click", "error"][int(rng.randint(0, 3))],
            )
        )
    sf = _write_events(tmp_path, rows)
    mine = (
        asof_click_attribution(sf)
        .to_pandas()
        .sort_values("click_id")
        .reset_index(drop=True)
    )
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle = con.sql(
        "WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'), "
        "v AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'view'), "
        "m AS (SELECT c.event_id AS click_id, c.user_id, c.tsu AS click_ts_us, "
        "max(row(v.tsu, v.event_id)) AS best "
        "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.tsu <= c.tsu "
        "GROUP BY c.event_id, c.user_id, c.tsu) "
        "SELECT click_id, user_id, click_ts_us, COALESCE(best[2], -1) AS view_id, "
        "CASE WHEN best[2] IS NULL THEN -1 ELSE click_ts_us - best[1] END AS gap_us FROM m"
    ).df().sort_values("click_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        mine[oracle.columns].astype("int64"), oracle.astype("int64")
    )


# ---- adversarial tie coverage: tiny ts domain forces exact-ts collisions

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),      # ts_us: collisions likely
            st.integers(min_value=0, max_value=3),       # user_id
            st.sampled_from(["view", "click", "error"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_asof_ties_match_duckdb(ray_session, tmp_path_factory, events):
    """Equal-timestamp views/clicks are exactly where as-of semantics
    can diverge — drive both engines over a tiny ts domain."""
    import duckdb

    from doctr_ray.functions.relational import asof_click_attribution

    rows = [(i, ts, u, ty) for i, (ts, u, ty) in enumerate(events)]
    sf = _write_events(tmp_path_factory.mktemp("asof"), rows)
    mine = sorted(
        (r["click_id"], r["view_id"], r["gap_us"])
        for r in asof_click_attribution(sf).take_all()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    oracle = sorted(
        tuple(r)
        for r in con.sql(
            "WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click'), "
            "v AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'view'), "
            "m AS (SELECT c.event_id AS click_id, c.user_id, c.tsu, "
            "max(row(v.tsu, v.event_id)) AS best "
            "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.tsu <= c.tsu "
            "GROUP BY c.event_id, c.user_id, c.tsu) "
            "SELECT click_id, COALESCE(best[2], -1), "
            "CASE WHEN best[2] IS NULL THEN -1 ELSE tsu - best[1] END FROM m"
        ).fetchall()
    )
    assert mine == oracle


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["click", "error"]),
        ),
        min_size=1,
        max_size=40,
    ),
    win_min=st.integers(min_value=0, max_value=3),
)
def test_range_join_boundaries_match_duckdb(ray_session, tmp_path_factory, events, win_min):
    """Inclusive-boundary and zero-width windows vs DuckDB BETWEEN."""
    import duckdb

    from doctr_ray.functions.relational import range_join_error_clicks

    rows = [(i, ts * 60_000_000, u, ty) for i, (ts, u, ty) in enumerate(events)]
    sf = _write_events(tmp_path_factory.mktemp("rj"), rows)
    mine = sorted(
        (r["error_id"], r["n_clicks"])
        for r in range_join_error_clicks(sf, window_minutes=win_min).take_all()
    )
    w_us = win_min * 60_000_000
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    oracle = sorted(
        tuple(r)
        for r in con.sql(
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'error'), "
            "c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click') "
            "SELECT e.event_id, count(c.event_id) FROM e LEFT JOIN c "
            "ON c.user_id = e.user_id AND c.tsu BETWEEN e.tsu - "
            f"{w_us} AND e.tsu + {w_us} "
            "GROUP BY e.event_id"
        ).fetchall()
    )
    assert mine == oracle
