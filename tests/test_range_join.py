"""Range join (errors x same-user clicks within +/- 5 min): inclusive
bounds, user isolation, LEFT zero-counts, DuckDB parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from doctr_ray.functions.relational import range_join_error_clicks

from tests.test_asof import _write_events

MIN = 60_000_000  # one minute in us


def test_bounds_and_isolation(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 10 * MIN, 7, "error"),
            (2, 5 * MIN, 7, "click"),    # exactly -5 min: inclusive
            (3, 15 * MIN, 7, "click"),   # exactly +5 min: inclusive
            (4, 15 * MIN + 1, 7, "click"),  # 1us past: excluded
            (5, 10 * MIN, 8, "click"),   # other user: excluded
            (6, 11 * MIN, 7, "view"),    # other type: excluded
            (7, 99 * MIN, 9, "error"),   # lonely error -> 0
        ],
    )
    out = {r["error_id"]: r["n_clicks"] for r in range_join_error_clicks(sf).take_all()}
    assert out == {1: 2, 7: 0}


def test_matches_duckdb(ray_session, tmp_path):
    rng = np.random.RandomState(23)
    rows = [
        (
            i,
            int(rng.randint(0, 200 * MIN)),
            int(rng.randint(0, 10)),
            ["click", "error", "view"][int(rng.randint(0, 3))],
        )
        for i in range(500)
    ]
    sf = _write_events(tmp_path, rows)
    mine = (
        range_join_error_clicks(sf)
        .to_pandas()
        .sort_values("error_id")
        .reset_index(drop=True)
    )
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    oracle = con.sql(
        "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'error'), "
        "c AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events WHERE event_type = 'click') "
        "SELECT e.event_id AS error_id, e.user_id, count(c.event_id) AS n_clicks "
        "FROM e LEFT JOIN c ON c.user_id = e.user_id "
        "AND c.tsu BETWEEN e.tsu - 300000000 AND e.tsu + 300000000 "
        "GROUP BY e.event_id, e.user_id"
    ).df().sort_values("error_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        mine[oracle.columns].astype("int64"), oracle.astype("int64")
    )
