"""Per-user LAG gaps and GROUPING SETS rollup over events: semantics
on hand-built fixtures plus a DuckDB parity sweep on the synthetic
tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from doctr_ray.functions.relational import (
    event_gaps,
    events_rollup,
    funnel_conversion,
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


def test_event_gaps_semantics(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            # user 1: three events, one ts tie broken by event_id
            (1, 1, "click", "2024-01-01 00:00:00", 1.0),
            (2, 1, "click", "2024-01-01 00:00:05", 1.0),
            (3, 1, "view", "2024-01-01 00:00:05", 1.0),  # tie with event 2
            # user 2: single event -> -1
            (4, 2, "click", "2024-01-01 01:00:00", 1.0),
        ],
    )
    got = (
        event_gaps(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["gap_us"].tolist() == [-1, 5_000_000, 0, -1]


def test_events_rollup_semantics(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            (1, 1, "a", "2024-01-01 00:10:00", 1.5),
            (2, 1, "a", "2024-01-01 00:50:00", 2.5),
            (3, 2, "a", "2024-01-01 01:10:00", 1.0),
            (4, 2, "b", "2024-01-01 00:20:00", 4.0),
        ],
    )
    got = events_rollup(sf).to_pandas()
    h0 = pd.Timestamp("2024-01-01 00:00:00").value // 1000
    h1 = pd.Timestamp("2024-01-01 01:00:00").value // 1000
    rows = {
        (r.event_type, r.hour_us): (r.n, r.sum_value_c)
        for r in got.itertuples()
    }
    assert rows[("a", h0)] == (2, 400)
    assert rows[("a", h1)] == (1, 100)
    assert rows[("b", h0)] == (1, 400)
    assert rows[("a", -1)] == (3, 500)  # per-type subtotal
    assert rows[("b", -1)] == (1, 400)
    assert rows[("ALL", -1)] == (4, 900)  # grand total
    assert len(rows) == 6


def test_funnel_semantics(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            # user 1 completes the funnel
            (1, 1, "view", "2024-01-01 00:00:00", 0.0),
            (2, 1, "click", "2024-01-01 00:01:00", 0.0),
            (3, 1, "purchase", "2024-01-01 00:02:00", 0.0),
            # user 2: click BEFORE the first view -> no click stage
            (4, 2, "click", "2024-01-01 00:00:00", 0.0),
            (5, 2, "view", "2024-01-01 00:01:00", 0.0),
            (6, 2, "purchase", "2024-01-01 00:02:00", 0.0),
            # user 3: ts tie — click same ts as view, larger event_id
            # counts; purchase same ts as click, SMALLER event_id, does not
            (8, 3, "view", "2024-01-01 00:00:00", 0.0),
            (9, 3, "click", "2024-01-01 00:00:00", 0.0),
            (7, 3, "purchase", "2024-01-01 00:00:00", 0.0),
            # user 4: view only
            (10, 4, "view", "2024-01-01 00:00:00", 0.0),
        ],
    )
    got = funnel_conversion(sf).to_pandas()
    assert dict(zip(got["stage"], got["n_users"])) == {
        "view": 4, "click": 2, "purchase": 1,
    }


def test_duckdb_parity_sf(ray_session):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    got = (
        event_gaps(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "user_id", "gap_us"]]
    )
    want = con.sql(
        "SELECT event_id, user_id, CAST(coalesce(epoch_us(ts) - "
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id), "
        "-1) AS BIGINT) AS gap_us FROM events ORDER BY event_id"
    ).df()
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )

    got_r = (
        events_rollup(SF)
        .to_pandas()
        .sort_values(["event_type", "hour_us"])
        .reset_index(drop=True)
    )
    want_r = con.sql(
        "WITH e AS (SELECT event_type, epoch_us(date_trunc('hour', ts)) AS h, "
        "value FROM events) "
        "SELECT coalesce(event_type, 'ALL') AS event_type, "
        "CAST(coalesce(h, -1) AS BIGINT) AS hour_us, count(*) AS n, "
        "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c FROM e "
        "GROUP BY GROUPING SETS ((event_type, h), (event_type), ()) "
        "ORDER BY event_type, hour_us"
    ).df()
    pd.testing.assert_frame_equal(got_r, want_r, check_dtype=False)


def test_source_ntiles_boundaries(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from doctr_ray.functions.relational import source_ntiles

    # n=10, k=4 -> NTILE sizes 3,3,2,2 in (n_chars, doc_id) order
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "source": ["s"] * 10,
                "n_chars": pa.array([5, 5, 5, 1, 2, 3, 9, 9, 9, 9], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        source_ntiles(str(tmp_path))
        .to_pandas()
        .sort_values(["n_chars", "doc_id"])
        .reset_index(drop=True)
    )
    assert got["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # ordered ids: 3(1),4(2),5(3),0,1,2(5s),6,7,8,9(9s)
    assert got["doc_id"].tolist() == [3, 4, 5, 0, 1, 2, 6, 7, 8, 9]


def test_user_running_total_negative_values(ray_session, tmp_path):
    from doctr_ray.functions.relational import user_running_total

    sf = _write_events(
        tmp_path,
        [
            (1, 1, "a", "2024-01-01 00:00:00", 10.0),
            (2, 1, "a", "2024-01-01 00:01:00", -3.5),
            (3, 1, "a", "2024-01-01 00:02:00", 1.25),
            # user 2 (later in sorted order) must reset even after a
            # NEGATIVE-prefix user: catches monotone-accumulate bugs
            (4, 2, "a", "2024-01-01 00:00:00", -7.0),
            (5, 2, "a", "2024-01-01 00:01:00", 2.0),
            (6, 3, "a", "2024-01-01 00:00:00", 5.0),
        ],
    )
    got = (
        user_running_total(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["cum_value_c"].tolist() == [1000, 650, 775, -700, -500, 500]
