"""Large-large bucketed hash join (Q3 shape): filter edges, cross-batch
partial-revenue merge, per-bucket top-k, deterministic tie-break, the
exact int64 e4 revenue domain, the co-partitioned fact-sized-customer
path, and a DuckDB parity sweep on the synthetic tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doctr_ray.functions.relational import shipping_priority

CUTOFF = "1997-06-30"


def _write(tmp_path, customers, orders, lineitems):
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in customers], pa.int64()),
                "c_mktsegment": pa.array([c[1] for c in customers], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp(o[2]) for o in orders], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([o[3] for o in orders], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lineitems], pa.int64()),
                "l_extendedprice": pa.array([l[1] for l in lineitems], pa.float64()),
                "l_discount": pa.array([l[2] for l in lineitems], pa.float64()),
                "l_shipdate": pa.array(
                    [pd.Timestamp(l[3]) for l in lineitems], pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


SEMANTICS_TABLES = dict(
    customers=[
        (1, "BUILDING"),
        (2, "MACHINERY"),  # wrong segment -> order 20 excluded
        (3, "BUILDING"),
    ],
    orders=[
        (10, 1, "1997-01-01", "1-URGENT"),  # qualifies
        (20, 2, "1997-01-01", "1-URGENT"),  # wrong segment
        (30, 3, "1997-06-30", "2-HIGH"),    # orderdate == cutoff: < fails
        (40, 3, "1997-06-01", "2-HIGH"),    # qualifies, two late items
        (50, 1, "1997-05-01", "3-MEDIUM"),  # no late lineitem -> dropped
    ],
    lineitems=[
        (10, 1000.0, 0.10, "1997-07-01"),  # e4 = 100000*90 = 9,000,000
        (10, 500.0, 0.00, "1997-06-30"),   # shipdate == cutoff: > fails
        (20, 700.0, 0.00, "1997-07-02"),   # wrong-segment parent
        (40, 200.0, 0.50, "1997-08-01"),   # 20000*50  = 1,000,000
        (40, 300.0, 0.00, "1997-09-01"),   # 30000*100 = 3,000,000
        (50, 100.0, 0.00, "1997-01-01"),   # shipped before cutoff
        (99, 100.0, 0.00, "1997-07-05"),   # no matching order
    ],
)


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_semantics(ray_session, tmp_path, dim_max):
    sf = _write(tmp_path, **SEMANTICS_TABLES)
    got = (
        shipping_priority(sf, dim_broadcast_max_rows=dim_max)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert got["l_orderkey"].tolist() == [10, 40]
    assert got["revenue_e4"].tolist() == [9_000_000, 4_000_000]
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]
    assert got["o_orderdate_us"].tolist() == [
        pd.Timestamp("1997-01-01").value // 1000,
        pd.Timestamp("1997-06-01").value // 1000,
    ]


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_empty_segment(ray_session, tmp_path, dim_max):
    # ADVICE round 3: a segment with no customers used to IndexError on
    # keys[-1] of an empty sorted-key array. Must return zero rows.
    sf = _write(tmp_path, **SEMANTICS_TABLES)
    got = shipping_priority(
        sf, segment="NO-SUCH-SEGMENT", dim_broadcast_max_rows=dim_max
    ).to_pandas()
    assert len(got) == 0


def test_tie_break_and_limit(ray_session, tmp_path):
    # 12 orders with identical revenue: top-10 must be the 10 smallest keys
    orders = [(k, 1, "1997-01-01", "1-URGENT") for k in range(1, 13)]
    lineitems = [(k, 100.0, 0.0, "1997-07-01") for k in range(1, 13)]
    sf = _write(tmp_path, customers=[(1, "BUILDING")], orders=orders, lineitems=lineitems)
    got = shipping_priority(sf).to_pandas()
    assert got["l_orderkey"].tolist() == list(range(1, 11))


def _oracle(sf):
    con = duckdb.connect()
    return con.sql(
        f"""
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                 AS revenue_e4,
               epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
        FROM read_parquet('{sf}/customer.parquet') c,
             read_parquet('{sf}/orders.parquet') o,
             read_parquet('{sf}/lineitem.parquet') l
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < DATE '{CUTOFF}' AND l_shipdate > DATE '{CUTOFF}'
        GROUP BY l_orderkey, o_orderdate_us, o_orderpriority
        ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10
        """
    ).df()


@pytest.mark.parametrize("dim_max", [10**6, 0], ids=["broadcast", "copartition"])
def test_duckdb_parity_sf(ray_session, dim_max):
    sf = "/root/testdata/sf0.001"
    got = (
        shipping_priority(sf, dim_broadcast_max_rows=dim_max)
        .to_pandas()
        .sort_values(["revenue_e4", "l_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = _oracle(sf)
    pd.testing.assert_frame_equal(
        got.astype({"o_orderdate_us": np.int64}),
        want.astype({"o_orderdate_us": np.int64}),
        check_dtype=False,
    )


def test_plan_has_single_shuffle(ray_session):
    # broadcast-dim path: exactly ONE all-to-all (the kb-bucket
    # co-partition groupby; Ray implements groupby as a sort shuffle).
    # The top-k itself must add no second Sort — it is
    # partial-per-bucket + one final combine.
    plan = repr(shipping_priority("/root/testdata/sf0.001"))
    assert plan.count("Sort") == 1


def test_copartition_path_no_driver_dim_read(ray_session, tmp_path, monkeypatch):
    # Above the threshold the customer parquet must never be read into
    # driver pandas — only footer metadata.
    import doctr_ray.functions.relational as rel

    sf = _write(tmp_path, **SEMANTICS_TABLES)

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side pandas read of a fact-sized dim")

    monkeypatch.setattr(rel, "read_dim_pandas", _boom)
    got = shipping_priority(sf, dim_broadcast_max_rows=0).to_pandas()
    assert got["l_orderkey"].tolist() == [10, 40]
