"""Co-partitioned semi-join (Q4 shape): predicate edges, window filter,
partial-max merge across batches."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from doctr_ray.functions.relational import order_priority_check

DAY_US = 86_400_000_000


def _write(tmp_path, orders, lineitems):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([0] * len(orders), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders), pa.string()),
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp(o[1]) for o in orders], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([o[2] for o in orders], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lineitems], pa.int64()),
                "l_shipdate": pa.array(
                    [pd.Timestamp(l[1]) for l in lineitems], pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def test_semantics(ray_session, tmp_path):
    sf = _write(
        tmp_path,
        orders=[
            (1, "1996-01-10", "1-URGENT"),   # late item -> counted
            (2, "1996-02-01", "1-URGENT"),   # exactly 90d -> NOT late
            (3, "1996-03-01", "2-HIGH"),     # 91d late -> counted
            (4, "1995-06-01", "2-HIGH"),     # outside window -> excluded
            (5, "1996-01-20", "3-MEDIUM"),   # no lineitems -> excluded
        ],
        lineitems=[
            (1, "1996-01-15"),               # early
            (1, "1996-06-01"),               # 143d late
            (2, "1996-05-01"),               # exactly +90d: > fails
            (3, "1996-05-31"),               # +91d
            (4, "1996-06-01"),               # parent outside window
        ],
    )
    rows = {r["o_orderpriority"]: r["order_count"] for r in order_priority_check(sf).take_all()}
    assert rows == {"1-URGENT": 1, "2-HIGH": 1}


def test_partial_max_merges_across_batches(ray_session, tmp_path):
    # many lineitems for one order spread over rows; only the max ships late
    lis = [(1, "1996-01-02")] * 500 + [(1, "1996-09-01")]
    sf = _write(tmp_path, orders=[(1, "1996-01-01", "5-LOW")], lineitems=lis)
    rows = order_priority_check(sf).take_all()
    assert rows == [{"o_orderpriority": "5-LOW", "order_count": 1}]


def test_orphan_orders_anti_join(ray_session, tmp_path):
    from doctr_ray.functions.relational import orphan_orders

    sf = _write(
        tmp_path,
        orders=[
            (1, "1996-01-10", "1-URGENT"),   # has lineitems
            (2, "1996-02-01", "1-URGENT"),   # orphan
            (3, "1996-03-01", "2-HIGH"),     # orphan
        ],
        lineitems=[(1, "1996-01-15"), (1, "1996-06-01")],
    )
    rows = {r["o_orderpriority"]: r["n_orphans"] for r in orphan_orders(sf).take_all()}
    assert rows == {"1-URGENT": 1, "2-HIGH": 1}
