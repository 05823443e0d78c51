"""Q17-shaped correlated scalar subquery: exact-integer threshold
semantics and a DuckDB parity sweep."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from doctr_ray.functions.relational import small_quantity_revenue

SF = "/root/testdata/sf0.001"


def test_semantics(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": ["B", "B", "OTHER"],
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    # part 1: qtys 1,10,10,10 -> sum=31, cnt=4; small iff 20*qty < 31
    #   qty 1 qualifies (20 < 31); qty 10 doesn't (200 > 31)
    # part 2: qtys 2,2,2 -> 30*... 5*2*3=30 = sum 6*5? sum=6; 30 < 6 false
    #   (uniform quantities can never be below their own average)
    # part 3: would qualify but wrong brand
    rows = [
        (1, 1, 100.0), (1, 10, 1.0), (1, 10, 1.0), (1, 10, 1.0),
        (2, 2, 5.0), (2, 2, 5.0), (2, 2, 5.0),
        (3, 1, 9.0), (3, 100, 9.0),
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = small_quantity_revenue(str(tmp_path), brand="B").to_pandas()
    assert got["l_partkey"].tolist() == [1]
    assert got["n_small"].tolist() == [1]
    assert got["small_revenue_c"].tolist() == [10000]


def test_duckdb_parity_sf(ray_session):
    got = (
        small_quantity_revenue(SF)
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH pt AS (SELECT p_partkey FROM read_parquet('{SF}/part.parquet')
                    WHERE p_brand = 'Brand#23'),
        a AS (SELECT l_partkey, count(*) AS cnt,
              sum(CAST(l_quantity AS BIGINT)) AS sq
              FROM read_parquet('{SF}/lineitem.parquet') GROUP BY l_partkey)
        SELECT l.l_partkey, count(*) AS n_small,
               CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT) AS small_revenue_c
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN pt ON l.l_partkey = pt.p_partkey
        JOIN a ON a.l_partkey = l.l_partkey
        WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sq
        GROUP BY l.l_partkey ORDER BY l.l_partkey
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
