"""Relational operators over the TPC-H-ish tables — breadth proof.

Each pipeline is Ray-Data-idiomatic: column-pruned reads, vectorized
pyarrow.compute kernels in ``map_batches``, per-batch partial
aggregation before the (small) ``groupby`` shuffle, broadcast lookups
instead of shuffle joins for dimension tables. Matching SQL oracles in
__ray_entry__.oracle_sql.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from doctr_ray.tableio import read_dim_pandas


def read_table(sf_dir: str, table: str, columns: list[str]):
    """Pruned read with a footer-sized block count (~500 rows/block,
    clamp [8, 64]) — Ray's min-task-count splitting otherwise shreds
    these small single-file tables into 64 near-empty blocks whose
    scheduling dominates every stage (CLAUDE.md landmine). Sharded
    layouts (``{table}/part-*.parquet`` or ``{table}-N.parquet``)
    resolve through :mod:`doctr_ray.tableio` with >= one block per
    shard."""
    from doctr_ray.tableio import read_table_ds

    return read_table_ds(sf_dir, table, columns)


def bucket_mask_for(sf_dir: str, table: str, rows_per_bucket: int = 50_000) -> int:
    """Adaptive power-of-two bucket mask for keyed reducers, sized from
    the table's parquet footer (free): ~``rows_per_bucket`` rows land in
    each reducer at ANY corpus size, with a cluster-parallelism floor
    (see pool.adaptive_buckets) so a mid-size table doesn't starve the
    reduce phase. A fixed 64-way split is wrong at both ends — at 100x
    scale one bucket is 1/64 of ALL rows concatenated into a single
    pandas frame (unbounded reducer memory), and on a small table it
    fragments the groupby into near-empty ~1ms Python tasks (CLAUDE.md
    landmine). Power of two so the hot path stays a single
    ``bit_wise_and`` Arrow kernel."""
    from doctr_ray.pool import adaptive_bucket_mask
    from doctr_ray.tableio import table_num_rows

    return adaptive_bucket_mask(table_num_rows(sf_dir, table), rows_per_bucket)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over lineitem.

    Partial per-batch aggregation (one row per key per batch) before the
    groupby — the shuffle moves O(batches x keys) tiny rows, not 600k.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "lineitem", [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = batch.append_column("revenue", rev)
        df = t.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_revenue=("revenue", "sum"),
                n_rows=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_revenue", alias_name="sum_revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    def _fixed_point(batch: pa.Table) -> pa.Table:
        # int64 fixed-point (qty is integral, money has 2 decimals,
        # revenue 4) — float rounding is ulp-unstable across engines
        df = batch.to_pandas()
        df["sum_qty"] = np.round(df["sum_qty"]).astype(np.int64)
        df["sum_base_price_c"] = np.round(df["sum_base_price"] * 100).astype(np.int64)
        df["sum_revenue_c4"] = np.round(df["sum_revenue"] * 10000).astype(np.int64)
        return pa.Table.from_pandas(
            df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_c", "sum_revenue_c4", "n_rows"]],
            preserve_index=False,
        )

    return agg.map_batches(_fixed_point, batch_format="pyarrow")


def top_customer_revenue(sf_dir: str, limit: int = 20):
    """Revenue per customer via a broadcast dimension join.

    orders is aggregated per custkey (partial per batch, then groupby);
    the customer dimension is broadcast with ``ray.put`` and joined
    inside ``map_batches`` — no all-to-all join shuffle.
    """
    import ray
    import ray.data as rd

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    # coarse-bucket combine instead of a native groupby(custkey)
    # aggregate: per-batch partials barely reduce (~10 orders/customer)
    # so the native per-key shuffle moved ~130k rows through seconds of
    # Aggregate overhead (the CLAUDE.md native-groupby landmine);
    # bucketing by custkey & mask keeps the same co-location guarantee
    # with a vectorized pandas combine per bucket.
    mask = bucket_mask_for(sf_dir, "orders")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False)["o_totalprice"].sum()
        g["cb"] = (g["o_custkey"].to_numpy(np.int64) & mask).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    cust = read_dim_pandas(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    cref = ray.put(cust.set_index("c_custkey"))

    def _bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # full per-customer sums (a custkey lives wholly in one bucket),
        # THEN the per-bucket top-k partial — the dimension join touches
        # only the <= limit survivors, not the whole customer dimension
        s = g.groupby("o_custkey", as_index=False)["o_totalprice"].sum()
        s["revenue_c"] = np.round(s["o_totalprice"] * 100).astype(np.int64)
        s = s.sort_values(
            ["revenue_c", "o_custkey"], ascending=[False, True], kind="stable"
        ).head(limit)
        dim = ray.get(cref)
        s = s.join(dim, on="o_custkey", how="inner")
        s = s.rename(columns={"o_custkey": "c_custkey"})
        return s[["c_custkey", "c_name", "c_mktsegment", "revenue_c"]]

    def _final_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["revenue_c", "c_custkey"], ascending=[False, True], kind="stable"
        ).head(limit)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("cb")
        .map_groups(_bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(_final_topk, batch_format="pyarrow", batch_size=None)
    )


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the events stream table.

    Window = (event_type, hour bucket); implemented as a vectorized
    per-batch partial count/sum then one coarse hour-bucket shuffle
    with a vectorized combine — the streaming-shaped workload pattern
    (ray_guide: groupby over time buckets).
    """
    import ray.data as rd

    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])
    mask = bucket_mask_for(sf_dir, "events")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        hr_us = g["hour"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g["hb"] = ((hr_us // 3_600_000_000) & mask).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        # a (type, hour) key lives wholly in one hb bucket; coarse
        # combine instead of the native per-key Aggregate (CLAUDE.md
        # landmine: seconds of overhead at thousands of composite keys)
        out = g.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        out["hour"] = out["hour"].astype("datetime64[us]")  # match duckdb precision
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_value_c"] = np.round(out["sum_value"] * 100).astype(np.int64)
        return out[["event_type", "hour", "n_events", "sum_value_c"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("hb")
        .map_groups(_combine, batch_format="pandas")
    )


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization of the events stream.

    The streaming-shaped pattern from the Ray guide: partition by key
    (user_id), sort by ts within the group, cut sessions where the gap
    exceeds ``gap_minutes``. Emits one row per session with count/span.
    Ordering assumption: per-user event order is defined by (ts,
    event_id) — stated so the SQL oracle (window functions) matches
    deterministically.
    """
    import ray.data as rd

    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        new = (g["ts"].diff() > gap).to_numpy()
        if len(new):
            new[0] = True  # NaT > gap is False, not NaN — set explicitly
        g["session_idx"] = np.cumsum(new).astype(np.int64) - 1
        agg = g.groupby("session_idx", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            sum_value=("value", "sum"),
        )
        agg["session_start"] = agg["session_start"].astype("datetime64[us]")
        agg["session_end"] = agg["session_end"].astype("datetime64[us]")
        agg["sum_value_c"] = np.round(agg["sum_value"] * 100).astype(np.int64)
        return agg[
            ["user_id", "session_idx", "session_start", "session_end", "n_events", "sum_value_c"]
        ]

    # partition by user bucket (vectorized multi-user reducer, not one
    # python call per user), sessionize per user inside; bucket count
    # adapts to the events table size (~50k rows per reducer)
    mask = bucket_mask_for(sf_dir, "events")

    def _bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "ub", pc.cast(pc.bit_wise_and(batch["user_id"], mask), pa.int32())
        )

    def _per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = [
            _sessions(u.drop(columns=["ub"]))
            for _, u in g.groupby("user_id", sort=False)
        ]
        return pd.concat(out, ignore_index=True)

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_per_bucket, batch_format="pandas")
    )


def supplier_balance_by_nation(sf_dir: str):
    """supplier x nation broadcast join -> per-nation account balance."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    sup = read_table(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    nation = read_dim_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    nref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def add_nation(batch: pa.Table) -> pa.Table:
        lookup = ray.get(nref)
        df = batch.to_pandas()
        df["n_name"] = df["s_nationkey"].map(lookup)
        return pa.Table.from_pandas(df[["n_name", "s_acctbal"]], preserve_index=False)

    agg = (
        sup.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("s_acctbal", alias_name="total_acctbal"),
            Count(alias_name="n_suppliers"),
        )
    )

    def _fixed_point(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["total_acctbal_c"] = np.round(df["total_acctbal"] * 100).astype(np.int64)
        return pa.Table.from_pandas(
            df[["n_name", "total_acctbal_c", "n_suppliers"]], preserve_index=False
        )

    return agg.map_batches(_fixed_point, batch_format="pyarrow")


def events_sliding_window(sf_dir: str, width_minutes: int = 60, slide_minutes: int = 15):
    """SLIDING-window aggregate over the events stream (the brief's
    "streaming window" custom operator).

    Ray Data has no window operator; the scale-correct composition is
    map-side fan-out + keyed aggregate: each event emits one partial
    row per window that CONTAINS it (width/slide rows — here 4), then
    one groupby over (event_type, window_start) sums the partials. The
    fan-out factor is a constant, so the shuffle stays linear in the
    input; no per-key python groups anywhere. Emits (event_type,
    window_start, n_events, sum_value_c), windows aligned to the epoch
    slide grid.
    """
    import ray.data as rd

    assert width_minutes % slide_minutes == 0
    k = width_minutes // slide_minutes
    slide = np.timedelta64(slide_minutes, "m")
    width = np.timedelta64(width_minutes, "m")
    slide_us = np.int64(slide_minutes) * 60_000_000

    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])
    # coarse window-bucket combine instead of a native groupby over
    # (event_type, window_start) — thousands of composite keys through
    # the Aggregate operator cost seconds (CLAUDE.md landmine); the
    # bucket key is the slide-grid index masked adaptively, reducers
    # finish with one vectorized pandas groupby each
    mask = bucket_mask_for(sf_dir, "events")

    def fanout_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        # last slide-aligned window start covering the event, then the
        # k-1 earlier ones
        base = np.datetime64(0, "m") + (
            (ts.astype("datetime64[m]") - np.datetime64(0, "m")) // slide
        ) * slide
        frames = []
        for j in range(k):
            w0 = base.astype("datetime64[us]") - j * slide
            d = pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "window_start": w0,
                    "value": df["value"],
                }
            )
            # an event belongs to [w0, w0 + width)
            d = d[(ts >= d["window_start"].to_numpy()) & (ts < (d["window_start"] + width).to_numpy())]
            frames.append(d)
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        ws_us = g["window_start"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g["wb"] = ((ws_us // slide_us) & mask).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        # a (type, window) key lives wholly in one wb bucket
        out = g.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_value_c"] = np.round(out["sum_value"] * 100).astype(np.int64)
        return out[["event_type", "window_start", "n_events", "sum_value_c"]]

    return (
        ds.map_batches(fanout_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("wb")
        .map_groups(_combine, batch_format="pandas")
    )


def asof_click_attribution(sf_dir: str):
    """As-of join — the custom operator the Dataset API lacks, built as
    co-bucketed map_groups: every 'click' event joins the latest 'view'
    event of the SAME user with ``view.ts <= click.ts`` (ad-attribution
    semantics; DuckDB's ASOF JOIN family).

    Partitioning assumption (documented per the engine's custom-operator
    policy): both sides co-locate by ``user_id`` bucket — the ONLY
    shuffle — and the per-bucket reducer is one vectorized positional
    scan, no per-user Python groups:

    sort by (user, ts, view-before-click, event_id); a running maximum
    over view positions then yields, for every click, the latest
    eligible view index; a same-user check rejects carry-over from the
    previous user's segment (any same-user view sorts later than every
    previous user's row, so the running max is user-correct whenever a
    same-user view exists). Tie semantics: a view sharing the click's
    exact timestamp is eligible, and among equal-ts views the highest
    event_id wins — the oracle's ``max(row(v.tsu, v.event_id))``.

    Output: (click_id, user_id, click_ts_us, view_id, gap_us), with
    ``view_id = gap_us = -1`` for never-matched clicks (LEFT semantics).
    """
    import ray.data as rd

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    mask = bucket_mask_for(sf_dir, "events")  # adaptive reducer count

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(batch["event_type"], value_set=pa.array(["click", "view"]))
        )
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(t["user_id"], mask), pa.int32()),
                t["user_id"],
                t["event_id"],
                pc.cast(t["ts"], pa.int64()),  # timestamp[us] -> us since epoch
                pc.cast(pc.equal(t["event_type"], "click"), pa.int8()),
            ],
            names=["ub", "user_id", "event_id", "ts_us", "is_click"],
        )

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        ic = g["is_click"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ic, ts, u))  # user, ts, view<click, eid
        u, eid, ts, ic = u[order], eid[order], ts[order], ic[order]
        pos = np.arange(len(u), dtype=np.int64)
        last_view = np.maximum.accumulate(np.where(ic == 0, pos, -1))
        clk = pos[ic == 1]
        cand = last_view[clk]
        valid = (cand >= 0) & (u[np.maximum(cand, 0)] == u[clk])
        return pd.DataFrame(
            {
                "click_id": eid[clk],
                "user_id": u[clk],
                "click_ts_us": ts[clk],
                "view_id": np.where(valid, eid[np.maximum(cand, 0)], -1),
                "gap_us": np.where(valid, ts[clk] - ts[np.maximum(cand, 0)], -1),
            }
        )

    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_asof, batch_format="pandas")
    )


def range_join_error_clicks(sf_dir: str, window_minutes: int = 5):
    """Range join — the second custom operator the Dataset API lacks:
    for every 'error' event, the number of same-user 'click' events
    within +/- ``window_minutes`` (inclusive both ends).

    Partitioning assumption: both sides co-locate by user bucket (ONE
    shuffle). The per-bucket reducer is fully vectorized: clicks sort
    once on a combined ``user * 2^44 + (ts - t0)`` int64 key (the time
    offset spans < 2^44 us, so user segments never interleave and the
    window clamps to the segment), then every error row's count is two
    ``np.searchsorted`` probes — O((E+C) log C) per bucket, no per-user
    Python groups, no quadratic join.

    Output: (error_id, user_id, n_clicks) with 0 for lonely errors
    (LEFT semantics, matching the oracle's LEFT JOIN + count).
    """
    import ray.data as rd

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    mask = bucket_mask_for(sf_dir, "events")  # adaptive reducer count
    win_us = window_minutes * 60_000_000
    SHIFT = np.int64(1) << 44  # > any ts offset in the corpus (asserted)

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(batch["event_type"], value_set=pa.array(["click", "error"]))
        )
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(t["user_id"], mask), pa.int32()),
                t["user_id"],
                t["event_id"],
                pc.cast(t["ts"], pa.int64()),
                pc.cast(pc.equal(t["event_type"], "error"), pa.int8()),
            ],
            names=["ub", "user_id", "event_id", "ts_us", "is_err"],
        )

    def _range_join(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        ie = g["is_err"].to_numpy(dtype=np.int64)
        t0 = ts.min()
        dt = ts - t0
        assert dt.max() < SHIFT - win_us, "time span exceeds key headroom"
        err = ie == 1
        clk_keys = np.sort(u[~err] * SHIFT + dt[~err])
        lo = u[err] * SHIFT + np.maximum(dt[err] - win_us, 0)
        hi = u[err] * SHIFT + (dt[err] + win_us)
        n = np.searchsorted(clk_keys, hi, side="right") - np.searchsorted(
            clk_keys, lo, side="left"
        )
        return pd.DataFrame(
            {
                "error_id": eid[err],
                "user_id": u[err],
                "n_clicks": n.astype(np.int64),
            }
        )

    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_range_join, batch_format="pandas")
    )


def order_priority_check(sf_dir: str):
    """TPC-H Q4 shape — the large-to-large co-partitioned SEMI-JOIN
    (neither side is broadcastable at scale): orders placed in
    [1996-01-01, 1996-04-01) that have at least one lineitem shipped
    more than 90 days after the order date, counted by priority.

    Scale shape: both sides prune at the read and pre-aggregate BEFORE
    the exchange — lineitem collapses per batch to (orderkey,
    max_shipdate) partials (the EXISTS predicate only needs the max),
    so the ONE orderkey-bucket shuffle moves two int64s per distinct
    key per batch instead of the lineitem fact rows. The per-bucket
    reducer joins vectorized (pandas hash groupby + merge), emits
    per-priority partial counts, and a single-group final combine sums
    them (5 priorities — never a per-key native aggregate).
    """
    import ray.data as rd

    NINETY_DAYS_US = 90 * 86_400_000_000
    LO = pd.Timestamp("1996-01-01").value // 1000  # us
    HI = pd.Timestamp("1996-04-01").value // 1000
    # both sides must bucket with the SAME mask; size from the big side
    mask = bucket_mask_for(sf_dir, "lineitem")

    def _orders(batch: pa.Table) -> pa.Table:
        od = pc.cast(batch["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(od, LO), pc.less(od, HI))
        t = batch.append_column("od_us", od).filter(keep)
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(t["o_orderkey"], mask), pa.int32()),
                t["o_orderkey"],
                t["od_us"],
                t["o_orderpriority"],
                pa.array([0] * len(t), pa.int8()),
            ],
            names=["kb", "okey", "ts_us", "pr", "side"],
        )

    def _lineitem(batch: pa.Table) -> pa.Table:
        # per-batch partial: max shipdate per orderkey (combiner)
        df = pd.DataFrame(
            {
                "okey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship": batch["l_shipdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        agg = df.groupby("okey", sort=False)["ship"].max().reset_index()
        n = len(agg)
        return pa.Table.from_arrays(
            [
                pa.array(
                    (agg["okey"].to_numpy() & mask).astype(np.int32), pa.int32()
                ),
                pa.array(agg["okey"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(agg["ship"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array([""] * n, pa.string()),
                pa.array([1] * n, pa.int8()),
            ],
            names=["kb", "okey", "ts_us", "pr", "side"],
        )

    def _join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["side"] == 0]
        li = g[g["side"] == 1]
        ship_max = li.groupby("okey", sort=False)["ts_us"].max()
        m = orders.merge(
            ship_max.rename("ship_us"), left_on="okey", right_index=True, how="inner"
        )
        late = m[m["ship_us"] > m["ts_us"] + NINETY_DAYS_US]
        out = late.groupby("pr", sort=False).size().reset_index(name="cnt")
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pr", sort=False)["cnt"].sum().reset_index()
        out.columns = ["o_orderpriority", "order_count"]
        return out

    orders_ds = read_table(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(_orders, batch_format="pyarrow")
    li_ds = read_table(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(_lineitem, batch_format="pyarrow")
    # the union carries ~128 near-empty partial blocks into the sort
    # shuffle (reduce fan grows with block count); coalescing the TINY
    # combiner partials first is a barrier on kilobytes, not facts —
    # measured 5.2 s -> 2.5 s at sf0.1/32cpu
    return (
        orders_ds.union(li_ds)
        .repartition(16)
        .groupby("kb")
        .map_groups(_join_bucket, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def orphan_orders(sf_dir: str):
    """ANTI-join — the referential-integrity audit shape: orders with
    NO lineitems at all, counted by order priority. Complements the
    semi-join (:func:`order_priority_check`) with the inverted
    membership test over the same co-partitioned machinery: lineitem
    collapses per batch to DISTINCT orderkeys (the anti predicate needs
    nothing else), one orderkey-bucket shuffle co-locates both sides,
    and the per-bucket reducer keeps orders whose key never appears.
    """
    import ray.data as rd

    # both sides must bucket with the SAME mask; size from the big side
    mask = bucket_mask_for(sf_dir, "lineitem")

    def _orders(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(pc.bit_wise_and(batch["o_orderkey"], mask), pa.int32()),
                batch["o_orderkey"],
                batch["o_orderpriority"],
                pa.array([0] * len(batch), pa.int8()),
            ],
            names=["kb", "okey", "pr", "side"],
        )

    def _lineitem(batch: pa.Table) -> pa.Table:
        keys = pd.unique(batch["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [
                pa.array((keys & mask).astype(np.int32), pa.int32()),
                pa.array(keys.astype(np.int64), pa.int64()),
                pa.array([""] * len(keys), pa.string()),
                pa.array([1] * len(keys), pa.int8()),
            ],
            names=["kb", "okey", "pr", "side"],
        )

    def _anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["side"] == 0]
        seen = set(g.loc[g["side"] == 1, "okey"].to_numpy())
        lonely = orders[~orders["okey"].isin(seen)]
        out = lonely.groupby("pr", sort=False).size().reset_index(name="cnt")
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pr", sort=False)["cnt"].sum().reset_index()
        out.columns = ["o_orderpriority", "n_orphans"]
        return out

    orders_ds = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
    ).map_batches(_orders, batch_format="pyarrow")
    li_ds = read_table(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        _lineitem, batch_format="pyarrow"
    )
    return (
        orders_ds.union(li_ds)
        .repartition(16)  # coalesce tiny key partials (see order_priority_check)
        .groupby("kb")
        .map_groups(_anti_bucket, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


#: Dimension tables whose parquet footer reports more rows than this are
#: fact-sized: they are co-partitioned through the bucketed-join machinery
#: instead of being read into driver pandas and broadcast (a customer or
#: part table at sf100 is 15-20M rows — a multi-GB driver materialization).
DIM_BROADCAST_MAX_ROWS = 1_000_000


def table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer(s) (free: no data pages read)."""
    from doctr_ray.tableio import table_num_rows

    return table_num_rows(sf_dir, table)


def sorted_key_lookup(keys: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Membership mask of ``q`` against sorted ``keys`` — empty-safe
    (``keys[pos]`` on an empty array raises; a segment/type with no
    dimension rows is a legal query)."""
    if len(keys) == 0:
        return np.zeros(len(q), bool)
    pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
    return keys[pos] == q


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-30",
    limit: int = 10,
    dim_broadcast_max_rows: int = DIM_BROADCAST_MAX_ROWS,
):
    """TPC-H Q3-shaped large-large equi-join: unshipped-order revenue.

    The one join shape the suite lacked: BOTH sides are fact tables
    (orders x lineitem on orderkey) so neither can be broadcast — this
    is the canonical bucketed hash join. Each side filters and
    pre-aggregates per batch (lineitem collapses to one revenue partial
    per orderkey per batch), tags itself, buckets by ``orderkey &
    mask`` with a mask sized from the BIG side's footer, and one union
    + groupby co-locates matching keys; the per-bucket reducer builds
    the orders hash side, sums lineitem partials against it, and emits
    only its local top-``limit`` — the final combine sees
    ``limit x n_buckets`` tiny rows, never a global sort.

    Revenue is carried in the EXACT int64 e4 domain per row
    (``round(price*100) * (100 - round(disc*100))``) so partial sums
    are order-independent under any partitioning — float summation
    order plus a final ``np.round`` (half-even) vs DuckDB ``round()``
    (half-away) differs by one cent on values landing exactly on half
    cents, which TPC-H prices do.

    The customer dimension broadcasts only while its footer says it is
    small (``dim_broadcast_max_rows``); above that it is co-partitioned
    with orders on custkey (a second bucketed semi-join stage) so the
    driver never materializes a fact-sized table.
    """
    import ray

    mask = bucket_mask_for(sf_dir, "lineitem")
    cutoff_us = np.int64(pd.Timestamp(cutoff).value // 1000)

    def _orders_row_table(okey, odate, pr) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array((okey & mask).astype(np.int32), pa.int32()),
                pa.array(okey, pa.int64()),
                pa.array(np.zeros(len(okey), np.int8), pa.int8()),
                pa.array(np.zeros(len(okey), np.int64), pa.int64()),
                pa.array(odate, pa.int64()),
                pr,
            ],
            names=["kb", "okey", "side", "rev_e4", "odate_us", "pr"],
        )

    orders_cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    if table_rows(sf_dir, "customer") <= dim_broadcast_max_rows:
        cust = read_dim_pandas(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        ckeys = np.sort(
            cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy()
        )
        cref = ray.put(ckeys)

        def _orders(batch: pa.Table) -> pa.Table:
            keys = ray.get(cref)
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            ocust = batch["o_custkey"].to_numpy(zero_copy_only=False)
            odate = (
                batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            keep = (odate < cutoff_us) & sorted_key_lookup(keys, ocust)
            pr = batch["o_orderpriority"].filter(pa.array(keep))
            return _orders_row_table(okey[keep], odate[keep], pr)

        orders_ds = read_table(sf_dir, "orders", orders_cols).map_batches(
            _orders, batch_format="pyarrow"
        )
    else:
        # fact-sized customer: bucketed semi-join on custkey, no driver read
        cmask = bucket_mask_for(sf_dir, "customer")

        def _cust_rows(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch["c_mktsegment"], segment)
            ck = batch["c_custkey"].filter(keep).to_numpy(zero_copy_only=False)
            n = len(ck)
            return pa.Table.from_arrays(
                [
                    pa.array((ck & cmask).astype(np.int32), pa.int32()),
                    pa.array(ck, pa.int64()),
                    pa.array(np.zeros(n, np.int8), pa.int8()),
                    pa.array(np.zeros(n, np.int64), pa.int64()),
                    pa.array(np.zeros(n, np.int64), pa.int64()),
                    pa.array([""] * n, pa.string()),
                ],
                names=["cb", "ckey", "side", "okey", "odate_us", "pr"],
            )

        def _order_rows(batch: pa.Table) -> pa.Table:
            odate = (
                batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            keep = odate < cutoff_us
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
            pr = batch["o_orderpriority"].filter(pa.array(keep))
            n = len(ck)
            return pa.Table.from_arrays(
                [
                    pa.array((ck & cmask).astype(np.int32), pa.int32()),
                    pa.array(ck, pa.int64()),
                    pa.array(np.ones(n, np.int8), pa.int8()),
                    pa.array(okey, pa.int64()),
                    pa.array(odate[keep], pa.int64()),
                    pr,
                ],
                names=["cb", "ckey", "side", "okey", "odate_us", "pr"],
            )

        def _semi_bucket(g: pd.DataFrame) -> pa.Table:
            # Arrow out: the result unions with _lineitem's Arrow blocks
            # and Ray's Sort shuffle requires a single block type.
            keys = np.sort(g.loc[g["side"] == 0, "ckey"].to_numpy())
            o = g[g["side"] == 1]
            hit = o[sorted_key_lookup(keys, o["ckey"].to_numpy())]
            okey = hit["okey"].to_numpy()
            return pa.Table.from_arrays(
                [
                    pa.array((okey & mask).astype(np.int32), pa.int32()),
                    pa.array(okey, pa.int64()),
                    pa.array(np.zeros(len(okey), np.int8), pa.int8()),
                    pa.array(np.zeros(len(okey), np.int64), pa.int64()),
                    pa.array(hit["odate_us"].to_numpy(), pa.int64()),
                    pa.array(hit["pr"].to_numpy(), pa.string()),
                ],
                names=["kb", "okey", "side", "rev_e4", "odate_us", "pr"],
            )

        cust_ds = read_table(
            sf_dir, "customer", ["c_custkey", "c_mktsegment"]
        ).map_batches(_cust_rows, batch_format="pyarrow")
        o_raw = read_table(sf_dir, "orders", orders_cols).map_batches(
            _order_rows, batch_format="pyarrow"
        )
        orders_ds = (
            cust_ds.union(o_raw)
            .groupby("cb")
            .map_groups(_semi_bucket, batch_format="pandas")
        )

    def _lineitem(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship > cutoff_us
        price_c = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_bp = np.round(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "okey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "rev_e4": (price_c * (100 - disc_bp))[keep],
            }
        )
        g = df.groupby("okey", as_index=False)["rev_e4"].sum()
        n = len(g)
        return pa.Table.from_arrays(
            [
                pa.array((g["okey"].to_numpy() & mask).astype(np.int32), pa.int32()),
                pa.array(g["okey"].to_numpy(), pa.int64()),
                pa.array(np.ones(n, np.int8), pa.int8()),
                pa.array(g["rev_e4"].to_numpy(np.int64), pa.int64()),
                pa.array(np.zeros(n, np.int64), pa.int64()),
                pa.array([""] * n, pa.string()),
            ],
            names=["kb", "okey", "side", "rev_e4", "odate_us", "pr"],
        )

    def _join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        rev = li.groupby("okey", sort=True)["rev_e4"].sum()  # int64: order-free
        hit = o[o["okey"].isin(rev.index)]
        out = pd.DataFrame(
            {
                "l_orderkey": hit["okey"].to_numpy(),
                "revenue_e4": rev.loc[hit["okey"]].to_numpy(np.int64),
                "o_orderdate_us": hit["odate_us"].to_numpy(),
                "o_orderpriority": hit["pr"].to_numpy(),
            }
        )
        return out.sort_values(
            ["revenue_e4", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(limit)

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["revenue_e4", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(limit)
        return pa.Table.from_pandas(df, preserve_index=False)

    li_ds = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_lineitem, batch_format="pyarrow")
    return (
        orders_ds.union(li_ds)
        .repartition(16)  # coalesce tiny per-batch partials before the shuffle
        .groupby("kb")
        .map_groups(_join_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def event_gaps(sf_dir: str):
    """Per-user LAG window: microseconds since the user's previous
    event (-1 for their first). The window-function shape distinct
    from sessionization: the full per-row answer, not per-session
    aggregates. One user-bucket shuffle (adaptive mask), then a FULLY
    vectorized reducer — one lexsort over the whole bucket and one
    diff, no per-user Python loop.
    """
    mask = bucket_mask_for(sf_dir, "events")
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts"])

    def _bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "ub", pc.cast(pc.bit_wise_and(batch["user_id"], mask), pa.int32())
        )

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))  # user, then (ts, event_id)
        u, ts, eid = u[order], ts[order], eid[order]
        gap = np.empty(len(u), np.int64)
        if len(u):
            gap[0] = -1
            gap[1:] = ts[1:] - ts[:-1]
            gap[1:][u[1:] != u[:-1]] = -1  # first event of each user
        return pd.DataFrame({"event_id": eid, "user_id": u, "gap_us": gap})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_gaps, batch_format="pandas")
    )


def events_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP over events: (event_type, hour),
    (event_type), and grand total — in ONE corpus pass. Per-batch
    partials aggregate at the FINEST level only; the coarser levels
    are derived from the finest aggregate (tiny: types x hours rows)
    inside a single final task, so the corpus is never re-read per
    level and no Dataset fork re-executes the upstream. Sentinels:
    event_type 'ALL', hour_us -1.
    """
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])
    HOUR_US = 3_600_000_000
    mask = bucket_mask_for(sf_dir, "events")

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour_us"] = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // HOUR_US * HOUR_US
        )
        g = df.groupby(["event_type", "hour_us"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        g["hb"] = ((g["hour_us"].to_numpy(np.int64) // HOUR_US) & mask).astype(
            np.int32
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        # coarse hour-bucket combine (a (type, hour) key lives wholly in
        # one hb bucket) instead of the native per-key Aggregate
        return g.groupby(["event_type", "hour_us"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    finest = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("hb")
        .map_groups(_combine, batch_format="pandas")
    )

    def _levels(batch: pa.Table) -> pa.Table:
        f = batch.to_pandas()
        by_type = f.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        by_type["hour_us"] = np.int64(-1)
        total = pd.DataFrame(
            {
                "event_type": ["ALL"],
                "hour_us": np.array([-1], np.int64),
                "n": [f["n"].sum()],
                "sum_value": [f["sum_value"].sum()],
            }
        )
        out = pd.concat(
            [f[["event_type", "hour_us", "n", "sum_value"]], by_type, total],
            ignore_index=True,
        )
        out["n"] = out["n"].astype(np.int64)
        out["sum_value_c"] = np.round(out["sum_value"] * 100).astype(np.int64)
        return pa.Table.from_pandas(
            out[["event_type", "hour_us", "n", "sum_value_c"]], preserve_index=False
        )

    return finest.repartition(1).map_batches(
        _levels, batch_format="pyarrow", batch_size=None
    )


def funnel_conversion(sf_dir: str,
                      stages: tuple[str, str, str] = ("view", "click", "purchase")):
    """Ordered-sequence funnel over events: how many users had a view,
    then a click strictly after their FIRST view, then a purchase
    strictly after their first qualifying click. The sequential-pattern
    shape (MATCH_RECOGNIZE-lite) that sessionization and plain windows
    don't cover.

    Ordering is lexicographic (ts, event_id) — total and tie-safe
    without a combined int64 key (epoch_us * eid overflows). One
    adaptive user-bucket shuffle; per bucket the three stage scans are
    pandas groupby-first merges over a lexsorted frame (no per-user
    Python). Per-bucket counts are disjoint (a user lives in exactly
    one bucket), so the final combine is a 3-row sum.
    """
    mask = bucket_mask_for(sf_dir, "events")
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    s0, s1, s2 = stages

    def _bucket(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["event_type"], pa.array([s0, s1, s2])))
        return batch.append_column(
            "ub", pc.cast(pc.bit_wise_and(batch["user_id"], mask), pa.int32())
        )

    def _after(evs: pd.DataFrame, firsts: pd.DataFrame) -> pd.DataFrame:
        """Events strictly after each user's first (ts, eid) anchor;
        sorted order is preserved, so groupby.first() is the min."""
        m = evs.merge(firsts, on="user_id", how="inner", sort=False)
        keep = (m["ts"] > m["a_ts"]) | ((m["ts"] == m["a_ts"]) & (m["eid"] > m["a_eid"]))
        return m[keep]

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "ts": g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "eid": g["event_id"].to_numpy(),
                "et": g["event_type"].to_numpy(),
            }
        ).sort_values(["user_id", "ts", "eid"], kind="stable")
        v = (
            df[df["et"] == s0]
            .groupby("user_id", sort=False)[["ts", "eid"]]
            .first()
            .reset_index()
            .rename(columns={"ts": "a_ts", "eid": "a_eid"})
        )
        c_all = _after(df[df["et"] == s1], v)
        c = (
            c_all.groupby("user_id", sort=False)[["ts", "eid"]]
            .first()
            .reset_index()
            .rename(columns={"ts": "a_ts", "eid": "a_eid"})
        )
        p = _after(df[df["et"] == s2], c)
        return pd.DataFrame(
            {
                "stage": [s0, s1, s2],
                "n_users": np.array(
                    [len(v), len(c), p["user_id"].nunique()], np.int64
                ),
            }
        )

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("stage", sort=False)["n_users"].sum().reset_index()
        order = {s: i for i, s in enumerate(stages)}
        out = out.sort_values("stage", key=lambda s: s.map(order))
        return pa.Table.from_pandas(
            out.astype({"n_users": np.int64}), preserve_index=False
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_count, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#23"):
    """Correlated-scalar-subquery shape (TPC-H Q17): for each part of
    one brand, revenue from lineitems whose quantity is below 20% of
    that part's OWN average quantity. The per-group scalar (avg qty)
    and the probe rows co-locate in ONE partkey-bucket shuffle; the
    threshold test is exact integer arithmetic (qty < sum/(5*cnt) <=>
    5*qty*cnt < sum — quantities are integral), so no float-boundary
    ulp can flip a row between engines.

    The brand-filtered part side is a DIMENSION (1/25 of an already
    1/30-sized table), so it broadcasts via ``ray.put`` and lineitem is
    pre-filtered vectorized in the map — only the ~4% surviving probe
    rows enter the partkey-bucket shuffle (shuffling the full fact
    table cost 7.6 s at sf0.1; this shape runs in well under 1 s).

    Output: one row per qualifying part ``(l_partkey, n_small,
    small_revenue_c)``.
    """
    import ray

    mask = bucket_mask_for(sf_dir, "lineitem")
    li = read_table(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    pt = read_dim_pandas(sf_dir, "part", ["p_partkey", "p_brand"])
    pks = np.sort(pt.loc[pt["p_brand"] == brand, "p_partkey"].to_numpy(np.int64))
    pref = ray.put(pks)

    class _Filter:
        """Task-stage callable: broadcast partkey set, vectorized probe."""

        def __init__(self, ref) -> None:
            self.ref = ref
            self.pks = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.pks is None:
                self.pks = ray.get(self.ref)
            pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(self.pks, pk)
            idx[idx >= len(self.pks)] = 0
            keep = self.pks[idx] == pk if len(self.pks) else np.zeros(len(pk), bool)
            t = batch.filter(pa.array(keep))
            return pa.table(
                {
                    "pb": pc.cast(pc.bit_wise_and(t["l_partkey"], mask), pa.int32()),
                    "pk": t["l_partkey"],
                    "qty": pc.cast(t["l_quantity"], pa.int64()),
                    "price": t["l_extendedprice"],
                }
            )

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        # per-part scalar from ALL lineitems of the part (they co-locate
        # here by construction), then the exact-integer threshold probe
        agg = g.groupby("pk")["qty"].agg(["sum", "count"])
        m = g.merge(agg, left_on="pk", right_index=True, sort=False)
        small = m[5 * m["qty"].to_numpy(np.int64) * m["count"].to_numpy(np.int64)
                  < m["sum"].to_numpy(np.int64)]
        out = small.groupby("pk", sort=True).agg(
            n_small=("qty", "size"), rev=("price", "sum")
        ).reset_index()
        out["small_revenue_c"] = np.round(out["rev"] * 100).astype(np.int64)
        out = out.rename(columns={"pk": "l_partkey"})
        out["n_small"] = out["n_small"].astype(np.int64)
        return out[["l_partkey", "n_small", "small_revenue_c"]]

    return (
        li.map_batches(_Filter(pref), batch_format="pyarrow")
        .groupby("pb")
        .map_groups(_bucket, batch_format="pandas")
    )


def source_ntiles(sf_dir: str, k: int = 4):
    """NTILE window shape: every document's length quartile within its
    source (eval-set balancing / difficulty binning). DuckDB NTILE
    semantics exactly: ordered by (n_chars, doc_id), the first
    ``n mod k`` tiles get the extra row — implemented as exact integer
    boundaries over a vectorized per-source argsort, no per-row Python.
    One adaptive source-bucket shuffle of (doc_id, source, n_chars)
    rows. Output: ``doc_id, source, n_chars, tile``.
    """
    import hashlib

    mask = bucket_mask_for(sf_dir, "documents")
    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def _bucket(batch: pa.Table) -> pa.Table:
        sb = pa.array(
            [
                int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16) & mask
                for s in batch["source"].to_pylist()
            ],
            pa.int32(),
        )
        return batch.append_column("sb", sb)

    def _tiles(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, gg in g.groupby("source", sort=False):
            n = len(gg)
            order = np.lexsort((gg["doc_id"].to_numpy(), gg["n_chars"].to_numpy()))
            # NTILE: first (n % k) tiles have size n//k + 1
            base, extra = divmod(n, k)
            sizes = np.full(min(k, n), base, np.int64)
            sizes[:extra] += 1
            tile = np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64), sizes)
            df = gg.iloc[order].copy()
            df["tile"] = tile
            out.append(df)
        res = pd.concat(out, ignore_index=True)
        return res[["doc_id", "source", "n_chars", "tile"]]

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(_tiles, batch_format="pandas")
    )


def source_ntiles_sql(k: int = 4) -> str:
    """DuckDB mirror: NTILE over the identical (n_chars, doc_id) order."""
    return (
        f"SELECT doc_id, source, n_chars, CAST(ntile({k}) OVER ("
        "PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS tile "
        "FROM documents"
    )


def user_running_total(sf_dir: str):
    """Running-aggregate window: each event's cumulative value for its
    user in (ts, event_id) order (the account-balance / running-spend
    shape — per-row output, unlike sessionization's per-session rows).
    One adaptive user-bucket shuffle; the reducer is one lexsort + one
    segment-reset cumulative sum over the whole bucket, no per-user
    Python. Output: ``event_id, user_id, cum_value_c`` (int64 cents:
    per-row values are rounded to cents BEFORE accumulating so the
    running sum is integer-exact on both engines).
    """
    mask = bucket_mask_for(sf_dir, "events")
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def _bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "ub", pc.cast(pc.bit_wise_and(batch["user_id"], mask), pa.int32())
        )

    def _cum(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        val_c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, val_c = u[order], eid[order], val_c[order]
        cum = np.cumsum(val_c)
        # reset at user boundaries: subtract each segment's preceding
        # prefix (indexed by segment id — values may be negative, so no
        # monotone-accumulate shortcut)
        if len(u):
            new_seg = np.r_[False, u[1:] != u[:-1]]
            seg_id = np.cumsum(new_seg.astype(np.int64))
            starts = np.flatnonzero(np.r_[True, new_seg[1:]])
            offsets = np.r_[np.int64(0), cum[starts[1:] - 1]]
            cum = cum - offsets[seg_id]
        return pd.DataFrame({"event_id": eid, "user_id": u, "cum_value_c": cum})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_cum, batch_format="pandas")
    )


def user_running_total_sql() -> str:
    """DuckDB mirror: SUM OVER with the identical per-row cent rounding
    before accumulation."""
    return (
        "SELECT event_id, user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_c FROM events"
    )


def props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` column,
    pull the numeric ``k`` field, aggregate per event_type (n, sum,
    min, max). Extraction is one vectorized RE2 pass per batch
    (pyarrow ``extract_regex`` — zero Python per row, the pii/bpe
    pattern); the aggregate is per-batch partials into one tiny
    final combine (5 types). Oracle: DuckDB ``json_extract``.
    """
    ds = read_table(sf_dir, "events", ["event_type", "props"])

    def _partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "k": k.to_pandas(),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"), max_k=("max_k", "max"),
        )
        for c in ("n", "sum_k", "min_k", "max_k"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def props_stats_sql() -> str:
    """DuckDB mirror via json_extract."""
    return (
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
        "min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k, "
        "max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k "
        "FROM events GROUP BY event_type"
    )


def latest_user_event(sf_dir: str):
    """Arg-max row per group (the QUALIFY rn = 1 / latest-state shape,
    the CDC-compaction primitive): each user's most recent event by
    (ts, event_id). Per-batch partial arg-max first — only one
    candidate row per user per batch enters the shuffle — then the
    adaptive user-bucket reducer repeats the same vectorized pick.
    Output: ``user_id, event_id, ts_us, event_type``.
    """
    mask = bucket_mask_for(sf_dir, "events")
    ds = read_table(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (-df["event_id"].to_numpy(), -df["ts_us"].to_numpy(),
             df["user_id"].to_numpy())
        )
        d = df.iloc[order]
        return d[~d["user_id"].duplicated()]

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "ts_us": batch["ts"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        out = _pick(df).copy()
        out["ub"] = (out["user_id"].to_numpy(np.int64) & mask).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _pick(g)[["user_id", "event_id", "ts_us", "event_type"]]

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_final, batch_format="pandas")
    )


def latest_user_event_sql() -> str:
    """DuckDB mirror: ROW_NUMBER() = 1 over the identical descending
    (ts, event_id) order."""
    return (
        "SELECT user_id, event_id, ts_us, event_type FROM ("
        "SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
    )


def events_seasonality(sf_dir: str):
    """Calendar/date-part aggregate: event counts and value sums per
    (day-of-week, hour-of-day) cell — the seasonality-heatmap shape.
    Date parts come from integer epoch arithmetic (dow = (days + 4)
    % 7 matches DuckDB's Sunday=0 dayofweek; 1970-01-01 was a
    Thursday), so no timezone/locale library can disagree. Per-batch
    partials collapse to <= 168 cells; one single-block combine.
    Output: ``dow, hour, n, sum_value_c``.
    """
    ds = read_table(sf_dir, "events", ["ts", "value"])
    DAY_US = 86_400_000_000
    HOUR_US = 3_600_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        dow = ((ts // DAY_US) + 4) % 7
        hour = (ts % DAY_US) // HOUR_US
        df = pd.DataFrame(
            {"dow": dow, "hour": hour,
             "value": batch["value"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby(["dow", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(["dow", "hour"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        out["n"] = out["n"].astype(np.int64)
        out["sum_value_c"] = np.round(out["sum_value"] * 100).astype(np.int64)
        out = out.astype({"dow": np.int64, "hour": np.int64})
        return pa.Table.from_pandas(
            out[["dow", "hour", "n", "sum_value_c"]], preserve_index=False
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def events_seasonality_sql() -> str:
    """DuckDB mirror via dayofweek/hour (UTC timestamps, no tz)."""
    return (
        "SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, "
        "CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n, "
        "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c "
        "FROM events GROUP BY dow, hour"
    )


def nation_revenue(
    sf_dir: str,
    region: str = "ASIA",
    dim_broadcast_max_rows: int = DIM_BROADCAST_MAX_ROWS,
):
    """TPC-H Q5 shape — the multi-dimensional star join with a
    large-large core: revenue per customer nation, for lineitems whose
    SUPPLIER sits in the same nation as the order's customer, customers
    limited to one region (reference Q5 semantics minus the date
    window).

    Scale shape: the core all-to-all is ONE orderkey-bucket shuffle
    co-locating per-batch lineitem revenue partials with orders rows;
    nation/region prune to a 25-entry closure dict. Customer
    (custkey -> nationkey) and supplier (suppkey -> nationkey)
    broadcast once via ``ray.put`` + searchsorted probes while their
    parquet footers say they are small (``dim_broadcast_max_rows``);
    above that each is co-partitioned with its fact side on the foreign
    key (one extra bucketed shuffle per fact-sized dim) so the driver
    never materializes a table that scales with SF. Revenue enters the
    exact-integer domain per row (``cents(price) * (100 - bp(disc))``
    is int64), so partial sums are order-independent — no float drift
    against the oracle regardless of bucketing.
    """
    import ray

    mask = bucket_mask_for(sf_dir, "lineitem")

    nat = read_dim_pandas(sf_dir, "nation")
    reg = read_dim_pandas(sf_dir, "region")
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat_in = nat[nat["n_regionkey"] == rkey]
    allowed_nk = np.sort(nat_in["n_nationkey"].to_numpy().astype(np.int64))
    nk_to_name = dict(
        zip(nat_in["n_nationkey"].astype(int), nat_in["n_name"])
    )

    def _probe(keys: np.ndarray, vals: np.ndarray, q: np.ndarray):
        """sorted-key dimension lookup: (values, found-mask) — empty-safe."""
        if len(keys) == 0:
            return np.zeros(len(q), vals.dtype), np.zeros(len(q), bool)
        pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
        ok = keys[pos] == q
        return vals[pos], ok

    def _li_e4(batch: pa.Table) -> np.ndarray:
        price_c = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_bp = np.round(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return price_c * (100 - disc_bp)

    def _out_table(okey, nk, rev_e4, side) -> pa.Table:
        n = len(okey)
        return pa.Table.from_arrays(
            [
                pa.array((np.asarray(okey) & mask).astype(np.int32), pa.int32()),
                pa.array(np.asarray(okey, np.int64), pa.int64()),
                pa.array(np.asarray(nk, np.int64), pa.int64()),
                pa.array(np.asarray(rev_e4, np.int64), pa.int64()),
                pa.array(np.full(n, side, np.int8), pa.int8()),
            ],
            names=["kb", "okey", "nk", "rev_e4", "side"],
        )

    def _small_dim_ref(table: str, key: str, val: str):
        d = read_dim_pandas(sf_dir, table, [key, val]).sort_values(key)
        return ray.put((d[key].to_numpy(np.int64), d[val].to_numpy(np.int64)))

    def _copartition_attach(fact_ds, dim_table, dim_key, dim_val, fact_to_rows,
                            emit_side, preagg):
        """Bucketed dim-value attach for a FACT-SIZED dimension: dim rows
        (already pruned to allowed nations) and fact rows co-locate on
        ``dim_key & dmask``; each reducer probes its local sorted dim
        slice — the dimension never materializes on the driver and never
        broadcasts. Output rows are already in the (kb, okey, nk, rev_e4,
        side) orderkey-shuffle schema."""
        dmask = bucket_mask_for(sf_dir, dim_table)

        def _dim_rows(batch: pa.Table) -> pa.Table:
            k = batch[dim_key].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch[dim_val].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.isin(v, allowed_nk)
            k, v = k[keep], v[keep]
            return pa.Table.from_arrays(
                [
                    pa.array((k & dmask).astype(np.int32), pa.int32()),
                    pa.array(k, pa.int64()),
                    pa.array(np.zeros(len(k), np.int8), pa.int8()),
                    pa.array(v, pa.int64()),
                    pa.array(np.zeros(len(k), np.int64), pa.int64()),
                    pa.array(np.zeros(len(k), np.int64), pa.int64()),
                ],
                names=["db", "dkey", "dside", "nk", "okey", "rev_e4"],
            )

        def _fact_rows(batch: pa.Table) -> pa.Table:
            dkey, okey, rev = fact_to_rows(batch)
            n = len(dkey)
            return pa.Table.from_arrays(
                [
                    pa.array((dkey & dmask).astype(np.int32), pa.int32()),
                    pa.array(dkey, pa.int64()),
                    pa.array(np.ones(n, np.int8), pa.int8()),
                    pa.array(np.zeros(n, np.int64), pa.int64()),
                    pa.array(okey, pa.int64()),
                    pa.array(rev, pa.int64()),
                ],
                names=["db", "dkey", "dside", "nk", "okey", "rev_e4"],
            )

        def _attach_bucket(g: pd.DataFrame) -> pa.Table:
            d = g[g["dside"] == 0].sort_values("dkey")
            keys = d["dkey"].to_numpy()
            vals = d["nk"].to_numpy()
            f = g[g["dside"] == 1]
            nk, ok = _probe(keys, vals, f["dkey"].to_numpy())
            f, nk = f[ok], nk[ok]
            if preagg:
                df = pd.DataFrame(
                    {"okey": f["okey"].to_numpy(), "nk": nk,
                     "rev_e4": f["rev_e4"].to_numpy()}
                )
                gg = df.groupby(["okey", "nk"], as_index=False)["rev_e4"].sum()
                return _out_table(
                    gg["okey"].to_numpy(), gg["nk"].to_numpy(),
                    gg["rev_e4"].to_numpy(), emit_side,
                )
            return _out_table(
                f["okey"].to_numpy(), nk, f["rev_e4"].to_numpy(), emit_side
            )

        dim_ds = read_table(sf_dir, dim_table, [dim_key, dim_val]).map_batches(
            _dim_rows, batch_format="pyarrow"
        )
        return (
            dim_ds.union(fact_ds.map_batches(_fact_rows, batch_format="pyarrow"))
            .groupby("db")
            .map_groups(_attach_bucket, batch_format="pandas")
        )

    # --- orders side: attach customer nation ---------------------------
    orders_raw = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    if table_rows(sf_dir, "customer") <= dim_broadcast_max_rows:
        cref = _small_dim_ref("customer", "c_custkey", "c_nationkey")

        def _orders(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(cref)
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            nk, ok = _probe(
                keys, vals, batch["o_custkey"].to_numpy(zero_copy_only=False)
            )
            keep = ok & np.isin(nk, allowed_nk)
            okey, nk = okey[keep], nk[keep]
            return _out_table(okey, nk, np.zeros(len(okey), np.int64), 0)

        orders_ds = orders_raw.map_batches(_orders, batch_format="pyarrow")
    else:
        def _orders_to_rows(batch: pa.Table):
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return ck, okey, np.zeros(len(ck), np.int64)

        orders_ds = _copartition_attach(
            orders_raw, "customer", "c_custkey", "c_nationkey",
            _orders_to_rows, emit_side=0, preagg=False,
        )

    # --- lineitem side: attach supplier nation -------------------------
    li_raw = read_table(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if table_rows(sf_dir, "supplier") <= dim_broadcast_max_rows:
        sref = _small_dim_ref("supplier", "s_suppkey", "s_nationkey")

        def _lineitem(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(sref)
            nk, ok = _probe(
                keys, vals, batch["l_suppkey"].to_numpy(zero_copy_only=False)
            )
            keep = ok & np.isin(nk, allowed_nk)
            df = pd.DataFrame(
                {
                    "okey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                    "nk": nk[keep],
                    "rev_e4": _li_e4(batch)[keep],
                }
            )
            g = df.groupby(["okey", "nk"], as_index=False)["rev_e4"].sum()
            return _out_table(
                g["okey"].to_numpy(), g["nk"].to_numpy(), g["rev_e4"].to_numpy(), 1
            )

        li_ds = li_raw.map_batches(_lineitem, batch_format="pyarrow")
    else:
        def _li_to_rows(batch: pa.Table):
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            return sk, okey, _li_e4(batch)

        li_ds = _copartition_attach(
            li_raw, "supplier", "s_suppkey", "s_nationkey",
            _li_to_rows, emit_side=1, preagg=True,
        )

    def _join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        m = li.merge(
            o[["okey", "nk"]], on=["okey", "nk"], how="inner"
        )  # supplier nation == customer nation, co-located by okey
        out = m.groupby("nk", as_index=False)["rev_e4"].sum()
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("nk", as_index=False)["rev_e4"].sum()
        return pd.DataFrame(
            {
                "n_name": out["nk"].map(nk_to_name),
                "revenue_e4": out["rev_e4"].astype(np.int64),
            }
        )

    return (
        orders_ds.union(li_ds)
        .repartition(16)  # coalesce tiny key partials (see order_priority_check)
        .groupby("kb")
        .map_groups(_join_bucket, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def nation_revenue_sql(region: str = "ASIA") -> str:
    """DuckDB mirror of :func:`nation_revenue` in the same exact-integer
    revenue domain (cents x (100 - discount basis points))."""
    return (
        "SELECT n_name, CAST(sum("
        "CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
        "AS revenue_e4 "
        "FROM lineitem, orders, customer, supplier, nation, region "
        "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        f"AND r_name = '{region}' GROUP BY n_name"
    )


def user_moving_average(sf_dir: str, window: int = 4):
    """Frame-based window aggregate (ROWS BETWEEN k PRECEDING AND
    CURRENT ROW): per-user moving sum/count of the last ``window``
    event values ordered by (ts, event_id) — the rolling-metric shape
    the suite's other window queries (LAG gaps, running totals) don't
    cover.

    One user-bucket shuffle; the per-bucket reducer lexsorts its users'
    rows once and computes every window with two prefix-sum gathers
    (no per-row Python, no per-user groups). Values enter the int64
    cents domain per row so sums are order-independent and exact.
    Output: ``event_id, w_sum_c, w_n`` (sum and count of the frame —
    integer-exact; the average is their ratio, left unrounded by
    design: float division is the one ulp-unstable step).
    """
    mask = bucket_mask_for(sf_dir, "events")
    k = window - 1

    def _prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array((uid & mask).astype(np.int32), pa.int32()),
                pa.array(uid, pa.int64()),
                batch["ts"].cast(pa.int64()),
                batch["event_id"],
                pa.array(
                    np.round(
                        batch["value"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    pa.int64(),
                ),
            ],
            names=["ub", "user_id", "ts_us", "event_id", "value_c"],
        )

    def _windows(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        v = g["value_c"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid, v = uid[order], eid[order], v[order]
        n = len(uid)
        new_seg = np.empty(n, bool)
        new_seg[0] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        seg_id = np.cumsum(new_seg) - 1
        seg_first = np.flatnonzero(new_seg)[seg_id]
        i = np.arange(n)
        lo = np.maximum(i - k, seg_first)
        csum = np.concatenate([[0], np.cumsum(v)])
        return pd.DataFrame(
            {
                "event_id": eid,
                "w_sum_c": (csum[i + 1] - csum[lo]).astype(np.int64),
                "w_n": (i - lo + 1).astype(np.int64),
            }
        )

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_windows, batch_format="pandas")
    )


def user_moving_average_sql(window: int = 4) -> str:
    """DuckDB mirror: SUM/COUNT OVER a ROWS frame in the cents domain."""
    return (
        "SELECT event_id, CAST(sum(value_c) OVER w AS BIGINT) AS w_sum_c, "
        "CAST(count(*) OVER w AS BIGINT) AS w_n "
        "FROM (SELECT event_id, user_id, ts, "
        "CAST(round(value * 100) AS BIGINT) AS value_c FROM events) "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)"
    )


def event_type_transitions(sf_dir: str):
    """Per-user event-sequence bigrams (the Markov-transition-matrix /
    clickstream-mining shape): count (previous event_type -> event_type)
    transitions within each user's (ts, event_id)-ordered stream.

    One user-bucket shuffle; the reducer lexsorts once, pairs each row
    with its predecessor by a shifted compare (no per-user Python
    groups), and pre-aggregates to <= n_types^2 partial rows per
    bucket; a single-group final combine sums the ~25 cells.
    """
    mask = bucket_mask_for(sf_dir, "events")

    def _prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array((uid & mask).astype(np.int32), pa.int32()),
                pa.array(uid, pa.int64()),
                batch["ts"].cast(pa.int64()),
                batch["event_id"],
                batch["event_type"],
            ],
            names=["ub", "user_id", "ts_us", "event_id", "event_type"],
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = g["event_type"].to_numpy()[order]
        same = np.empty(len(uid), bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        prev = np.roll(et, 1)
        df = pd.DataFrame({"prev_type": prev[same], "event_type": et[same]})
        out = df.groupby(["prev_type", "event_type"], as_index=False).size()
        out.columns = ["prev_type", "event_type", "n"]
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["prev_type", "event_type"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out[["prev_type", "event_type", "n"]]

    ds = read_table(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_pairs, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def event_type_transitions_sql() -> str:
    """DuckDB mirror via LAG OVER the same (ts, event_id) order."""
    return (
        "SELECT prev_type, event_type, count(*) AS n FROM ("
        "SELECT lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev_type, event_type FROM events) "
        "WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
    )


def value_histogram(sf_dir: str, bin_width_c: int = 2500):
    """Equal-width histogram of event values (the distribution-profiling
    shape): bin id, row count and value mass per bin, binned in the
    exact int64 cents domain (``value_c // bin_width_c``) so bin edges
    cannot drift between engines. Per-batch partials collapse to the
    ~20 occupied bins; one single-block combine.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        v_c = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"bin": v_c // bin_width_c, "value_c": v_c})
        g = df.groupby("bin", as_index=False).agg(
            n=("value_c", "size"), sum_value_c=("value_c", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("bin", as_index=False).agg(
            n=("n", "sum"), sum_value_c=("sum_value_c", "sum")
        )
        out = out.astype({"bin": np.int64, "n": np.int64, "sum_value_c": np.int64})
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = read_table(sf_dir, "events", ["value"])
    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def value_histogram_sql(bin_width_c: int = 2500) -> str:
    """DuckDB mirror in the same integer cents domain."""
    return (
        "SELECT CAST(round(value * 100) AS BIGINT) // "
        f"{bin_width_c} AS bin, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_value_c FROM events GROUP BY bin"
    )


def user_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics shape): users are
    cohorted by their first-activity day; each cell counts distinct
    users of cohort ``cohort_day`` active ``day_offset`` days later.

    Scale shape: ONE user-bucket shuffle co-locates each user's whole
    history, so the per-bucket reducer computes first-day AND the
    distinct active-day set locally; users are unique to their bucket,
    so per-(cohort, offset) counts are ADDITIVE partials — the final
    combine sums ~|days|^2 tiny cells, never user rows. Days come from
    integer epoch floor-division (no calendar library involved).
    """
    mask = bucket_mask_for(sf_dir, "events")
    DAY_US = 86_400_000_000

    def _prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        )
        df = pd.DataFrame({"ub": (uid & mask).astype(np.int32),
                           "user_id": uid, "day": day})
        # per-batch distinct (user, day): the reducer only needs day sets
        df = df.drop_duplicates(["user_id", "day"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def _cohort(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id", sort=False)["day"].transform("min")
        out = pd.DataFrame(
            {"cohort_day": first, "day_offset": g["day"] - first}
        ).groupby(["cohort_day", "day_offset"], as_index=False).size()
        out.columns = ["cohort_day", "day_offset", "n_users"]
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_day", "day_offset"], as_index=False)[
            "n_users"
        ].sum()
        return out.astype(
            {"cohort_day": np.int64, "day_offset": np.int64, "n_users": np.int64}
        )

    ds = read_table(sf_dir, "events", ["user_id", "ts"])
    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_cohort, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def user_retention_sql() -> str:
    """DuckDB mirror via the same integer epoch-day arithmetic."""
    return (
        "WITH d AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id) "
        "SELECT cohort_day, day - cohort_day AS day_offset, "
        "count(*) AS n_users FROM d JOIN f USING (user_id) "
        "GROUP BY cohort_day, day_offset"
    )


def promo_revenue(
    sf_dir: str, dim_broadcast_max_rows: int = DIM_BROADCAST_MAX_ROWS
):
    """TPC-H Q14 shape — the revenue-share ratio: per ship year, the
    fraction of revenue from PROMO-type parts.

    Scale shape: zero shuffle while the part footer says the dimension
    is small (``dim_broadcast_max_rows``): the PROMO partkey SET
    broadcasts once and one streaming lineitem pass emits per-year
    integer partials. Above the threshold part is fact-sized (sf100 ~
    20M rows), so lineitem pre-aggregates to (partkey, year) partials
    per batch and ONE partkey-bucket shuffle co-locates them with the
    PROMO keys — the driver never reads the dimension. The final
    combine runs in PYTHON ints because ``1e6 * promo_e4`` exceeds
    int64 at any real scale (DuckDB's side is HUGEINT for the same
    reason) — the share itself is < 1e6 and round-trips exactly.
    """
    import ray

    def _yr_e4(batch: pa.Table):
        yr = (
            batch["l_shipdate"]
            .to_pandas()
            .dt.year.to_numpy()
            .astype(np.int64)
        )
        e4 = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64) * (
            100
            - np.round(
                batch["l_discount"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
        )
        return yr, e4

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("yr", as_index=False).agg(
            promo_e4=("promo_e4", "sum"), total_e4=("total_e4", "sum")
        )
        share = [
            int((1_000_000 * int(p)) // int(t)) if t else 0
            for p, t in zip(g["promo_e4"], g["total_e4"])
        ]  # python ints: 1e6 * promo_e4 overflows int64
        out = pd.DataFrame(
            {
                "yr": g["yr"].astype(np.int64),
                "promo_e4": g["promo_e4"].astype(np.int64),
                "total_e4": g["total_e4"].astype(np.int64),
                "promo_share_e6": np.asarray(share, np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = read_table(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    if table_rows(sf_dir, "part") <= dim_broadcast_max_rows:
        pt = read_dim_pandas(sf_dir, "part", ["p_partkey", "p_type"])
        promo = np.sort(
            pt.loc[pt["p_type"] == "PROMO", "p_partkey"].to_numpy(np.int64)
        )
        pref = ray.put(promo)

        def _partial(batch: pa.Table) -> pa.Table:
            keys = ray.get(pref)
            yr, e4 = _yr_e4(batch)
            pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
            is_promo = sorted_key_lookup(keys, pk)
            df = pd.DataFrame(
                {"yr": yr, "e4": e4, "promo_e4": np.where(is_promo, e4, 0)}
            )
            g = df.groupby("yr", as_index=False).agg(
                promo_e4=("promo_e4", "sum"), total_e4=("e4", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
    else:
        # fact-sized part: co-partition PROMO keys with per-(partkey,
        # year) lineitem partials on partkey — no driver dim read.
        pmask = bucket_mask_for(sf_dir, "part")

        def _promo_rows(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch["p_type"], "PROMO")
            pk = (
                batch["p_partkey"].filter(keep).to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            n = len(pk)
            return pa.Table.from_arrays(
                [
                    pa.array((pk & pmask).astype(np.int32), pa.int32()),
                    pa.array(pk, pa.int64()),
                    pa.array(np.zeros(n, np.int8), pa.int8()),
                    pa.array(np.zeros(n, np.int64), pa.int64()),
                    pa.array(np.zeros(n, np.int64), pa.int64()),
                ],
                names=["pb", "pkey", "side", "yr", "e4"],
            )

        def _li_rows(batch: pa.Table) -> pa.Table:
            yr, e4 = _yr_e4(batch)
            pk = (
                batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            df = pd.DataFrame({"pkey": pk, "yr": yr, "e4": e4})
            g = df.groupby(["pkey", "yr"], as_index=False)["e4"].sum()
            n = len(g)
            return pa.Table.from_arrays(
                [
                    pa.array(
                        (g["pkey"].to_numpy() & pmask).astype(np.int32), pa.int32()
                    ),
                    pa.array(g["pkey"].to_numpy(np.int64), pa.int64()),
                    pa.array(np.ones(n, np.int8), pa.int8()),
                    pa.array(g["yr"].to_numpy(np.int64), pa.int64()),
                    pa.array(g["e4"].to_numpy(np.int64), pa.int64()),
                ],
                names=["pb", "pkey", "side", "yr", "e4"],
            )

        def _flag_bucket(g: pd.DataFrame) -> pa.Table:
            keys = np.sort(g.loc[g["side"] == 0, "pkey"].to_numpy())
            li = g[g["side"] == 1]
            is_promo = sorted_key_lookup(keys, li["pkey"].to_numpy())
            df = pd.DataFrame(
                {
                    "yr": li["yr"].to_numpy(),
                    "e4": li["e4"].to_numpy(),
                    "promo_e4": np.where(is_promo, li["e4"].to_numpy(), 0),
                }
            )
            gg = df.groupby("yr", as_index=False).agg(
                promo_e4=("promo_e4", "sum"), total_e4=("e4", "sum")
            )
            return pa.Table.from_pandas(gg, preserve_index=False)

        part_ds = read_table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            _promo_rows, batch_format="pyarrow"
        )
        partials = (
            part_ds.union(ds.map_batches(_li_rows, batch_format="pyarrow",
                                         batch_size=65536))
            .groupby("pb")
            .map_groups(_flag_bucket, batch_format="pandas")
        )

    return (
        partials.repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def promo_revenue_sql() -> str:
    """DuckDB mirror (HUGEINT sums; share floor-divided then cast)."""
    return (
        "WITH li AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS e4, p_type "
        "FROM lineitem JOIN part ON l_partkey = p_partkey) "
        "SELECT yr, CAST(sum(CASE WHEN p_type = 'PROMO' THEN e4 ELSE 0 END) "
        "AS BIGINT) AS promo_e4, CAST(sum(e4) AS BIGINT) AS total_e4, "
        "CAST((1000000 * sum(CASE WHEN p_type = 'PROMO' THEN e4 ELSE 0 END)) "
        "// sum(e4) AS BIGINT) AS promo_share_e6 FROM li GROUP BY yr"
    )


def source_rank(sf_dir: str):
    """RANK / DENSE_RANK window shapes (the remaining rank-family
    class beside NTILE, ROW_NUMBER-argmax and running totals): each
    document's rank of ``n_chars`` within its source — ties share a
    rank and leave gaps (RANK) or don't (DENSE_RANK) — plus the source
    row count.

    Scale shape: one partition-key shuffle (``groupby(source)`` — the
    rank's own partition, inherently co-located); inside each reducer
    the ranks come from ONE argsort + searchsorted against the sorted
    values (no per-row Python). Sources are the natural coarse key
    here; a skewed source is the operator's semantic unit, same as the
    SQL window.
    """

    def _ranks(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy(np.int64)
        sv = np.sort(v)
        rnk = np.searchsorted(sv, v, side="left") + 1
        dense = np.searchsorted(np.unique(sv), v, side="left") + 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "source": g["source"].to_numpy(),
                "rnk": rnk.astype(np.int64),
                "dense_rnk": dense.astype(np.int64),
                "n_src": np.full(len(v), len(v), np.int64),
            }
        )

    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return ds.groupby("source").map_groups(_ranks, batch_format="pandas")


def source_rank_sql() -> str:
    """DuckDB mirror via rank()/dense_rank() windows."""
    return (
        "SELECT doc_id, source, "
        "CAST(rank() OVER w AS BIGINT) AS rnk, "
        "CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk, "
        "CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src "
        "FROM documents WINDOW w AS (PARTITION BY source ORDER BY n_chars)"
    )


def power_users(sf_dir: str, min_types: int = 4):
    """Grouped-distinct-count HAVING gate (the "power users" shape):
    users who performed at least ``min_types`` DISTINCT event types,
    with their distinct-type and total event counts.

    Scale shape: per-batch rows collapse to distinct (user, type)
    pairs plus per-user count partials BEFORE the one user-bucket
    shuffle; reducers own whole users (distinct-type counts are exact
    locally) and apply the HAVING gate before anything returns.
    """
    mask = bucket_mask_for(sf_dir, "events")

    def _prep(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        g.columns = ["user_id", "event_type", "n"]
        g["ub"] = (g["user_id"].to_numpy() & mask).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _gate(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("user_id").agg(
            n_types=("event_type", "nunique"), n_events=("n", "sum")
        )
        out = per[per["n_types"] >= min_types].reset_index()
        return out.astype(
            {"user_id": np.int64, "n_types": np.int64, "n_events": np.int64}
        )

    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_gate, batch_format="pandas")
    )


def power_users_sql(min_types: int = 4) -> str:
    """DuckDB mirror via HAVING count(DISTINCT ...)."""
    return (
        "SELECT user_id, count(DISTINCT event_type) AS n_types, "
        "count(*) AS n_events FROM events GROUP BY user_id "
        f"HAVING count(DISTINCT event_type) >= {min_types}"
    )


def source_mad(sf_dir: str):
    """Robust dispersion per source — median and median absolute
    deviation of document lengths — kept EXACT across engines by
    working in doubled integer domains: ``med_x2 = 2 * median``
    (always an integer: interpolated medians of ints are x.0 or x.5)
    and ``mad_x4 = 4 * MAD`` (deviations |2x - med_x2| live in the 2x
    domain, their median doubles once more). DuckDB's
    quantile_cont-based median reproduces both after CAST.

    Scale shape: one partition-key shuffle (``groupby(source)``), the
    medians via two partitions per reducer — no global sort. The per-
    group value VECTOR must fit a reducer, the standard constraint for
    exact (non-sketch) medians; hll/doc_length_quantiles cover the
    mergeable-sketch and histogram alternatives.
    """

    def _med2(v: np.ndarray) -> int:
        n = len(v)
        if n % 2:
            return 2 * int(np.partition(v, n // 2)[n // 2])
        b = np.partition(v, (n // 2 - 1, n // 2))
        return int(b[n // 2 - 1]) + int(b[n // 2])

    def _mad(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_chars"].to_numpy(np.int64)
        med2 = _med2(v)
        mad4 = _med2(np.abs(2 * v - med2))
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n": np.asarray([len(v)], np.int64),
                "med_x2": np.asarray([med2], np.int64),
                "mad_x4": np.asarray([mad4], np.int64),
            }
        )

    ds = read_table(sf_dir, "documents", ["source", "n_chars"])
    return ds.groupby("source").map_groups(_mad, batch_format="pandas")


def source_mad_sql() -> str:
    """DuckDB mirror in the same doubled-integer domains."""
    return (
        "WITH m AS (SELECT source, CAST(2 * median(n_chars) AS BIGINT) "
        "AS med_x2 FROM documents GROUP BY source) "
        "SELECT d.source, count(*) AS n, any_value(m.med_x2) AS med_x2, "
        "CAST(2 * median(abs(2 * d.n_chars - m.med_x2)) AS BIGINT) AS mad_x4 "
        "FROM documents d JOIN m ON d.source = m.source GROUP BY d.source"
    )


def rolling_active_users(sf_dir: str, window_days: int = 7):
    """Rolling DISTINCT count (the DAU/WAU engagement shape): for every
    observed activity day, the distinct users active THAT day (dau) and
    within the trailing ``window_days`` window (wau). Rolling distinct
    is not frame-decomposable — a user active twice in the window must
    count once — so no windowed SUM can express it.

    Scale shape: per-batch rows collapse to distinct (user, day) pairs;
    ONE user-bucket shuffle gives each reducer whole users, where a
    sorted-day searchsorted probe against the (broadcast, tiny) set of
    observed days marks each user's covered windows once — users never
    double-count because they never straddle buckets. Reducers emit
    (day, dau, wau) partials that are ADDITIVE by construction; a
    single-block combine sums them. The observed-day set comes from a
    streaming distinct pass that collapses to per-batch partials before
    the driver sees ~|days| values.
    """
    import ray

    mask = bucket_mask_for(sf_dir, "events")
    DAY_US = 86_400_000_000

    def _days_partial(batch: pa.Table) -> pa.Table:
        day = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        return pa.Table.from_pydict({"day": np.unique(day)})

    observed = np.array(
        sorted(
            set(
                read_table(sf_dir, "events", ["ts"])
                .map_batches(_days_partial, batch_format="pyarrow")
                .to_pandas()["day"]
            )
        ),
        dtype=np.int64,
    )
    oref = ray.put(observed)

    def _prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        df["ub"] = (df["user_id"].to_numpy() & mask).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _cover(g: pd.DataFrame) -> pd.DataFrame:
        W = ray.get(oref)
        g = g.drop_duplicates(["user_id", "day"])
        dau = g.groupby("day").size()
        wau = np.zeros(len(W), np.int64)
        for _, days in g.groupby("user_id", sort=False)["day"]:
            d = np.sort(days.to_numpy(np.int64))
            # user counts for window-day w iff some active day sits in
            # [w - window + 1, w]
            idx = np.searchsorted(d, W - (window_days - 1), side="left")
            hit = (idx < len(d)) & (d[np.minimum(idx, len(d) - 1)] <= W)
            wau += hit
        out = pd.DataFrame({"day": W, "wau": wau})
        out["dau"] = out["day"].map(dau).fillna(0).astype(np.int64)
        out["z"] = 0
        return out[out["wau"] > 0][["day", "dau", "wau", "z"]]

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("day", as_index=False)[["dau", "wau"]].sum()
        return out.astype({"day": np.int64, "dau": np.int64, "wau": np.int64})

    ds = read_table(sf_dir, "events", ["user_id", "ts"])
    return (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(_cover, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def rolling_active_users_sql(window_days: int = 7) -> str:
    """DuckDB mirror via a range join over distinct (user, day) pairs."""
    return (
        "WITH d AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "w AS (SELECT DISTINCT day FROM d) "
        "SELECT w.day, count(DISTINCT CASE WHEN d.day = w.day "
        "THEN d.user_id END) AS dau, "
        "count(DISTINCT d.user_id) AS wau FROM w JOIN d "
        f"ON d.day BETWEEN w.day - {window_days - 1} AND w.day "
        "GROUP BY w.day"
    )
