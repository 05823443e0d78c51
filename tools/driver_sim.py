"""Driver-contract simulator: mirrors what the graft driver does.

Init Ray -> entry() smoke -> run each queries()[name](sf_dir) at sf0.01
-> compare to oracle_sql()[name] via DuckDB with row-count + schema +
order-insensitive value hash.  Columns are sorted by NAME before
hashing (the driver does this), so column-name mismatches between the
Ray result and the SQL fail here exactly as they fail there.  A dtype
gate catches int64-vs-float64 divergence (DuckDB HUGEINT window sums
arrive as float64 in pandas -- the round-2 seq_packing failure mode).

Usage: python tools/driver_sim.py [query ...]   (no args = all oracled)
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    if not isinstance(res, pd.DataFrame):
        raise TypeError(f"unexpected result type {type(res)}")
    return res


def _canon(df):
    """Sort columns by name, rows by every column; stable dtypes."""
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def _value_hash(df):
    import numpy as np

    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            # round to 9 significant-ish digits the way a tolerant
            # driver would; exact engines should not emit floats anyway
            vals = ["%.9g" % v for v in col.to_numpy()]
        else:
            vals = [str(v) for v in col.to_numpy()]
        h.update(("\x00".join(vals) + "\x01").encode())
    return h.hexdigest()


def _dtype_kind(dt):
    import numpy as np

    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    return "obj"


def main(argv):
    import duckdb
    import ray

    os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("SIM_CPUS", "16")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # entry smoke
    t0 = time.time()
    res = entrymod.entry()
    df = _to_pandas(res)
    print(f"entry: {len(df)} rows, {len(df.columns)} cols, {time.time()-t0:.1f}s")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = argv or [n for n in queries if n in oracles]
    fails = []
    for n in names:
        if n not in queries:
            print(f"{n}: NO SUCH QUERY")
            fails.append(n)
            continue
        t0 = time.time()
        try:
            got = _canon(_to_pandas(queries[n](SF_DIR)))
        except Exception as e:  # noqa: BLE001
            print(f"{n}: ENGINE ERROR {type(e).__name__}: {e}")
            fails.append(n)
            continue
        dt = time.time() - t0
        if n not in oracles:
            print(f"{n}: no_oracle rows={len(got)} ({dt:.1f}s)")
            continue
        try:
            want = _canon(con.sql(oracles[n]).df())
        except Exception as e:  # noqa: BLE001
            print(f"{n}: ORACLE ERROR {type(e).__name__}: {e}")
            fails.append(n)
            continue
        rows = len(got) == len(want)
        schema = list(got.columns) == list(want.columns)
        dtypes = schema and all(
            _dtype_kind(got[c].dtype) == _dtype_kind(want[c].dtype)
            for c in got.columns
        )
        hmatch = (
            rows and schema and _value_hash(got) == _value_hash(want)
        )
        ok = rows and schema and dtypes and hmatch
        status = "PASS" if ok else "FAIL"
        detail = ""
        if not ok:
            fails.append(n)
            if not rows:
                detail = f" rows {len(got)} vs {len(want)}"
            elif not schema:
                detail = f" schema {list(got.columns)} vs {list(want.columns)}"
            elif not dtypes:
                detail = " dtype " + str(
                    [
                        (c, str(got[c].dtype), str(want[c].dtype))
                        for c in got.columns
                        if _dtype_kind(got[c].dtype) != _dtype_kind(want[c].dtype)
                    ]
                )
            else:
                diff = got.compare(want) if got.shape == want.shape else None
                detail = f" hash ({len(diff) if diff is not None else '?'} differing rows)"
        print(f"{n}: {status} rows={len(got)} ({dt:.1f}s){detail}")
    print(f"FAILS: {fails if fails else 'none'} ({len(names)} checked)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
