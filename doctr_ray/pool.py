"""Shared actor-pool sizing for map_batches stages.

One policy for every stateful stage in the engine (OCR workers, KIE,
minhash signers, ANN scorers): a FIXED pool with CPU headroom. Two
failure modes bound it — a pool reserving every CPU starves the task
stages and deadlocks the stream (observed at num_cpus=4), and an
autoscaling (1, N) pool ramps up so slowly it doubles the wall time of
a 30 s job (observed at num_cpus=32: fixed 22 -> 18.5 s, autoscale
(1,22) -> 40 s).
"""

from __future__ import annotations


def default_pool() -> int:
    """Fixed actor-pool size: all CPUs minus a feed reserve.

    The reserve is a near-constant CPU COUNT (max(2, n/8)) rather than
    a fraction: the non-pool work (read, corpus building, output
    collection) needs roughly the same few cores at any cluster size,
    so reserving a fraction wastes pool slots on big clusters and
    reserving too little starves the feed on small ones. Measured at
    sf0.1 copies=4: 32 cpus pool 24 -> 16.2 s, pool 28 -> 14.8 s;
    8 cpus pool 6 -> 42.2 s, pool 7 -> 47.7 s (feeder starved).
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        n = 4
    return max(1, n - max(2, n // 8))


def half_pool() -> int:
    """Half the default pool — for pipelines running two actor stages."""
    return max(1, default_pool() // 2)


def adaptive_buckets(n_rows: int, rows_per_bucket: int = 50_000,
                     min_rows: int = 2_000) -> int:
    """Reducer bucket count for coarse-keyed ``groupby().map_groups``:
    scales with DATA at the top (~``rows_per_bucket`` rows per reducer,
    so one bucket never concentrates an unbounded slice at 100x scale)
    and with the CLUSTER at the bottom (>= ~2 buckets per CPU so the
    reduce phase isn't parallelism-starved on mid-size tables — a 100k
    row table at 50k rows/bucket is 3 reducers on a 32-cpu node,
    measured 7-10 s vs 2.7 s at 64). ``min_rows`` keeps the floor from
    fragmenting small tables into near-empty ~1ms tasks (the CLAUDE.md
    landmine the pure data-sized count was introduced to fix)."""
    data_want = n_rows // rows_per_bucket + 1
    try:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0))
            if ray.is_initialized()
            else 0
        ) or 8
    except Exception:
        cpus = 8
    floor = min(2 * cpus, max(1, n_rows // min_rows))
    return max(1, data_want, floor)


def adaptive_bucket_mask(n_rows: int, rows_per_bucket: int = 50_000,
                         min_rows: int = 2_000) -> int:
    """``adaptive_buckets`` rounded up to a power of two, minus one —
    a bit mask so the hot bucketing path stays one ``bit_wise_and``."""
    import math

    want = adaptive_buckets(n_rows, rows_per_bucket, min_rows)
    return (1 << math.ceil(math.log2(want))) - 1 if want > 1 else 0
