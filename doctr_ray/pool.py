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
