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
    """Fixed actor-pool size: 3/4 of cluster CPUs, never the whole node.

    The fraction is constant across cluster sizes — a varying fraction
    skews N-vs-4N scaling measurements.
    """
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        n = 4
    return max(1, min(n - 1, (n * 3) // 4))


def half_pool() -> int:
    """Half the default pool — for pipelines running two actor stages."""
    return max(1, default_pool() // 2)
