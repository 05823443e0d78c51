"""Model-weights plumbing: serialized blobs loaded ONCE per actor.

The stand-in for torch checkpoint loading (reference
models/utils/pytorch.py:41 ``load_pretrained_params``): weight arrays
travel as ``.npz`` blobs addressed by a filesystem path (shared FS /
per-node cache on a real cluster) or as a Ray object-store ref
(``ray.put`` the dict once on the driver; every actor ``ray.get``s it
zero-copy from its node's plasma store — the broadcast pattern for
weights too big to ship per task). Actors call :func:`load_weights` in
``__init__`` only; the per-process :data:`LOAD_COUNT` makes the
once-per-actor contract testable. Swapping real torch weights in on a
cluster is the same constructor kwarg with a different blob.
"""

from __future__ import annotations

import numpy as np

#: per-process count of blob loads — a worker that re-loads per batch
#: (the classic perf bug this module exists to prevent) shows up as a
#: count > 1 per actor in tests
LOAD_COUNT = 0


def save_weights(path: str, arrays: dict[str, np.ndarray]) -> None:
    """Serialize named arrays to an ``.npz`` checkpoint blob."""
    np.savez(path, **arrays)


def load_weights(src) -> dict[str, np.ndarray]:
    """Checkpoint source -> dict of named arrays.

    ``src`` may be a filesystem path (str), a Ray ``ObjectRef`` (the
    driver did ``ray.put(arrays)`` once), or an already-materialized
    dict (tests / local mode). Counts every load in :data:`LOAD_COUNT`.
    """
    global LOAD_COUNT
    LOAD_COUNT += 1
    if isinstance(src, dict):
        return src
    try:
        import ray

        if isinstance(src, ray.ObjectRef):
            return dict(ray.get(src))
    except ImportError:
        pass
    with np.load(src) as z:
        return {k: z[k] for k in z.files}


def identity_recognizer_weights(n_templates: int) -> dict[str, np.ndarray]:
    """The identity checkpoint for :class:`..recognition.GlyphRecognizer`
    — distance scale 1, bias 0 per template: output provably unchanged
    (the round-trip proof that the plumbing is wired, not a no-op)."""
    return {
        "template_scale": np.ones(n_templates, np.float64),
        "template_bias": np.zeros(n_templates, np.float64),
    }
