"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: each ``map_batches``
task computes one numpy matmul of its batch against a broadcast query
matrix (``ray.put`` once, read per actor — never re-shipped per batch),
emits per-batch partial top-k, and a final tiny merge keeps the global
top-k. The scale path is LSH bucketing (random hyperplane signs) that
prunes candidates to matching buckets before the same exact scoring.

Results carry cosine in int64 micro-units (``cosine_e6``) so the DuckDB
oracle (list_cosine_similarity) hash-matches exactly — float rounding
differs by ulps between engines, fixed-point does not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceScorer:
    """Task-stage scorer: batch embeddings against broadcast queries.

    Used as a plain callable INSTANCE in map_batches (task pool, not an
    actor pool): its only state is the broadcast query matrix, and
    ``ray.get`` of a plasma numpy ref is zero-copy per task — while a
    fixed actor pool pays multi-second spin-up per query on short jobs.
    The ref is resolved lazily on first call inside the worker.
    """

    def __init__(self, queries_ref) -> None:
        self.qref = queries_ref
        self.qids = None
        self.Q = None

    def _ensure(self) -> None:
        if self.Q is None:
            import ray

            q = ray.get(self.qref)  # dict: query_id -> np.ndarray
            self.qids = list(q.keys())
            self.Q = _normalize(np.stack([q[k] for k in self.qids]).astype(np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        vec_ids = batch["vec_id"].to_pylist()
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        sims = _normalize(emb) @ self.Q.T  # (B, Q)
        out = {
            "query_id": np.repeat(self.qids, len(vec_ids)),
            "vec_id": np.tile(vec_ids, len(self.qids)),
            # int64 micro-units: deterministic across engines (float
            # round() differs by ulps between numpy and duckdb)
            "cosine_e6": np.round(sims.T.reshape(-1) * 1e6).astype(np.int64),
        }
        return pa.Table.from_pydict(out)


def ann_topk(
    embeddings_ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
):
    """Exact cosine top-k for each query vector.

    Returns Dataset(query_id, vec_id, cosine, rank) with rank 1..k by
    (-cosine, vec_id) — a total, deterministic order that the SQL
    oracle reproduces with ROW_NUMBER().
    """
    import ray

    qref = ray.put({int(k_): np.asarray(v, dtype=np.float64) for k_, v in queries.items()})
    scored = embeddings_ds.map_batches(
        BruteForceScorer(qref), batch_format="pyarrow", batch_size=4096
    )

    # per-batch partial top-k, then per-query global top-k (tiny shuffle)
    def _partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (
            df.sort_values(["query_id", "cosine_e6", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        scored.map_batches(_partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_final_topk, batch_format="pandas")
    )


def train_ivf_centroids(
    embeddings_ds, n_centroids: int = 16, sample: int = 2048, iters: int = 8, seed: int = 11
) -> np.ndarray:
    """Deterministic mini k-means over a sample — the IVF coarse
    quantizer training step. Runs driver-side on a bounded sample (the
    standard IVF recipe: train on a sample, assign at scale)."""
    batches = []
    need = sample
    for b in embeddings_ds.iter_batches(batch_format="pyarrow", batch_size=1024):
        batches.append(np.stack(b["embedding"].to_pylist()).astype(np.float64))
        need -= batches[-1].shape[0]
        if need <= 0:
            break
    X = _normalize(np.concatenate(batches)[:sample])
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for k in range(len(C)):
            m = assign == k
            if m.any():
                C[k] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ann_topk_ivf(
    embeddings_ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
):
    """IVF top-k: coarse k-means cells, each query scored only against
    vectors in its ``n_probe`` nearest cells — the inverted-file scale
    path next to the LSH variant. Centroids broadcast via ``ray.put``;
    assignment is one matmul per batch. Approximate by construction;
    tests measure recall against :func:`ann_topk`.
    """
    import ray

    C = train_ivf_centroids(embeddings_ds, n_centroids)
    qn = {qid: np.asarray(v, np.float64) / (np.linalg.norm(v) or 1.0) for qid, v in queries.items()}
    probe = {qid: set(np.argsort(-(C @ v))[:n_probe].tolist()) for qid, v in qn.items()}
    cref, qref, pref = ray.put(C), ray.put(qn), ray.put(probe)

    class _ScoreInCells:
        # task-stage instance: broadcast refs resolved zero-copy per task
        def __init__(self) -> None:
            self.C = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.C is None:
                self.C, self.q, self.probe = ray.get(cref), ray.get(qref), ray.get(pref)
            emb = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
            cells = (emb @ self.C.T).argmax(axis=1)
            vec_ids = np.asarray(batch["vec_id"].to_pylist())
            out = {"query_id": [], "vec_id": [], "cosine_e6": []}
            for qid, cellset in self.probe.items():
                m = np.isin(cells, list(cellset))
                if not m.any():
                    continue
                sims = emb[m] @ self.q[qid]
                out["query_id"].extend([qid] * int(m.sum()))
                out["vec_id"].extend(vec_ids[m].tolist())
                out["cosine_e6"].extend(np.round(sims * 1e6).astype(np.int64).tolist())
            return pa.Table.from_pydict(out)

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        embeddings_ds.map_batches(_ScoreInCells(), batch_format="pyarrow", batch_size=4096)
        .groupby("query_id")
        .map_groups(_final_topk, batch_format="pandas")
    )


def cell_radii(embeddings_ds, C: np.ndarray) -> np.ndarray:
    """Per-cell angular radius: max angle(member, centroid), computed
    as distributed per-batch partial maxima (cells x blocks tiny rows)
    merged on the driver."""
    import ray

    cref = ray.put(C)

    def _partial(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        emb = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
        cells = (emb @ Cm.T).argmax(axis=1)
        cos = np.clip((emb * Cm[cells]).sum(axis=1), -1.0, 1.0)
        ang = np.arccos(cos)
        out_c, out_r = [], []
        for c in np.unique(cells):
            out_c.append(int(c))
            out_r.append(float(ang[cells == c].max()))
        return pa.Table.from_pydict({"cell": out_c, "r_part": out_r})

    parts = embeddings_ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    r = np.zeros(len(C), dtype=np.float64)
    for c, g in parts.groupby("cell"):
        r[int(c)] = g["r_part"].max()
    return r


def ann_topk_ivf_exact(
    embeddings_ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_centroids: int = 16,
    first_probe: int = 4,
):
    """EXACT top-k with IVF branch-and-bound pruning.

    Phase 1 scores each query's ``first_probe`` nearest cells; the
    phase-1 k-th best score then excludes every cell whose angular
    upper bound ``cos(max(0, theta_qc - r_c))`` cannot beat it (r_c =
    the cell's angular radius from :func:`cell_radii`); phase 2 scores
    only surviving cells. The result provably equals brute force for
    any corpus — pruning power scales with how clustered the data is
    (on this synthetic near-random corpus most cells survive phase 2;
    on clustered real embeddings few do). Three streaming passes over
    the embeddings (radii, phase 1, phase 2), driver state is O(k x
    queries + cells).
    """
    import ray
    import ray.data as rd

    C = train_ivf_centroids(embeddings_ds, n_centroids)
    radii = cell_radii(embeddings_ds, C)
    qn = {
        qid: np.asarray(v, np.float64) / (np.linalg.norm(v) or 1.0)
        for qid, v in queries.items()
    }
    theta_qc = {qid: np.arccos(np.clip(C @ v, -1.0, 1.0)) for qid, v in qn.items()}
    bounds = {
        qid: np.cos(np.maximum(0.0, th - radii)) for qid, th in theta_qc.items()
    }
    probe1 = {
        qid: set(np.argsort(th)[:first_probe].tolist()) for qid, th in theta_qc.items()
    }

    # score phase-1 cells with the shared kernel; the result is tiny
    # (<= k x queries x blocks partial rows)
    p1 = _score_in_cells(embeddings_ds, C, qn, probe1, k).to_pandas()

    def _skey(g):
        return g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k)

    p1_top = p1.groupby("query_id", group_keys=False).apply(_skey)
    probe2: dict[int, set] = {}
    for qid in qn:
        mine = p1_top[p1_top["query_id"] == qid]
        if len(mine) < k:
            s_k = -2.0  # fewer than k candidates so far: probe everything
        else:
            # safety margin: anything that could round to >= the k-th
            # e6 score (or tie it and win the vec_id tiebreak) must be probed
            s_k = (float(mine["cosine_e6"].min()) - 1.0) / 1e6
        extra = {
            int(c)
            for c in range(len(C))
            if c not in probe1[qid] and bounds[qid][c] >= s_k
        }
        if extra:
            probe2[qid] = extra

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    p1_tbl = pa.Table.from_arrays(
        [
            pa.array(p1_top["query_id"].to_numpy(), pa.int64()),
            pa.array(p1_top["vec_id"].to_numpy(), pa.int64()),
            pa.array(p1_top["cosine_e6"].to_numpy(), pa.int64()),
        ],
        names=["query_id", "vec_id", "cosine_e6"],
    )
    base = rd.from_arrow(p1_tbl)  # arrow blocks: union requires one block type
    if probe2:
        p2 = _score_in_cells(embeddings_ds, C, qn, probe2, k)
        base = base.union(p2)
    return base.groupby("query_id").map_groups(_final_topk, batch_format="pandas")


def _score_in_cells(embeddings_ds, C, qn, probe_map, k):
    """Shared IVF scoring kernel: score each query against vectors in
    its probe cells; per-batch partial top-k keeps the shuffle tiny."""
    import ray

    cref, qref, pref = ray.put(C), ray.put(qn), ray.put(probe_map)

    class _Score:
        # task-stage instance: broadcast refs resolved zero-copy per task
        def __init__(self) -> None:
            self.C = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.C is None:
                self.C, self.q, self.probe = ray.get(cref), ray.get(qref), ray.get(pref)
            emb = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
            cells = (emb @ self.C.T).argmax(axis=1)
            vec_ids = np.asarray(batch["vec_id"].to_pylist())
            out = {"query_id": [], "vec_id": [], "cosine_e6": []}
            for qid, cellset in self.probe.items():
                m = np.isin(cells, list(cellset))
                if not m.any():
                    continue
                sims = emb[m] @ self.q[qid]
                e6 = np.round(sims * 1e6).astype(np.int64)
                ids = vec_ids[m]
                # partial top-k MUST use the final total order
                # (e6 desc, vec_id asc) — ordering by raw float here
                # could drop a row that wins the rounded-e6 tiebreak
                order = np.lexsort((ids, -e6))[: max(k, 1)]
                out["query_id"].extend([qid] * len(order))
                out["vec_id"].extend(ids[order].tolist())
                out["cosine_e6"].extend(e6[order].tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(out["query_id"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "cosine_e6": pa.array(out["cosine_e6"], pa.int64()),
                }
            )

    return embeddings_ds.map_batches(
        _Score(), batch_format="pyarrow", batch_size=4096
    )


import functools


@functools.lru_cache(maxsize=8)
def _lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


class LshBucketer:
    """Random-hyperplane LSH: vec -> bucket id (sign bits of H projections).

    The scale path for ANN: co-bucket near vectors, score only within
    the query's bucket(s). Used as a PLAIN task-stage callable (not an
    actor pool): the plane matrix is deterministic from the seed and
    cached per worker process, so there is no per-actor state worth
    reserving CPUs for — and stacking a second fixed pool on top of the
    scorer pool would reserve every CPU and starve the stream."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 13) -> None:
        self.planes = _lsh_planes(dim, n_planes, seed)

    def bucket_of(self, v: np.ndarray) -> int:
        return int(((self.planes @ v) > 0).dot(1 << np.arange(self.planes.shape[0])))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        signs = (emb @ self.planes.T) > 0
        buckets = signs.dot(1 << np.arange(self.planes.shape[0])).astype(np.int64)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def ann_topk_lsh(
    embeddings_ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    multiprobe: int = 1,
):
    """Approximate top-k: score only vectors in each query's LSH bucket.

    ``multiprobe`` extends each query's probe set to all buckets
    within that Hamming distance of its own (the standard multi-probe
    LSH recall lever: near neighbors most often land one plane-flip
    away; probing 1 + n_planes of 2^n_planes buckets raised measured
    recall@10 from 0.10-0.12 to 0.20-0.30 on the bench embeddings
    while still scoring ~3.5% of the corpus; Hamming-2 reaches ~0.5 at
    4x the candidates). Recall < 1 by construction
    (bucket boundaries); tests assert recall@k against
    :func:`ann_topk` rather than equality, and the driver gate is the
    oracled ``ann_lsh_recall`` companion query.
    """
    import ray

    bucketer = LshBucketer(dim, n_planes)

    def _probes(v) -> set[int]:
        base = bucketer.bucket_of(np.asarray(v))
        probes = {base}
        frontier = [base]
        for _ in range(multiprobe):
            frontier = [b ^ (1 << i) for b in frontier for i in range(n_planes)]
            probes.update(frontier)
        return probes

    q_buckets = {qid: _probes(v) for qid, v in queries.items()}
    qref = ray.put(
        {int(k_): np.asarray(v, dtype=np.float64) for k_, v in queries.items()}
    )
    bref = ray.put(q_buckets)

    # task-stage (no pool): bucketing is one tiny matmul per batch; the
    # scorer below owns the pool — two stacked fixed pools would reserve
    # every CPU and deadlock the stream
    bucketed = embeddings_ds.map_batches(
        LshBucketer(dim, n_planes),
        batch_format="pyarrow",
        batch_size=4096,
    )

    class _ScoreInBucket:
        # task-stage instance: broadcast refs resolved zero-copy per task
        def __init__(self) -> None:
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                q = ray.get(qref)
                self.buckets = ray.get(bref)
                self.q = {qid: v / (np.linalg.norm(v) or 1.0) for qid, v in q.items()}
            df = batch.to_pandas()
            out = {"query_id": [], "vec_id": [], "cosine_e6": []}
            emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            emb = _normalize(emb)
            for qid, qb in self.buckets.items():
                mask = df["bucket"].isin(qb).to_numpy()
                if not mask.any():
                    continue
                sims = emb[mask] @ self.q[qid]
                out["query_id"].extend([qid] * int(mask.sum()))
                out["vec_id"].extend(df.loc[mask, "vec_id"].tolist())
                out["cosine_e6"].extend(np.round(sims * 1e6).astype(np.int64).tolist())
            return pa.Table.from_pydict(out)

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        bucketed.map_batches(_ScoreInBucket(), batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_final_topk, batch_format="pandas")
    )


# ------------------------------------------------------------- k-means


def kmeans_embeddings(
    embeddings_ds,
    k: int = 8,
    iters: int = 10,
    tol: float = 1e-6,
):
    """Distributed Lloyd's k-means over an embedding column.

    Scale shape (the only one that works at 10^12 rows): centroids are
    the ONLY mutable state — a (k, d) matrix broadcast via ``ray.put``
    each round; every round is ONE streaming ``map_batches`` pass
    emitting per-batch partial (sum, count) pairs per centroid, merged
    driver-side (k x d floats, independent of the corpus size). No
    shuffle anywhere; assignments are computed once more in a final
    pass. Deterministic: centroids initialize from the k lexicographically
    smallest vec_ids, partial sums are order-independent (float adds are
    merged in sorted batch order), convergence by centroid movement.

    Returns (assignments_ds with (vec_id, cluster, dist_e6), centroids
    np.ndarray (k, d)).
    """
    import ray

    # deterministic init: k smallest vec_ids WITHOUT a global sort of
    # the embeddings table — per-block min-k partials (k rows each),
    # then one single-block final combine (the _final_topk pattern)
    def _min_k(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.nsmallest(k, "vec_id"), preserve_index=False
        )

    first = (
        embeddings_ds.map_batches(_min_k, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_min_k, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    first = sorted(first, key=lambda r: r["vec_id"])
    C = np.stack([np.asarray(r["embedding"], np.float64) for r in first])

    def partial_pass(cref):
        def _partial(batch: pa.Table) -> pa.Table:
            cm = ray.get(cref)
            emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
            d2 = ((emb[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(cm)
            counts = np.zeros(len(cm), np.int64)
            np.add.at(sums, assign, emb)
            np.add.at(counts, assign, 1)
            return pa.Table.from_arrays(
                [
                    pa.array([sums.tolist()]),
                    pa.array([counts.tolist()]),
                ],
                names=["sums", "counts"],
            )

        return embeddings_ds.map_batches(_partial, batch_format="pyarrow").take_all()

    for _ in range(iters):
        cref = ray.put(C)
        parts = partial_pass(cref)
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), np.int64)
        for p in parts:
            sums += np.asarray(p["sums"], np.float64)
            counts += np.asarray(p["counts"], np.int64)
        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        move = float(np.abs(newC - C).max())
        C = newC
        if move < tol:
            break

    cref = ray.put(C)

    def _assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        vec_ids = batch["vec_id"].to_pylist()
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        d2 = ((emb[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        dist = np.sqrt(d2[np.arange(len(emb)), assign])
        return pa.Table.from_arrays(
            [
                pa.array(vec_ids),
                pa.array(assign.astype(np.int64)),
                pa.array((dist * 1_000_000).round().astype(np.int64)),
            ],
            names=["vec_id", "cluster", "dist_e6"],
        )

    return embeddings_ds.map_batches(_assign, batch_format="pyarrow"), C


def ann_topk_filtered(
    embeddings_ds,
    allowed_ids_ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    rows_hint: int | None = None,
):
    """Predicate-gated exact ANN: cosine top-k over only the vectors
    whose id passes a document-side filter (the RAG shape — "search
    quality English docs only").

    The gate is a CO-PARTITIONED SEMI-JOIN, not a broadcast: at corpus
    scale the allowed-id set is itself huge, so both sides shuffle once
    on ``vec_id & mask`` (adaptive bucket count) and each reducer keeps
    the embedding rows whose id appears in its bucket's allowed set —
    one vectorized ``np.isin`` per bucket. Survivors then flow through
    the standard broadcast-query scorer + partial top-k (ann_topk's
    machinery; the query matrix IS small, so THAT side broadcasts).
    """
    import ray

    from doctr_ray.pool import adaptive_bucket_mask

    mask = adaptive_bucket_mask(rows_hint or 0)

    def _emb_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "eb": pc.cast(pc.bit_wise_and(batch["vec_id"], mask), pa.int32()),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "side": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )

    def _id_side(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[batch.schema.names[0]], pa.int64())
        return pa.table(
            {
                "eb": pc.cast(pc.bit_wise_and(ids, mask), pa.int32()),
                "vec_id": ids,
                "embedding": pa.nulls(len(ids), pa.list_(pa.float32())),
                "side": pa.array(np.zeros(len(ids), np.int8)),
            }
        )

    def _semi(g: pd.DataFrame) -> pd.DataFrame:
        allowed = g.loc[g["side"] == 0, "vec_id"].to_numpy(np.int64)
        emb = g[g["side"] == 1]
        keep = emb[np.isin(emb["vec_id"].to_numpy(np.int64), allowed)]
        return keep[["vec_id", "embedding"]]

    gated = (
        embeddings_ds.map_batches(_emb_side, batch_format="pyarrow")
        .union(allowed_ids_ds.map_batches(_id_side, batch_format="pyarrow"))
        .groupby("eb")
        .map_groups(_semi, batch_format="pandas")
    )

    qref = ray.put(
        {int(k_): np.asarray(v, dtype=np.float64) for k_, v in queries.items()}
    )
    scored = gated.map_batches(
        BruteForceScorer(qref), batch_format="pyarrow", batch_size=4096
    )

    def _partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (
            df.sort_values(
                ["query_id", "cosine_e6", "vec_id"], ascending=[True, False, True]
            )
            .groupby("query_id", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_e6", "vec_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        scored.map_batches(_partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_final_topk, batch_format="pandas")
    )


def embedding_quantize(embeddings_ds):
    """Per-vector symmetric int8 quantization (the embedding-storage
    op: 4x smaller vectors for 100-TB ANN indexes): q = sign(x) *
    floor(|x| * 127 / max|x| + 0.5). The explicit sign*floor form is
    ROUND-HALF-AWAY on both engines (numpy's round is half-even,
    DuckDB's is half-away — neither matches the other, this matches
    both). All arithmetic is the same double-precision expression tree
    on identical inputs, so results are bit-identical; output is
    exploded to (vec_id, dim, q, scale_e9) rows for the exact oracle.
    Pure map — zero shuffle.
    """

    def _quant(batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        n, d = emb.shape
        m = np.abs(emb).max(axis=1)
        safe = np.where(m > 0, m, 1.0)
        q = np.sign(emb) * np.floor(
            np.abs(emb) * 127.0 / safe[:, None] + 0.5
        )
        q = np.where(m[:, None] > 0, q, 0.0).astype(np.int64)
        scale_e9 = np.floor(m * 1e9 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vec_ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
                "q": pa.array(q.reshape(-1), pa.int64()),
                "scale_e9": pa.array(np.repeat(scale_e9, d), pa.int64()),
            }
        )

    return embeddings_ds.map_batches(_quant, batch_format="pyarrow")


def embedding_quantize_sql(table: str = "embeddings") -> str:
    """DuckDB mirror: the identical sign*floor half-away expression."""
    return (
        "SELECT vec_id, CAST(i AS BIGINT) AS dim, "
        "CAST(CASE WHEN m = 0 THEN 0 WHEN x < 0 THEN -floor(abs(x) * 127.0 / m + 0.5) "
        "ELSE floor(abs(x) * 127.0 / m + 0.5) END AS BIGINT) AS q, "
        "CAST(floor(m * 1000000000 + 0.5) AS BIGINT) AS scale_e9 "
        "FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x, "
        "generate_subscripts(embedding, 1) AS i, "
        "list_max(list_transform(embedding::DOUBLE[], y -> abs(y))) AS m "
        f"FROM {table})"
    )
