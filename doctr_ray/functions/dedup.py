"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

First-class components for a 100 TB training-data pipeline. All are
Ray-Data-native:

- exact: vectorized content-hash in ``map_batches`` then ONE
  ``groupby(fp)`` over (fp, doc_id) pairs only — the text never
  shuffles;
- MinHash+LSH: per-batch shingle->minhash (numpy, one vectorized pass),
  explode to (band, band_hash) rows, ``groupby`` bands -> candidate
  pairs -> exact-Jaccard verification; only small signature rows
  shuffle;
- SimHash: 64-bit signatures via md5-derived token hashes (stable
  across processes — NOT Python's salted ``hash``), near-dup = Hamming
  distance <= k via banded lookup;
- n-gram Jaccard: the verification kernel, exposed standalone.

The reference has no data-plane dedup (SURVEY.md §2.9); these follow
the standard MinHash/LSH construction (Broder 1997) as outlined in the
Ray Data guide's aggregation notes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ------------------------------------------------------------ exact dedup


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    df = batch.to_pandas()
    fp = df[text_col].map(lambda t: hashlib.md5((t or "").encode("utf-8")).hexdigest())
    return pa.Table.from_pandas(
        pd.DataFrame({"doc_id": df["doc_id"], "fp": fp}), preserve_index=False
    )


def exact_dedup_groups(docs_ds):
    """Dataset(doc_id, text) -> (fp, keeper_id, n_dups): one row per
    distinct content, keeper = min doc_id.

    SQL oracle: GROUP BY md5(text) with min(doc_id), count(*).
    """
    from ray.data.aggregate import Count, Min

    pairs = docs_ds.map_batches(add_fingerprint, batch_format="pyarrow")
    return pairs.groupby("fp").aggregate(
        Min("doc_id", alias_name="keeper_id"), Count(alias_name="n_dups")
    )


def exact_dedup_keep_first(docs_ds, buckets: int = 64):
    """Dataset(doc_id, text, ...) -> the deduplicated rows themselves
    (keep the min-doc_id row per content hash).

    Materializing the surviving rows inherently moves them once; this
    does exactly ONE coarse-bucket shuffle (a bucket is a function of
    fp, so a content group never straddles buckets) and the keeper
    selection inside each bucket is vectorized sort + drop_duplicates —
    not one python call per content group."""

    def _key(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        fp = df["text"].map(lambda t: hashlib.md5((t or "").encode()).hexdigest())
        df["fp"] = fp
        df["fpb"] = [int(f[:8], 16) % buckets for f in fp]
        return pa.Table.from_pandas(df, preserve_index=False)

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["fp", "doc_id"], kind="stable")
            .drop_duplicates("fp")
            .drop(columns=["fpb"])
        )

    return (
        docs_ds.map_batches(_key, batch_format="pyarrow")
        .groupby("fpb")
        .map_groups(_keep_first, batch_format="pandas")
    )


# ------------------------------------------------------------ shingles / hashes

import functools


@functools.lru_cache(maxsize=1 << 17)
def _tok_u64(token: str) -> int:
    """Deterministic 64-bit hash of one token (md5-based; cached —
    corpora have small vocabularies, so md5 runs once per distinct
    token, not once per occurrence)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def _stable_u64(tokens) -> np.ndarray:
    """Deterministic 64-bit hashes of a sequence of strings."""
    return np.array([_tok_u64(t) for t in tokens], dtype=np.uint64)


# odd multipliers for positional mixing of shingle token hashes
_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9], dtype=np.uint64)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Vectorized 64-bit hashes of word k-shingles: per-token cached
    md5 hashes combined positionally with odd-multiplier mixing —
    equivalent distribution to hashing each shingle string, ~100x
    cheaper (no per-shingle md5)."""
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    th = _stable_u64(toks)
    if len(toks) < k:
        out = np.zeros(1, dtype=np.uint64)
        for i, h in enumerate(th):
            out ^= h * _MIX[i % len(_MIX)]
        return out
    with np.errstate(over="ignore"):
        acc = th[: len(th) - k + 1] * _MIX[0]
        for j in range(1, k):
            acc = acc ^ (th[j : len(th) - k + 1 + j] * _MIX[j % len(_MIX)])
    return acc


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles."""
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity — the verify kernel."""
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------------------------ MinHash + LSH

class MinHasher:
    """Minhash signer — pass an INSTANCE to map_batches (task stage;
    the permutation parameters are tiny and ship with each task).

    num_perm universal-hash permutations h_i(x) = (a_i*x + b_i) mod p
    over md5-derived shingle hashes; signature matrix is computed with
    one vectorized (num_perm x num_shingles) pass per document.
    """

    # 31-bit Mersenne prime: a (31-bit) x shingle (31-bit) products stay
    # under 2^62, so the whole permutation sweep runs in int64 — this
    # numpy build's uint64 kernels are an order of magnitude slower
    # (scalar fallback), which made signing the pipeline bottleneck
    MERSENNE = np.int64((1 << 31) - 1)

    def __init__(self, num_perm: int = 64, seed: int = 7) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, (1 << 31) - 1, size=num_perm).astype(np.int64)
        self.b = rng.randint(0, (1 << 31) - 1, size=num_perm).astype(np.int64)

    def signature(self, text: str, k: int = 3) -> np.ndarray:
        x = _shingle_hashes(text, k)
        if len(x) == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        x31 = (x & np.uint64(0x7FFFFFFF)).astype(np.int64)  # 31-bit domain
        # (P, S) permuted values, all int64
        v = (self.a[:, None] * x31[None, :] + self.b[:, None]) % self.MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sigs = [self.signature(t or "") for t in df["text"]]
        return pa.Table.from_arrays(
            [
                pa.array(df["doc_id"]),
                pa.array([s.tobytes() for s in sigs], pa.binary()),
            ],
            names=["doc_id", "sig"],
        )


def explode_bands(batch: pa.Table, num_perm: int = 64, bands: int = 16) -> pa.Table:
    """Signature rows -> (band, band_hash, doc_id) rows for LSH bucketing."""
    rows_per_band = num_perm // bands
    doc_ids: list = []
    band_ids: list[int] = []
    band_hashes: list[int] = []
    for did, sig_bytes in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        sig = np.frombuffer(sig_bytes, dtype=np.int64)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.md5(chunk.tobytes()).digest()[:8]
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(int.from_bytes(h, "little") >> 1)  # fit int64
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids),
            pa.array(band_ids, pa.int32()),
            pa.array(band_hashes, pa.int64()),
        ],
        names=["doc_id", "band", "band_hash"],
    )


PAIR_BUCKETS = 64  # coarse shuffle-key granularity for pair reducers


def _md5_bucket(val, buckets: int = PAIR_BUCKETS) -> int:
    return int.from_bytes(hashlib.md5(str(val).encode()).digest()[:4], "little") % buckets


def dedup_pair_rows(pairs_ds):
    """(a, b, ...) rows -> distinct rows by (a, b).

    ONE coarse-bucket shuffle (64 keys) + vectorized drop_duplicates
    inside each bucket — never one python group per pair (map_groups is
    ~1ms python overhead per group)."""

    def _pair_bucket(batch: pa.Table) -> pa.Table:
        b = [_md5_bucket(a) for a in batch["a"].to_pylist()]
        return batch.append_column("pb", pa.array(b, pa.int32()))

    return (
        pairs_ds.map_batches(_pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["a", "b"]).drop(columns=["pb"]),
            batch_format="pandas",
        )
    )


def minhash_candidate_pairs(docs_ds, num_perm: int = 64, bands: int = 16, deduped: bool = True):
    """Dataset(doc_id, text) -> candidate near-dup pairs (a, b), a < b.

    Pipeline: sign (actor pool) -> explode bands -> groupby(band,
    band_hash) -> pairs within each bucket. Only (doc_id, 512B sig)
    rows ever shuffle. Buckets are tiny by construction; a hot bucket
    (identical boilerplate) is capped and logged via n_bucket.
    ``deduped=False`` skips the final cross-bucket distinct shuffle —
    for consumers that dedup downstream anyway (minhash_near_dups
    dedups inside its verify reducer, saving one all-to-all round).
    """
    # task-stage: the signer's state (2*num_perm ints) is trivial to
    # ship per task, so plain task parallelism scales elastically with
    # the cluster instead of pinning a fixed actor pool
    sigs = docs_ds.map_batches(MinHasher(num_perm=num_perm), batch_format="pyarrow")
    bands_ds = sigs.map_batches(
        lambda b: explode_bands(b, num_perm, bands), batch_format="pyarrow"
    )

    MAX_BUCKET = 256   # salt guard: beyond this it's boilerplate, cap the pairs
    COARSE = 64        # shuffle key granularity: one vectorized reducer
                       # per coarse bucket, not one python call per LSH
                       # bucket (most LSH buckets are singletons)

    def _coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "coarse", pc.cast(pc.bit_wise_and(batch["band_hash"], COARSE - 1), pa.int32())
        )

    def _pairs_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        # no-silent-caps: every pair carries the PRE-cap size of the LSH
        # bucket it came from; n_bucket > MAX_BUCKET tells the consumer
        # pairs were dropped there (boilerplate bucket) and how many
        # docs it actually held
        out_a, out_b, out_n = [], [], []
        for _, bucket in g.groupby(["band", "band_hash"], sort=False):
            if len(bucket) < 2:
                continue
            n_full = len(bucket)
            ids = sorted(bucket["doc_id"].tolist())[:MAX_BUCKET]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_n.append(n_full)
        df = pd.DataFrame(
            {"a": out_a, "b": out_b, "n_bucket": pd.Series(out_n, dtype=np.int64)}
        )
        return df.drop_duplicates(subset=["a", "b"])

    pairs = (
        bands_ds.map_batches(_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(_pairs_of_partition, batch_format="pandas")
    )
    if not deduped:
        return pairs
    # cross-coarse-bucket duplicates: the same pair found via different
    # bands can land in different coarse buckets -> one small dedup
    # shuffle over the a-hash key
    return dedup_pair_rows(pairs)


def minhash_near_dups(
    docs_ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    join_buckets: int = PAIR_BUCKETS,
):
    """Candidate pairs verified by exact n-gram Jaccard >= threshold.

    Verification is a DISTRIBUTED bucketed hash-join — nothing is
    materialized on the driver:

    1. each candidate pair (a, b) emits two text-request rows, keyed by
       the hash bucket of the doc whose text that side needs;
    2. the (doc_id, text) rows shuffle by the same key; inside each
       bucket group the requests pick up their text (vectorized map);
    3. a second, candidate-sized shuffle on the pair key co-locates the
       two sides; the exact n-gram Jaccard kernel verifies each pair.

    The full text column moves exactly once (any hash join moves the
    build side once); everything after step 2 is candidate-sized.
    Emits (a, b, jaccard_e6), int64 micro-units — identical layout to
    :func:`jaccard_pairs_exact`, whose SQL oracle therefore also checks
    this operator when recall is 1.
    """
    # duplicates are dropped inside the verify reducer (same (a, b)
    # always lands in one pb bucket), saving one shuffle here
    pairs = minhash_candidate_pairs(docs_ds, num_perm, bands, deduped=False)
    K = join_buckets

    id_type = None  # resolved lazily from the first batch

    def _requests(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        docs = a + b
        return pa.Table.from_arrays(
            [
                pa.array([_md5_bucket(d, K) for d in docs], pa.int32()),
                pa.array(docs, batch.schema.field("a").type),
                pa.array(a + a, batch.schema.field("a").type),
                pa.array(b + b, batch.schema.field("b").type),
                pa.array([""] * len(docs), pa.string()),
                pa.array([1] * len(docs), pa.int8()),
            ],
            names=["jb", "doc", "a", "b", "text", "is_req"],
        )

    def _texts_keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        id_t = batch.schema.field("doc_id").type
        n = len(ids)
        # a/b are never read on text rows; fill them with the doc id so
        # no column ever holds nulls (pandas would promote int64->float)
        return pa.Table.from_arrays(
            [
                pa.array([_md5_bucket(d, K) for d in ids], pa.int32()),
                pa.array(ids, id_t),
                pa.array(ids, id_t),
                pa.array(ids, id_t),
                batch["text"].cast(pa.string()),
                pa.array([0] * n, pa.int8()),
            ],
            names=["jb", "doc", "a", "b", "text", "is_req"],
        )

    req = pairs.map_batches(_requests, batch_format="pyarrow")
    txt = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _texts_keyed, batch_format="pyarrow"
    )

    def _attach(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["is_req"] == 0]
        reqs = g[g["is_req"] == 1]
        lookup = dict(zip(texts["doc"], texts["text"]))
        out = reqs[["a", "b", "doc"]].copy()
        out["text"] = reqs["doc"].map(lookup).fillna("")
        out["pb"] = [
            _md5_bucket(f"{x}|{y}", K) for x, y in zip(out["a"], out["b"])
        ]
        return out

    sided = req.union(txt).groupby("jb").map_groups(_attach, batch_format="pandas")

    def _verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["doc"] == g["a"]][["a", "b", "text"]].rename(columns={"text": "ta"})
        right = g[g["doc"] == g["b"]][["a", "b", "text"]].rename(columns={"text": "tb"})
        m = left.merge(right, on=["a", "b"]).drop_duplicates(["a", "b"])
        sims = [ngram_jaccard(x, y) for x, y in zip(m["ta"], m["tb"])]
        m["jaccard_e6"] = [int(round(s * 1e6)) for s in sims]
        m = m[[s >= threshold for s in sims]]
        return m[["a", "b", "jaccard_e6"]].astype({"jaccard_e6": np.int64})

    return sided.groupby("pb").map_groups(_verify_bucket, batch_format="pandas")


# ------------------------------------------------------------ SimHash

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5 token hashes, +/-1 vote per bit)."""
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return 0
    hs = _stable_u64(np.array(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
    votes = (2 * bits - 1).sum(axis=0)
    return int(sum(1 << i for i in range(64) if votes[i] > 0))


def add_simhash(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    sh = df["text"].map(lambda t: simhash64(t or ""))
    return pa.Table.from_arrays(
        [pa.array(df["doc_id"]), pa.array([s - (1 << 63) for s in sh], pa.int64())],
        names=["doc_id", "simhash"],
    )


#: Hard bound on the ground-truth all-pairs operator: above this many
#: docs the driver-side shingle-set materialization (and the O(n^2)
#: compare) is a design error, not a slow query — callers must sample
#: first or use the MinHash scale path.
JACCARD_EXACT_MAX_DOCS = 200_000


def jaccard_pairs_exact(
    docs_ds, threshold: float = 0.5, k: int = 3,
    max_docs: int = JACCARD_EXACT_MAX_DOCS,
):
    """EXACT all-pairs n-gram Jaccard >= threshold.

    Small-corpus ground-truth operator (and the oracle target the
    probabilistic MinHash path approximates): shingle sets are computed
    distributed, broadcast once via ``ray.put``, and each task compares
    its docs against all higher ids — O(n^2) comparisons spread over
    the cluster. BY DESIGN this materializes every shingle set on the
    driver, so it is hard-bounded: more than ``max_docs`` documents
    raises ``ValueError`` (no silent sampling — a truncated recall
    oracle would silently overstate MinHash recall). At 100 TB use
    :func:`minhash_near_dups`; this exists to *measure* its recall.
    Emits (a, b, jaccard_e6), a < b.
    """
    import ray

    n_docs = docs_ds.count()
    if n_docs > max_docs:
        raise ValueError(
            f"jaccard_pairs_exact is the O(n^2) ground-truth oracle and "
            f"materializes all shingle sets on the driver: got {n_docs} "
            f"docs > max_docs={max_docs}. Sample the corpus first or use "
            f"minhash_near_dups for the scale path."
        )

    def _shingle_sets(batch: pa.Table) -> pa.Table:
        ids, sets_ = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ids.append(d)
            sets_.append(list(set(shingles(t or "", k))))
        return pa.Table.from_pydict({"doc_id": ids, "sh": sets_})

    sets_ds = docs_ds.map_batches(_shingle_sets, batch_format="pyarrow")
    all_sets: dict = {}
    for b in sets_ds.iter_batches(batch_format="pyarrow"):
        all_sets.update(zip(b["doc_id"].to_pylist(), (set(s) for s in b["sh"].to_pylist())))
    ref = ray.put(all_sets)
    ordered = sorted(all_sets)

    def _pairs(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        out = {"a": [], "b": [], "jaccard_e6": []}
        for a in batch["doc_id"].to_pylist():
            sa = lookup[a]
            for b_ in ordered:
                if not (b_ > a):
                    continue
                sb = lookup[b_]
                if not sa and not sb:
                    j = 1.0
                elif not sa or not sb:
                    j = 0.0
                else:
                    inter = len(sa & sb)
                    j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    out["a"].append(a)
                    out["b"].append(b_)
                    out["jaccard_e6"].append(int(round(j * 1e6)))
        return pa.Table.from_pydict(out)

    return sets_ds.select_columns(["doc_id"]).map_batches(
        _pairs, batch_format="pyarrow", batch_size=64
    )


def embedding_near_dups(embeddings_ds, threshold: float = 0.95, n_planes: int = 6, seed: int = 13):
    """Near-duplicate vectors by cosine similarity >= threshold.

    Scale path: random-hyperplane LSH bucketing (vectors with cosine
    near 1 land in the same sign-bucket with high probability), exact
    cosine verification within each bucket — only (id, vec) rows of one
    bucket ever co-locate. Emits (a, b, cosine_e6) with a < b.

    Recall note: a near-dup pair straddling a hyperplane is missed by
    single-table LSH; production would use multiple tables. The SQL
    oracle is the exact O(n^2) join, so tests/driver measure recall
    directly — with few planes on clustered data recall is ~1.
    """
    import numpy as np

    def _bucket(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        if n_planes <= 0:  # exact mode: single bucket (small corpora / oracle)
            buckets = np.zeros(len(emb), dtype=np.int64)
        else:
            rng = np.random.RandomState(seed)
            planes = rng.standard_normal((n_planes, emb.shape[1]))
            signs = (emb @ planes.T) > 0
            buckets = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": batch["vec_id"].to_pylist(),
                "bucket": buckets,
                "vec": [v.tobytes() for v in emb],
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].tolist()
        vecs = np.stack([np.frombuffer(b, dtype=np.float64) for b in g["vec"]])
        sims = vecs @ vecs.T
        out = {"a": [], "b": [], "cosine_e6": []}
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    out["a"].append(ids[i])
                    out["b"].append(ids[j])
                    out["cosine_e6"].append(int(round(sims[i, j] * 1e6)))
        return pd.DataFrame(out)

    return (
        embeddings_ds.map_batches(_bucket, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )


def simhash_near_dups(docs_ds, max_hamming: int = 3, bands: int | None = None):
    """Near-dups by SimHash: band the 64 bits into ``bands`` chunks —
    any pair within Hamming distance < bands shares >= one exact band
    (pigeonhole) -> groupby(band-bucket) -> verify Hamming <= max_hamming.

    ``bands`` defaults to the smallest divisor of 64 that is
    >= max_hamming + 1, which makes the banded search EXACT (every pair
    at Hamming distance <= max_hamming is guaranteed to co-bucket in at
    least one band) — that exactness is what the SQL oracle checks.
    An explicit ``bands`` below the pigeonhole bound raises. Scale note:
    large max_hamming forces narrow chunks (few distinct bucket values,
    big buckets); production simhash dedup at k > ~6 uses permuted
    multi-table indexes instead — this operator targets the k <= 8
    regime.
    """
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} cannot guarantee recall for max_hamming={max_hamming}; "
            f"pigeonhole needs bands >= {max_hamming + 1}"
        )
    if bands > 64:
        raise ValueError(f"bands must be <= 64, got {bands}")
    # bit spans: 64 bits spread over `bands` chunks of floor/ceil width —
    # WIDER chunks than a power-of-two split (e.g. 9 bands of 7-8 bits
    # for k=8), so buckets stay selective: candidate volume scales as
    # n^2 / 2^width per band, which made 4-bit chunks a pair explosion
    base_w, extra = divmod(64, bands)
    _spans: list[tuple[int, int]] = []
    off = 0
    for b in range(bands):
        w = base_w + (1 if b < extra else 0)
        _spans.append((off, w))
        off += w

    sh = docs_ds.map_batches(add_simhash, batch_format="pyarrow")

    # coarse-bucket the (band, chunk) key so the reducer runs a few
    # dozen vectorized tasks, not one python call per LSH bucket
    COARSE = 64

    _POP16 = np.array([bin(v).count("1") for v in range(65536)], dtype=np.uint8)

    def _explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # int64 -> unsigned flip must stay in integer arithmetic: adding
        # the python int 2**63 to an int64 array promotes to float64 and
        # silently drops the low bits
        u = df["simhash"].to_numpy().astype(np.int64).astype(np.uint64) + np.uint64(1 << 63)
        n = len(u)
        frames = []
        for b, (off, w) in enumerate(_spans):
            chunk = ((u >> np.uint64(off)) & np.uint64((1 << w) - 1)).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": df["doc_id"],
                        "band": np.full(n, b, dtype=np.int32),
                        "chunk": chunk,
                        "simhash": df["simhash"],
                        "coarse": (b * 1000003 + chunk) % COARSE,
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        # scratch buffers reused across LSH buckets: fresh n^2
        # allocations per bucket page-fault-bound this kernel (measured
        # ~8s single-core on 17.8M matrix entries; reused buffers make
        # the same sweep sub-second)
        cap = 0
        xor_b = q_b = tmp_b = None

        def views(n: int):
            nonlocal cap, xor_b, q_b, tmp_b
            if n * n > cap:
                cap = n * n
                xor_b = np.empty(cap, dtype=np.int64)
                q_b = np.empty(cap, dtype=bool)
                tmp_b = np.empty(cap, dtype=bool)
            return (
                xor_b[: n * n].reshape(n, n),
                q_b[: n * n].reshape(n, n),
                tmp_b[: n * n].reshape(n, n),
            )

        frames = []
        for (band, _chunk), bucket in g.groupby(["band", "chunk"], sort=False):
            n = len(bucket)
            if n < 2:
                continue
            bucket = bucket.sort_values("doc_id")
            ids = bucket["doc_id"].to_numpy()
            s = bucket["simhash"].to_numpy()  # int64; XOR is sign-agnostic
            x, q, tmp = views(n)
            np.bitwise_xor(s[:, None], s[None, :], out=x)
            # fancy-index gather (np.take with out= takes a slow path:
            # measured 14s vs 0.6s on this sweep)
            ham = _POP16[x.view(np.uint16).reshape(n * n, 4)].sum(
                axis=1, dtype=np.int16
            ).reshape(n, n)
            np.less_equal(ham, max_hamming, out=q)
            # first-matching-band emission: a pair also equal in an
            # EARLIER band's chunk is that band's responsibility — every
            # qualifying pair is emitted exactly once globally, so no
            # cross-band dedup shuffle is needed afterwards (pairs were
            # previously duplicated up to `bands` times and reshuffled)
            u = s.astype(np.int64).astype(np.uint64) + np.uint64(1 << 63)
            for eb in range(int(band)):
                off, w = _spans[eb]
                ec = ((u >> np.uint64(off)) & np.uint64((1 << w) - 1)).astype(np.int64)
                np.not_equal(ec[:, None], ec[None, :], out=tmp)
                q &= tmp
                if not q.any():
                    break
            ii, jj = np.nonzero(q)
            keep = ii < jj  # upper triangle without materializing triu
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                frames.append(
                    pd.DataFrame(
                        {"a": ids[ii], "b": ids[jj], "hamming": ham[ii, jj].astype(np.int64)}
                    )
                )
        if not frames:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        return pd.concat(frames, ignore_index=True)

    return (
        sh.map_batches(_explode, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(_pairs, batch_format="pandas")
    )


# ----------------------------------------------- near-dup clustering


def _cc_candidate_rows(key, cand, buckets: int) -> pa.Table:
    """(node, candidate-label) rows with the node's shuffle bucket."""
    return pa.Table.from_arrays(
        [
            pa.array([_md5_bucket(k, buckets) for k in key], pa.int32()),
            pa.array(key, pa.string()),
            pa.array(cand, pa.string()),
        ],
        names=["cb", "node", "cand"],
    )


def _cc_fingerprint(labels_ds) -> int:
    """Order-independent fingerprint of a (node, label) dataset.

    Hash-min labels only ever decrease, so the propagation is monotone
    and 'fingerprint unchanged' == 'fixpoint reached' (no oscillation
    is possible). Additive mod-2^64 mixing keeps partials mergeable.
    The fingerprint is INTERNAL (convergence detection only — no SQL
    oracle reproduces it), so hashing is one vectorized
    ``pd.util.hash_pandas_object`` call per batch instead of a per-row
    Python md5 loop (round-3 verdict: O(V) Python x O(log diameter)
    rounds); the int64 view keeps the sum off this numpy build's slow
    uint64 kernels."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(
            df["node"] + "\x1f" + df["label"], index=False
        ).to_numpy()
        s = int(h.view(np.int64).sum())  # silent int64 wrap: mod 2^64, order-free
        return pa.Table.from_arrays([pa.array([s], pa.int64())], names=["p"])

    parts = labels_ds.map_batches(_partial, batch_format="pyarrow").take_all()
    return sum(r["p"] for r in parts) & ((1 << 64) - 1)


def connected_components(pairs_ds, max_rounds: int = 50):
    """Near-dup pairs (a, b) -> (doc_id, cluster_id): the transitive
    closure that turns pairwise matches into dedup groups (cluster_id =
    lexicographic min doc_id of the component).

    Distributed hash-min label propagation (the standard MapReduce CC
    construction): every node starts labeled with itself; each round,
    every node takes the min label over itself and its neighbors. A
    round is two coarse-bucket shuffles of small (node, label) string
    rows — the adjacency is built once and reused; document text never
    enters the graph. Each edge round is followed by a pointer-jump
    round (label <- label of label, i.e. path halving over the label
    forest), which cuts worst-case convergence from O(diameter) to
    O(log diameter) — a 24-node path converges in 5 iterations instead
    of 23. Convergence is detected by an order-independent label
    fingerprint (labels only ever decrease, so an unchanged fingerprint
    IS the fixpoint), costing one tiny aggregate per round. Scale
    shape: every structure here is O(|pairs|), not O(|corpus|), and
    each round's shuffle moves only label rows.
    """
    import pyarrow.compute as pc

    def _adj_raw(batch: pa.Table) -> pa.Table:
        a = [str(x) for x in batch["a"].to_pylist()]
        b = [str(x) for x in batch["b"].to_pylist()]
        return pa.Table.from_arrays(
            [pa.array(a + b, pa.string()), pa.array(b + a, pa.string())],
            names=["node", "nbr"],
        )

    # both-direction adjacency, materialized once (it is candidate-pair
    # sized — tiny next to the corpus — and every round re-reads it)
    adj_raw = pairs_ds.map_batches(_adj_raw, batch_format="pyarrow").materialize()
    n_rows = adj_raw.count()
    # bucket granularity adapts to the graph size: a fixed 64-way split
    # on a small pair set fragments every round into hundreds of
    # near-empty tasks (measured: 83 s for ONE converged iteration on
    # 256 pairs — pure scheduling overhead); at scale the bucket count
    # grows with the edge count so reducers stay ~50k rows each
    from doctr_ray.pool import adaptive_buckets

    B = min(PAIR_BUCKETS, adaptive_buckets(n_rows))

    def _add_cb(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(
                    [_md5_bucket(n, B) for n in batch["node"].to_pylist()], pa.int32()
                ),
                batch["node"],
                batch["nbr"],
            ],
            names=["cb", "node", "nbr"],
        )

    adj = adj_raw.map_batches(_add_cb, batch_format="pyarrow").repartition(B).materialize()

    def _seed_labels(batch: pa.Table) -> pa.Table:
        # seed each adjacency row with min(node, nbr): the groupby-min
        # below then yields min(self, all neighbors) — one full hash-min
        # round folded into the mandatory node-dedup shuffle for free
        nodes = batch["node"].to_pylist()
        nbrs = batch["nbr"].to_pylist()
        return pa.Table.from_arrays(
            [
                batch["cb"],
                batch["node"],
                pa.array([min(n, m) for n, m in zip(nodes, nbrs)], pa.string()),
            ],
            names=["cb", "node", "label"],
        )

    def _min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", sort=False)["label"].min().reset_index()
        m.insert(0, "cb", [_md5_bucket(n, B) for n in m["node"]])
        return m

    labels = (
        adj.map_batches(_seed_labels, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(_min_per_node, batch_format="pandas")
        .materialize()
    )

    def _propagate_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # rows: label rows (nbr == "") + adjacency rows, same node bucket
        labs = g[g["is_lab"] == 1]
        adjr = g[g["is_lab"] == 0]
        lab_of = dict(zip(labs["node"], labs["label"]))
        # candidates: each node's label flows to its neighbors; the node
        # keeps its own label via a self row
        out_node = pd.concat([adjr["nbr"], labs["node"]], ignore_index=True)
        out_cand = pd.concat(
            [adjr["node"].map(lab_of), labs["label"]], ignore_index=True
        )
        t = _cc_candidate_rows(out_node.tolist(), out_cand.tolist(), B)
        return t.to_pandas()

    def _min_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", sort=False)["cand"].min().reset_index()
        m.columns = ["node", "label"]
        m.insert(0, "cb", [_md5_bucket(n, B) for n in m["node"]])
        return m

    def _minprop(labels_ds, adj_ds):
        """One min-propagation round: label(n) <- min over n's label and
        the labels flowing in along adj_ds edges. Two bucket shuffles."""
        lab_rows = labels_ds.map_batches(
            lambda b: b.append_column("nbr", pc.cast(b["label"], pa.string()))
            .append_column("is_lab", pa.array([1] * len(b), pa.int8()))
            .rename_columns(["cb", "node", "label", "nbr", "is_lab"]),
            batch_format="pyarrow",
        )
        edge_rows = adj_ds.map_batches(
            lambda b: b.append_column("label", pc.cast(b["node"], pa.string()))
            .append_column("is_lab", pa.array([0] * len(b), pa.int8()))
            .rename_columns(["cb", "node", "nbr", "label", "is_lab"])
            .select(["cb", "node", "label", "nbr", "is_lab"]),
            batch_format="pyarrow",
        )
        return (
            lab_rows.union(edge_rows)
            .groupby("cb")
            .map_groups(_propagate_bucket, batch_format="pandas")
            .groupby("cb")
            .map_groups(_min_bucket, batch_format="pandas")
            .materialize()
        )

    def _labels_as_edges(batch: pa.Table) -> pa.Table:
        # pointer-jump edges: label p -> node n for every (n, label=p),
        # so the next _minprop computes label(n) <- label(label(n))
        nodes = batch["node"].to_pylist()
        labs = batch["label"].to_pylist()
        keep = [i for i, (n, p) in enumerate(zip(nodes, labs)) if n != p]
        return pa.Table.from_arrays(
            [
                pa.array([_md5_bucket(labs[i], B) for i in keep], pa.int32()),
                pa.array([labs[i] for i in keep], pa.string()),
                pa.array([nodes[i] for i in keep], pa.string()),
            ],
            names=["cb", "node", "nbr"],
        )

    fp = _cc_fingerprint(labels)
    for _ in range(max_rounds):
        labels = _minprop(labels, adj)
        new_fp = _cc_fingerprint(labels)
        if new_fp == fp:
            # stability under SYMMETRIC edge propagation means l(n) <=
            # l(nbr) on every edge in both directions, i.e. labels are
            # component-constant — the true fixpoint; skip the jump
            break
        jump_edges = labels.map_batches(_labels_as_edges, batch_format="pyarrow")
        labels = _minprop(labels, jump_edges)
        fp = _cc_fingerprint(labels)

    def _out(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["node"], batch["label"]], names=["doc_id", "cluster_id"]
        )

    return labels.map_batches(_out, batch_format="pyarrow")


# ------------------------------------------- chunk-level (C4-style) dedup


def chunk_dedup_stats(docs_ds, tokens_per_chunk: int = 12, buckets: int = PAIR_BUCKETS):
    """C4-style sub-document dedup signals: cut every document into
    fixed token chunks, hash each chunk, count global occurrences, and
    report per document how many of its chunks also appear elsewhere
    (boilerplate / mirrored-paragraph detection).

    Scale shape: explode to (bucket, fp, doc_id) rows — 16-byte hashes,
    never text; ONE bucket shuffle computes global chunk counts and
    per-doc partials inside a vectorized pandas reducer; a second
    COARSE shuffle (adaptive doc-buckets) sums the partials in a
    vectorized reducer (a native per-doc-key sort-aggregate here costs
    ~1ms Python per key — the CLAUDE.md landmine, measured 29.6 s on
    the sibling dup_ngram_stats). Output: (doc_id, n_chunks,
    n_dup_chunks, dup_frac_e6).
    """
    n_docs = docs_ds.count()
    from doctr_ray.pool import adaptive_buckets

    doc_buckets = adaptive_buckets(n_docs)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, fps, cbs = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(0, len(toks), tokens_per_chunk):
                chunk = " ".join(toks[i : i + tokens_per_chunk])
                h = hashlib.md5(chunk.encode("utf-8")).digest()
                fps.append(h.hex())
                cbs.append(int.from_bytes(h[:4], "little") % buckets)
                ids.append(str(did))
        return pa.Table.from_arrays(
            [
                pa.array(cbs, pa.int32()),
                pa.array(fps, pa.string()),
                pa.array(ids, pa.string()),
            ],
            names=["cb", "fp", "doc_id"],
        )

    def _bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # global count per fp is complete within its bucket (hash-keyed)
        counts = g.groupby("fp", sort=False)["doc_id"].transform("size")
        g = g.assign(dup=(counts > 1).astype("int64"), one=1)
        out = g.groupby("doc_id", sort=False)[["one", "dup"]].sum().reset_index()
        out.columns = ["doc_id", "n_chunks", "n_dup_chunks"]
        out["db"] = [_md5_bucket(d, doc_buckets) for d in out["doc_id"]]
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("doc_id", sort=False)[["n_chunks", "n_dup_chunks"]]
            .sum()
            .reset_index()
        )
        n = out["n_chunks"].to_numpy(dtype=np.int64)
        d = out["n_dup_chunks"].to_numpy(dtype=np.int64)
        out["dup_frac_e6"] = np.where(
            n > 0, np.round(d * 1_000_000.0 / np.maximum(n, 1)), 0
        ).astype(np.int64)
        return out

    return (
        docs_ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(_bucket_stats, batch_format="pandas")
        .groupby("db")
        .map_groups(_final, batch_format="pandas")
    )


def dup_ngram_stats(docs_ds, n: int = 8, buckets: int = PAIR_BUCKETS):
    """Cross-document duplicate n-gram fraction (the MassiveText /
    Lee-et-al. sub-document duplication signal): for each document, the
    share of its sliding word n-gram positions whose gram also occurs
    in at least one OTHER document. Complements :func:`chunk_dedup_stats`
    (disjoint chunks, any-repeat semantics) with sliding windows and
    distinct-document semantics — the filter input for "this page is
    40% mirrored boilerplate".

    Scale shape — the honest two-shuffle form (the gram-count table is
    corpus-sized, so no broadcast is possible):

    1. per-batch explode to per-doc distinct (bucket, fp, doc_id, cnt)
       rows — md5 grams, never text, pre-aggregated within the doc so a
       gram repeated k times in one doc is ONE row with cnt=k;
    2. ONE bucket shuffle (bucket = fp-hash % buckets): inside each
       bucket a vectorized pandas reducer sees every (fp, doc_id) pair
       for its grams — distinct-doc count per fp is complete there —
       and collapses straight to per-doc partials (n_grams, n_dup);
    3. a second COARSE shuffle (adaptive doc-buckets, ~50k docs per
       reducer) sums the per-bucket partials and computes the exact
       integer frac inside a vectorized reducer. A native
       ``groupby(doc_id).aggregate(Sum)`` here was 29.6 s for 155k
       rows at sf0.1/32cpu — per-key sort-aggregate scheduling, the
       CLAUDE.md landmine — vs 5.5 s end-to-end with coarse buckets.

    md5 hex on BOTH engines keys the grouping, so the oracle matches
    even in the (astronomically unlikely) event of digest collisions.
    """
    # adaptive doc-bucket count for the final combine (tiny partial
    # rows; one reducer per ~50k docs keeps groups coarse + vectorized)
    n_docs = docs_ds.count()
    from doctr_ray.pool import adaptive_buckets

    doc_buckets = adaptive_buckets(n_docs)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, fps, cbs, cnts = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = [t for t in (text or "").split(" ") if t]
            local: dict[str, int] = {}
            for i in range(max(0, len(toks) - n + 1)):
                h = hashlib.md5(" ".join(toks[i : i + n]).encode("utf-8")).hexdigest()
                local[h] = local.get(h, 0) + 1
            for h, c in local.items():
                fps.append(h)
                cbs.append(int(h[:8], 16) % buckets)
                ids.append(did)
                cnts.append(c)
        return pa.Table.from_arrays(
            [
                pa.array(cbs, pa.int32()),
                pa.array(fps, pa.string()),
                pa.array(ids, pa.int64()),
                pa.array(cnts, pa.int64()),
            ],
            names=["cb", "fp", "doc_id", "cnt"],
        )

    def _bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (fp, doc_id) -> group size == distinct docs
        ndocs = g.groupby("fp", sort=False)["doc_id"].transform("size")
        g = g.assign(dup_cnt=g["cnt"].where(ndocs > 1, 0))
        out = g.groupby("doc_id", sort=False)[["cnt", "dup_cnt"]].sum().reset_index()
        out.columns = ["doc_id", "n_grams", "n_dup"]
        out["db"] = [_md5_bucket(d, doc_buckets) for d in out["doc_id"]]
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        # db is dropped by the column selection; groups stay coarse
        out = g.groupby("doc_id", sort=False)[["n_grams", "n_dup"]].sum().reset_index()
        ng = out["n_grams"].to_numpy(dtype=np.int64)
        nd = out["n_dup"].to_numpy(dtype=np.int64)
        out["dup_frac_e6"] = (1_000_000 * nd) // np.maximum(ng, 1)
        return out

    return (
        docs_ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(_bucket_stats, batch_format="pandas")
        .groupby("db")
        .map_groups(_final, batch_format="pandas")
    )


def dup_ngram_sql(n: int = 8) -> str:
    """DuckDB mirror of :func:`dup_ngram_stats` (same md5 keys, same
    distinct-doc dup rule, same integer floor division)."""
    m = n - 1
    return (
        "WITH toks AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents), "
        "grams AS (SELECT doc_id, "
        f"md5(unnest([array_to_string(t[i:i+{m}], ' ') "
        f"for i in range(1, greatest(len(t)-{m},0)+1)])) AS fp FROM toks), "
        "gc AS (SELECT doc_id, fp, count(*) AS cnt FROM grams GROUP BY doc_id, fp), "
        "dup AS (SELECT fp FROM gc GROUP BY fp HAVING count(*) > 1), "
        "per AS (SELECT gc.doc_id, CAST(sum(gc.cnt) AS BIGINT) AS n_grams, "
        "CAST(coalesce(sum(gc.cnt) FILTER (WHERE dup.fp IS NOT NULL), 0) AS BIGINT) AS n_dup "
        "FROM gc LEFT JOIN dup ON gc.fp = dup.fp GROUP BY gc.doc_id) "
        "SELECT doc_id, n_grams, n_dup, "
        "(1000000 * n_dup) // greatest(n_grams, 1) AS dup_frac_e6 FROM per"
    )


# --- exact substring-level duplication (Lee et al. 2022 granularity) ---

# two independent 31-bit polynomial rolling-hash schemes; combined key
# is h1 * P2 + h2 < 2^62 so every product/mod stays in int64 (this
# numpy build's uint64 multiply/mod kernels fall back to scalars —
# CLAUDE.md landmine). P1 is the 31-bit Mersenne prime; P2 = 2^31 - 19.
_SS_P1, _SS_B1 = (1 << 31) - 1, 1_000_003
_SS_P2, _SS_B2 = (1 << 31) - 19, 911_382_323
_SS_BINV1 = pow(_SS_B1, _SS_P1 - 2, _SS_P1)
_SS_BINV2 = pow(_SS_B2, _SS_P2 - 2, _SS_P2)
_SS_POWS: dict[tuple[int, int], np.ndarray] = {}


def _ss_pows(b: int, p: int, n: int) -> np.ndarray:
    """b^0..b^(n-1) mod p, grown by doubling (b^(m+i) = b^m * b^i) so
    the whole table is O(log n) vectorized passes; cached per scheme."""
    pows = _SS_POWS.get((b, p))
    if pows is None:
        pows = np.ones(1, np.int64)
    while len(pows) < n:
        factor = (int(pows[-1]) * b) % p
        pows = np.concatenate([pows, (pows * factor) % p])
    _SS_POWS[(b, p)] = pows
    return pows


def _ss_gram_keys(text: str, k: int) -> np.ndarray:
    """Combined 62-bit rolling-hash key for every character k-gram.

    Characters are unicode code points (utf-32), matching SQL
    substr/length semantics. For each scheme, prefix sums of
    c_t * b^-t give F; gram hash h(i) = ((F[i+k]-F[i]) mod p) *
    b^(i+k-1) mod p — all adds fit 2^55, all products 2^62.
    """
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = len(cp)
    m = n - k + 1
    if m <= 0:
        return np.empty(0, np.int64)
    hs = []
    for p, b, binv in (
        (_SS_P1, _SS_B1, _SS_BINV1),
        (_SS_P2, _SS_B2, _SS_BINV2),
    ):
        binv_pows = _ss_pows(binv, p, n)[:n]
        pows = _ss_pows(b, p, n + k)[k - 1 : k - 1 + m]
        terms = (cp % p) * binv_pows % p
        F = np.concatenate([np.zeros(1, np.int64), np.cumsum(terms)])
        hs.append((F[k:] - F[:m]) % p * pows % p)
    return hs[0] * _SS_P2 + hs[1]


def substring_dup_stats(docs_ds, k: int = 32):
    """Exact substring-level duplication signals (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", at
    character k-gram granularity): for every document, how many of its
    character positions start a k-gram that also appears in ANOTHER
    document. This is the signal the span-cutting dedup pass consumes;
    it differs from :func:`dup_ngram_stats` (word grams, md5 string
    keys) by working at character level with O(1)-per-position rolling
    hashes — at 100 TB the shuffle carries one (int64 key, doc_id,
    count) row per distinct gram per doc, never 32-char strings.

    Scale shape: one hash-bucket shuffle computes cross-doc gram
    frequency (rows are per-doc-unique, so a size()>1 group means >= 2
    distinct docs); per-doc partials fold back through a second coarse
    shuffle with adaptive doc buckets. Output: (doc_id, n_pos,
    n_dup_pos, dup_frac_e6) — integer floor division, oracle-exact.
    """
    n_docs = docs_ds.count()
    from doctr_ray.pool import adaptive_buckets

    doc_buckets = adaptive_buckets(n_docs)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, keys, cnts, gbs = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            did = str(did)
            gk = _ss_gram_keys(text or "", k)
            if len(gk) == 0:
                # keep short docs visible downstream with zero counts
                ids.append(did)
                keys.append(np.array([-1], np.int64))
                cnts.append(np.array([0], np.int64))
                continue
            u, c = np.unique(gk, return_counts=True)
            ids.extend([did] * len(u))
            keys.append(u)
            cnts.append(c.astype(np.int64))
        key_arr = np.concatenate(keys) if keys else np.empty(0, np.int64)
        cnt_arr = np.concatenate(cnts) if cnts else np.empty(0, np.int64)
        return pa.Table.from_arrays(
            [
                pa.array((key_arr & (PAIR_BUCKETS - 1)).astype(np.int32), pa.int32()),
                pa.array(key_arr, pa.int64()),
                pa.array(ids, pa.string()),
                pa.array(cnt_arr, pa.int64()),
            ],
            names=["gb", "gkey", "doc_id", "n"],
        )

    def _bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # rows are per-doc-unique -> group size == distinct-doc count
        ndocs = g.groupby("gkey", sort=False)["doc_id"].transform("size")
        dup = (ndocs > 1) & (g["gkey"].to_numpy() != -1)
        g = g.assign(dup_n=np.where(dup, g["n"].to_numpy(), 0))
        out = g.groupby("doc_id", sort=False)[["n", "dup_n"]].sum().reset_index()
        out.columns = ["doc_id", "n_pos", "n_dup_pos"]
        out["db"] = [_md5_bucket(d, doc_buckets) for d in out["doc_id"]]
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("doc_id", sort=False)[["n_pos", "n_dup_pos"]]
            .sum()
            .reset_index()
        )
        n = out["n_pos"].to_numpy(dtype=np.int64)
        d = out["n_dup_pos"].to_numpy(dtype=np.int64)
        out["dup_frac_e6"] = (1_000_000 * d) // np.maximum(n, 1)
        return out

    return (
        docs_ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(_bucket_stats, batch_format="pandas")
        .groupby("db")
        .map_groups(_final, batch_format="pandas")
    )


def substring_dup_sql(k: int = 32) -> str:
    """DuckDB mirror of :func:`substring_dup_stats` (character substr
    grams, distinct-doc dup rule, integer floor division)."""
    m = k - 1
    return (
        "WITH pos AS (SELECT doc_id, "
        f"unnest([substr(text, i, {k}) "
        f"for i in range(1, greatest(length(text) - {m}, 0) + 1)]) AS g "
        "FROM documents), "
        "per AS (SELECT doc_id, g, count(*) AS c FROM pos GROUP BY doc_id, g), "
        "dup AS (SELECT g FROM per GROUP BY g HAVING count(*) > 1), "
        "stats AS (SELECT per.doc_id, CAST(sum(per.c) AS BIGINT) AS n_pos, "
        "CAST(coalesce(sum(per.c) FILTER (WHERE dup.g IS NOT NULL), 0) AS BIGINT) "
        "AS n_dup_pos FROM per LEFT JOIN dup ON per.g = dup.g GROUP BY per.doc_id) "
        "SELECT CAST(d.doc_id AS VARCHAR) AS doc_id, "
        "CAST(coalesce(s.n_pos, 0) AS BIGINT) AS n_pos, "
        "CAST(coalesce(s.n_dup_pos, 0) AS BIGINT) AS n_dup_pos, "
        "(1000000 * CAST(coalesce(s.n_dup_pos, 0) AS BIGINT)) "
        "// greatest(CAST(coalesce(s.n_pos, 0) AS BIGINT), 1) AS dup_frac_e6 "
        "FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id"
    )


def source_overlap(sf_dir: str, n: int = 8):
    """Pairwise cross-source n-gram contamination matrix (the corpus
    audit shape behind "which crawl snapshots mirror each other"): for
    every unordered source pair, the number of DISTINCT word n-grams
    present in both sources.

    Scale shape: per-batch explode to distinct (gram-md5, source-id)
    rows — grams hash to 16-byte keys before anything moves, raw text
    never shuffles; ONE gram-bucket shuffle gives each reducer complete
    source membership for its grams, which it collapses to a presence
    BITMASK histogram (one int64 row per distinct source combination —
    thousands of grams become tens of rows); the final combine turns
    the merged histogram into pair counts with one vectorized bit-test
    per source pair. Packing presence into int64 bounds this
    implementation at 63 sources — beyond that the mask needs multiple
    words (explicit error, no silent truncation).
    """
    from doctr_ray.functions.relational import read_table
    from doctr_ray.pool import adaptive_buckets

    def _src_partial(batch: pa.Table) -> pa.Table:
        u = pd.unique(batch["source"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"source": list(u)})

    sources = sorted(
        set(
            read_table(sf_dir, "documents", ["source"])
            .map_batches(_src_partial, batch_format="pyarrow")
            .to_pandas()["source"]
        )
    )
    if len(sources) > 63:
        raise NotImplementedError(
            f"{len(sources)} sources exceed the 63-bit presence mask; "
            "extend source_overlap to multi-word masks"
        )
    src_id = {s: i for i, s in enumerate(sources)}

    docs_ds = read_table(sf_dir, "documents", ["text", "source"])
    n_docs = docs_ds.count()
    # grams/doc ~ tokens; ~500 docs/reducer keeps bucket frames small
    buckets = adaptive_buckets(n_docs, rows_per_bucket=500)
    m = n - 1

    def _explode(batch: pa.Table) -> pa.Table:
        fps: list[str] = []
        sids: list[int] = []
        gbs: list[int] = []
        seen: set[tuple[str, int]] = set()
        for src, text in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            sid = src_id[src]
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(max(0, len(toks) - m)):
                h = hashlib.md5(" ".join(toks[i : i + n]).encode("utf-8")).hexdigest()
                if (h, sid) in seen:
                    continue
                seen.add((h, sid))
                fps.append(h)
                sids.append(sid)
                gbs.append(int(h[:8], 16) % buckets)
        return pa.Table.from_pydict(
            {
                "gb": pa.array(gbs, pa.int32()),
                "fp": pa.array(fps, pa.string()),
                "sid": pa.array(sids, pa.int8()),
            }
        )

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["fp", "sid"])
        bits = np.int64(1) << g["sid"].to_numpy().astype(np.int64)
        masks = pd.DataFrame({"fp": g["fp"], "bit": bits}).groupby("fp", sort=False)[
            "bit"
        ].sum()  # distinct (fp, sid) -> sum == OR
        hist = masks.value_counts()
        out = pd.DataFrame(
            {"mask": hist.index.to_numpy(np.int64), "cnt": hist.to_numpy(np.int64)}
        )
        out["z"] = 0
        return out

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("mask", as_index=False)["cnt"].sum()
        masks = h["mask"].to_numpy(np.int64)
        cnt = h["cnt"].to_numpy(np.int64)
        rows_a, rows_b, rows_n = [], [], []
        for i in range(len(sources)):
            for j in range(i + 1, len(sources)):
                both = ((masks >> i) & (masks >> j) & 1).astype(bool)
                c = int(cnt[both].sum())
                if c:
                    rows_a.append(sources[i])
                    rows_b.append(sources[j])
                    rows_n.append(c)
        return pd.DataFrame(
            {
                "src_a": rows_a,
                "src_b": rows_b,
                "shared_grams": np.asarray(rows_n, np.int64),
            }
        )

    return (
        docs_ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(_bucket, batch_format="pandas")
        .groupby("z")
        .map_groups(_final, batch_format="pandas")
    )


def source_overlap_sql(n: int = 8) -> str:
    """DuckDB mirror of :func:`source_overlap` (same md5 gram keys)."""
    m = n - 1
    return (
        "WITH toks AS (SELECT source, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents), "
        "grams AS (SELECT DISTINCT source, "
        f"md5(unnest([array_to_string(t[i:i+{m}], ' ') "
        f"for i in range(1, greatest(len(t)-{m},0)+1)])) AS fp FROM toks) "
        "SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_grams "
        "FROM grams a JOIN grams b ON a.fp = b.fp AND a.source < b.source "
        "GROUP BY src_a, src_b"
    )


def winnow_fingerprints(docs_ds, k: int = 4, w: int = 5):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): per document, slide a ``w``-wide
    window over the word ``k``-gram hash sequence and select each
    window's minimum; the distinct selected (hash, position) pairs are
    the fingerprint sketch, guaranteeing any shared run of >= w+k-1
    words between two documents shares at least one fingerprint.

    Determinism across engines: the selection key is the fixed-width
    string ``md5hex || zero-padded-position``, so lexicographic MIN is
    exactly the (hash, leftmost-position) rule — the one total order a
    SQL ``min() OVER`` window reproduces (classic winnowing prefers the
    RIGHTMOST tie; leftmost is equally valid and is pinned here).
    Documents shorter than one full window select their single global
    minimum; documents with zero k-grams are dropped on both engines.

    Scale shape: zero shuffle — the sketch is a per-document map
    (grams never leave the batch); output is one bounded row per doc
    (count + an order-insensitive md5 digest of the sorted selected
    keys), the downstream join key for plagiarism / near-dup lookup.
    """

    def _winnow(batch: pa.Table) -> pa.Table:
        ids_out, n_grams_out, n_sel_out, dig_out = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = [t for t in (text or "").split(" ") if t]
            n = max(0, len(toks) - k + 1)
            if n == 0:
                continue
            keys = [
                hashlib.md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()
                + f"{i + 1:012d}"
                for i in range(n)
            ]
            if n <= w:
                sel = {min(keys)}
            else:
                # monotonic deque sliding-window minimum: O(n)
                from collections import deque

                dq: deque[int] = deque()
                sel = set()
                for i, key in enumerate(keys):
                    while dq and keys[dq[-1]] >= key:
                        # >= keeps the LEFTMOST minimum on ties: an
                        # equal later key must not displace an earlier
                        # one, so only strictly-greater tails pop...
                        # but a LATER equal key would then never win;
                        # lexicographic keys are unique (position
                        # suffix), so plain > vs >= cannot tie anyway
                        dq.pop()
                    dq.append(i)
                    if dq[0] <= i - w:
                        dq.popleft()
                    if i >= w - 1:
                        sel.add(keys[dq[0]])
            ids_out.append(did)
            n_grams_out.append(n)
            n_sel_out.append(len(sel))
            dig_out.append(
                hashlib.md5(",".join(sorted(sel)).encode("utf-8")).hexdigest()
            )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_grams": pa.array(n_grams_out, pa.int64()),
                "n_selected": pa.array(n_sel_out, pa.int64()),
                "fp_digest": pa.array(dig_out, pa.string()),
            }
        )

    return docs_ds.map_batches(_winnow, batch_format="pyarrow")


def winnow_fingerprints_sql(k: int = 4, w: int = 5) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints` (same md5 keys,
    same fixed-width position suffix, same short-doc rule)."""
    m = k - 1
    return (
        "WITH toks AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents), "
        "grams AS (SELECT doc_id, pos, "
        f"md5(array_to_string(t[pos:pos+{m}], ' ')) || "
        "lpad(CAST(pos AS VARCHAR), 12, '0') AS key FROM ("
        "SELECT doc_id, t, unnest(range(1, "
        f"greatest(len(t)-{m},0)+1)) AS pos FROM toks)), "
        "wins AS (SELECT doc_id, pos, key, "
        "count(*) OVER (PARTITION BY doc_id) AS n_grams, "
        "min(key) OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS sel FROM grams), "
        f"sels AS (SELECT DISTINCT doc_id, n_grams, sel FROM wins "
        f"WHERE pos >= least({w}, n_grams)) "
        "SELECT doc_id, CAST(any_value(n_grams) AS BIGINT) AS n_grams, "
        "count(*) AS n_selected, "
        "md5(string_agg(sel, ',' ORDER BY sel)) AS fp_digest "
        "FROM sels GROUP BY doc_id"
    )


def semdedup(
    embeddings_ds,
    threshold_num: int = 7,
    threshold_den: int = 20,
    n_planes: int = 6,
    quant: int = 1024,
    dim: int = 64,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embedding space, then drop all but one
    representative of each within-cluster near-duplicate group.

    Ray-Data shape and exactness:

    - ONE ``map_batches`` pass QUANTIZES each vector to int64
      (``floor(x * quant)`` — float32->double and the multiply are
      bit-identical in numpy and DuckDB, so the whole operator is
      integer-exact end-to-end with no float-ulp hazard) and buckets
      it by deterministic small-integer hyperplanes (the
      SQL-expressible stand-in for the paper's k-means clusters; the
      k-means variant lives in similarity.kmeans_embeddings /
      ``embedding_clusters``).
    - ONE ``groupby(bucket)`` shuffle of (vec_id, bucket, quantized
      vector) rows — vectors never co-locate beyond their bucket.
    - Within each bucket a vectorized int64 Gram matrix applies the
      integer gate  ``dot > 0 AND den^2 * dot^2 >= num^2 * |a|^2 *
      |b|^2``  (the exact integer form of cosine >= num/den on the
      quantized vectors) and a vector is KEPT iff no lower-id vector
      in its bucket gates against it (keep-first dominance — the
      deterministic analog of the paper's keep-one-per-group).

    Emits (vec_id, bucket, keep). With unit-norm inputs, quant=1024
    and dim=64 every intermediate fits int64 with >500x margin.
    """
    import numpy as np

    planes = (
        (
            np.arange(n_planes)[:, None] * 131
            + np.arange(dim)[None, :] * 31
            + 7
        )
        % 19
        - 9
    ).astype(np.int64)

    def _bucket(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        q = np.floor(emb * quant).astype(np.int64)
        signs = (q @ planes.T) > 0
        buckets = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(
                    [int(v) for v in batch["vec_id"].to_pylist()], pa.int64()
                ),
                "bucket": pa.array(buckets, pa.int64()),
                "q": [v.tobytes() for v in q],
            }
        )

    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den

    def _keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        q = np.stack([np.frombuffer(b, dtype=np.int64) for b in g["q"]])
        gram = q @ q.T
        n2 = np.diag(gram)
        gate = (gram > 0) & (
            den2 * gram * gram >= num2 * n2[:, None] * n2[None, :]
        )
        # keep[i] iff no lower-id vector gates against i
        dominated = np.triu(gate, 1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "bucket": g["bucket"].to_numpy(),
                "keep": (~dominated).astype(np.int64),
            }
        )

    return (
        embeddings_ds.map_batches(
            _bucket, batch_format="pyarrow", batch_size=4096
        )
        .groupby("bucket")
        .map_groups(_keep, batch_format="pandas")
    )
