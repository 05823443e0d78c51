"""Mergeable sketches: HyperLogLog distinct counts and Count-Min
heavy-hitter estimation.

The 100-TB pattern these demonstrate: per-batch state that is FIXED
SIZE regardless of data volume (an HLL register file, a d x width
count matrix), merged associatively — the shuffle moves kilobytes of
sketch partials, never tokens. Both sketches are deterministic given
the md5-derived hash (``md5_number_upper`` in DuckDB == little-endian
first 8 bytes of md5 here, the same bridge dedup.py's SimHash oracle
uses), so the oracle reproduces the EXACT register / counter values in
SQL — the sketch itself is integer-exact even though the cardinality
estimate it implies is approximate.

Reference scope note: the reference engine (mindee/doctr) has no
sketches; these are the training-data-pipeline operators the brief
adds as first-class components.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

_W48 = np.int64((1 << 48) - 1)


@lru_cache(maxsize=1 << 20)
def _h64(s: str) -> int:
    """md5_number_upper analog: little-endian first 8 md5 bytes."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _bitlen_vec(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (no float log — CLAUDE.md
    int-domain invariant), six shift passes."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.int64(1) << np.int64(s))
        bl[m] += s
        v[m] >>= np.int64(s)
    bl += (v > 0).astype(np.int64)
    return bl


def hll_registers(docs_ds, group_col: str = "source", b: int = 12):
    """Per-group HyperLogLog register file over whitespace tokens:
    one row per non-empty register ``(group, reg, max_rho)``.

    Hash domain is the top 60 bits of the 64-bit md5 hash (shifted
    right 4 so the value is int64-safe on both engines): register =
    top ``b`` bits, rho = leading-zero run of the remaining ``60-b``
    bits + 1. Per-batch partials collapse to <= (groups x m) register
    rows; the final merge groups by the group column (group count is
    small by construction — registers, not data, are the state).
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    shift = np.int64(60 - b)
    wmask = np.int64((1 << (60 - b)) - 1)

    def _partial(batch: pa.Table) -> pa.Table:
        groups: list = []
        toks: list[str] = []
        for g, t in zip(batch[group_col].to_pylist(), batch["text"].to_pylist()):
            for tok in (t or "").split(" "):
                if tok:
                    groups.append(g)
                    toks.append(tok)
        if not toks:
            return pa.table(
                {group_col: pa.array([], pa.string()),
                 "reg": pa.array([], pa.int64()),
                 "max_rho": pa.array([], pa.int64())}
            )
        # hash each DISTINCT token once (cached md5), then gather
        uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        uh = np.array([_h64(t) >> 4 for t in uniq], np.int64)
        h = uh[inv]
        reg = h >> shift
        w = h & wmask
        rho = np.where(w > 0, (60 - b) - _bitlen_vec(w) + 1, 60 - b + 1)
        df = pd.DataFrame({group_col: groups, "reg": reg, "rho": rho})
        out = df.groupby([group_col, "reg"], sort=False)["rho"].max().reset_index()
        return pa.table(
            {group_col: pa.array(out[group_col]),
             "reg": pa.array(out["reg"].to_numpy(np.int64), pa.int64()),
             "max_rho": pa.array(out["rho"].to_numpy(np.int64), pa.int64())}
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("reg", sort=True)
            .agg({group_col: "first", "max_rho": "max"})
            .reset_index()
        )
        return out[[group_col, "reg", "max_rho"]].astype(
            {"reg": np.int64, "max_rho": np.int64}
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(_merge, batch_format="pandas")
    )


def hll_registers_sql(group_col: str = "source", b: int = 12,
                      table: str = "documents") -> str:
    """DuckDB mirror: identical register/rho arithmetic; bit length via
    ``length(ltrim(bin(w), '0'))`` (string-exact, no float log2)."""
    wmask = (1 << (60 - b)) - 1
    return (
        f"WITH t AS (SELECT {group_col}, unnest(string_split(text, ' ')) AS tok "
        f"FROM {table}), "
        f"h AS (SELECT {group_col}, CAST(md5_number_upper(tok) >> 4 AS BIGINT) AS h "
        "FROM t WHERE tok <> ''), "
        f"r AS (SELECT {group_col}, h >> {60 - b} AS reg, "
        f"CASE WHEN (h & {wmask}) = 0 THEN {60 - b + 1} "
        f"ELSE {60 - b} - length(ltrim(bin(h & {wmask}), '0')) + 1 END AS rho FROM h) "
        f"SELECT {group_col}, CAST(reg AS BIGINT) AS reg, "
        f"CAST(max(rho) AS BIGINT) AS max_rho FROM r GROUP BY {group_col}, reg"
    )


def hll_estimate(register_rows: pd.DataFrame, b: int = 12) -> dict[str, float]:
    """Cardinality estimate per group from a register-file frame
    (columns: group, reg, max_rho) — the classic HLL formula with
    small-range (linear counting) correction. Exactness of the
    REGISTERS is driver-gated; the estimate itself is tested against
    true distinct counts in pytest (approximate by construction)."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    out: dict[str, float] = {}
    gcol = register_rows.columns[0]
    for g, rows in register_rows.groupby(gcol):
        regs = np.zeros(m, np.int64)
        regs[rows["reg"].to_numpy(np.int64)] = rows["max_rho"].to_numpy(np.int64)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[g] = float(est)
    return out


def cms_top_tokens(docs_ds, k: int = 20, d: int = 4, width: int = 2048,
                   rows_hint: int | None = None):
    """Count-Min-Sketch heavy hitters: the corpus's true top-k tokens
    with their exact count and their CMS estimate ``(token, n_true,
    n_cms)`` — n_cms >= n_true always (one-sided error), equality when
    no collision.

    ONE corpus pass emits two kinds of tagged partial rows per batch:
    the batch's d x width CMS cells (bounded, fixed size) and the
    batch's per-token counts. One coarse shuffle merges both: CMS
    groups (key 0..d-1) bincount-combine; token groups (key d + hash
    % n_buckets) sum and keep a per-group top-k partial (a global
    top-k token is necessarily a within-group top-k of its hash
    group). A single final task picks the global top-k and probes the
    merged sketch.
    """
    from doctr_ray.pool import adaptive_buckets

    n_tok_buckets = adaptive_buckets(rows_hint or 0)

    def _partial(batch: pa.Table) -> pa.Table:
        import collections

        c: collections.Counter = collections.Counter()
        for t in batch["text"].to_pylist():
            c.update((t or "").split(" "))
        c.pop("", None)
        toks = list(c.keys())
        cnts = np.fromiter(c.values(), np.int64, len(toks))
        sketch = np.zeros((d, width), np.int64)
        for i in range(d):
            buckets = np.array([_h64(f"{t}|cms{i}") % width for t in toks], np.int64)
            np.add.at(sketch[i], buckets, cnts)
        rows, cols = np.nonzero(sketch)
        tok_keys = np.array(
            [d + _h64(f"{t}|cmsg") % n_tok_buckets for t in toks], np.int64
        )
        return pa.table(
            {
                "gk": pa.array(
                    np.concatenate([rows.astype(np.int64), tok_keys]), pa.int64()
                ),
                "bucket": pa.array(
                    np.concatenate([cols.astype(np.int64), np.full(len(toks), -1)]),
                    pa.int64(),
                ),
                "token": pa.array([""] * len(rows) + toks, pa.string()),
                "n": pa.array(
                    np.concatenate([sketch[rows, cols], cnts]), pa.int64()
                ),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        gk = int(g["gk"].iloc[0])
        if gk < d:  # CMS row group: bincount over this hash row's cells
            cells = np.zeros(width, np.int64)
            np.add.at(cells, g["bucket"].to_numpy(np.int64), g["n"].to_numpy(np.int64))
            nz = np.nonzero(cells)[0]
            return pd.DataFrame(
                {"gk": gk, "bucket": nz, "token": "", "n": cells[nz]}
            )
        out = g.groupby("token", sort=False)["n"].sum().reset_index()
        out = out.sort_values(["n", "token"], ascending=[False, True], kind="stable")
        out = out.head(k).copy()
        out["gk"] = gk
        out["bucket"] = np.int64(-1)
        return out[["gk", "bucket", "token", "n"]]

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sketch = np.zeros((d, width), np.int64)
        cms = df[df["gk"] < d]
        sketch[cms["gk"].to_numpy(np.int64), cms["bucket"].to_numpy(np.int64)] = (
            cms["n"].to_numpy(np.int64)
        )
        tok = df[df["gk"] >= d].sort_values(
            ["n", "token"], ascending=[False, True], kind="stable"
        ).head(k)
        toks = tok["token"].tolist()
        est = np.full(len(toks), np.iinfo(np.int64).max)
        for i in range(d):
            b = np.array([_h64(f"{t}|cms{i}") % width for t in toks], np.int64)
            est = np.minimum(est, sketch[i, b])
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n_true": pa.array(tok["n"].to_numpy(np.int64), pa.int64()),
                "n_cms": pa.array(est, pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(_merge, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def cms_top_tokens_sql(k: int = 20, d: int = 4, width: int = 2048,
                       table: str = "documents") -> str:
    """DuckDB mirror: the full sketch from global token counts, then
    min-over-rows probes for the true top-k."""
    return (
        f"WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM {table}), "
        "tc AS (SELECT tok, count(*) AS n FROM t WHERE tok <> '' GROUP BY tok), "
        f"topk AS (SELECT tok, n FROM tc ORDER BY n DESC, tok LIMIT {k}), "
        "buck AS (SELECT i, "
        f"CAST(md5_number_upper(tok || '|cms' || i) % {width} AS BIGINT) AS b, n "
        f"FROM tc CROSS JOIN generate_series(0, {d - 1}) s(i)), "
        "sk AS (SELECT i, b, sum(n) AS cnt FROM buck GROUP BY i, b), "
        "probe AS (SELECT tok, i, "
        f"CAST(md5_number_upper(tok || '|cms' || i) % {width} AS BIGINT) AS b "
        f"FROM topk CROSS JOIN generate_series(0, {d - 1}) s(i)) "
        "SELECT topk.tok AS token, CAST(topk.n AS BIGINT) AS n_true, "
        "CAST(min(sk.cnt) AS BIGINT) AS n_cms "
        "FROM topk JOIN probe ON topk.tok = probe.tok "
        "JOIN sk ON sk.i = probe.i AND sk.b = probe.b "
        "GROUP BY topk.tok, topk.n"
    )


def source_distinct_tokens(docs_ds, group_col: str = "source",
                           rows_hint: int | None = None):
    """EXACT distinct-token count per group — the precise counterpart
    to :func:`hll_registers` (same question, exact answer, linear
    shuffle cost; the pairing shows the classic sketch-vs-exact
    trade-off). Per-batch partials collapse to distinct
    (group, token-hash) int64 pairs — raw tokens never shuffle — and
    one adaptive hash-bucket reduce counts distinct pairs per group
    (a (group, hash) pair lives wholly in one bucket, so per-bucket
    distinct counts sum exactly). Output: ``(group, n_distinct)``.
    """
    from doctr_ray.pool import adaptive_buckets

    n_b = adaptive_buckets(rows_hint or 0)

    def _partial(batch: pa.Table) -> pa.Table:
        pairs: set = set()
        for g, t in zip(batch[group_col].to_pylist(), batch["text"].to_pylist()):
            for tok in (t or "").split(" "):
                if tok:
                    pairs.add((g, _h64(tok)))
        gs = [p[0] for p in pairs]
        hs = np.fromiter((p[1] for p in pairs), np.uint64, len(pairs)).astype(
            np.int64
        )
        return pa.table(
            {
                "hb": pa.array((hs % n_b).astype(np.int32), pa.int32()),
                group_col: pa.array(gs, pa.string()),
                "h": pa.array(hs, pa.int64()),
            }
        )

    def _count(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates([group_col, "h"])
            .groupby(group_col, sort=False)
            .size()
            .reset_index(name="n_distinct")
        )
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    def _final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(group_col, sort=True)["n_distinct"].sum().reset_index()
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(_count, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pyarrow", batch_size=None)
    )


def source_distinct_tokens_sql(group_col: str = "source",
                               table: str = "documents") -> str:
    """DuckDB mirror: COUNT(DISTINCT token) per group (distinct md5
    hashes == distinct tokens short of an md5 collision — counted on
    tokens directly here, which is the same set)."""
    return (
        f"WITH t AS (SELECT {group_col}, unnest(string_split(text, ' ')) AS tok "
        f"FROM {table}) "
        f"SELECT {group_col}, count(DISTINCT tok) AS n_distinct FROM t "
        f"WHERE tok <> '' GROUP BY {group_col}"
    )
