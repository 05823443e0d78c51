"""Text-analysis, dedup, and similarity operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.functions.dedup import (
    MinHasher,
    exact_dedup_groups,
    exact_dedup_keep_first,
    minhash_near_dups,
    ngram_jaccard,
    shingles,
    simhash64,
    simhash_near_dups,
)
from doctr_ray.functions.similarity import ann_topk, ann_topk_lsh
from doctr_ray.functions.text import fingerprint, lang_id, quality_score, token_stats


def _docs_table(rows):
    return pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )


# --------------------------------------------------------------- text fns

def test_token_stats():
    t = _docs_table([(1, "a bb ccc"), (2, "hello")])
    out = token_stats(t).to_pydict()
    assert out["n_tokens"] == [3, 1]
    assert out["n_chars"] == [8, 5]
    assert out["avg_token_len_e6"] == [2_000_000, 5_000_000]


def test_quality_score():
    t = _docs_table([(1, "the a to xx yyy"), (2, "wonderful documents")])
    out = quality_score(t).to_pandas()
    assert out["stopword_ratio_e6"].tolist() == [600_000, 0]
    assert out["short_token_ratio_e6"].tolist() == [600_000, 0]  # a, to, xx
    assert out["quality_e6"].tolist() == [400_000, 1_000_000]


def test_lang_id():
    t = _docs_table(
        [
            (1, "the value of the row"),
            (2, "und der das"),
            (3, "xyz qqq"),
            (4, "le les une des"),
        ]
    )
    out = lang_id(t).to_pandas()
    assert out["pred_lang"].tolist() == ["en", "de", "und", "fr"]


def test_fingerprint_matches_md5():
    import hashlib

    t = _docs_table([(1, "abc")])
    out = fingerprint(t)
    assert out["fp"][0] == hashlib.md5(b"abc").hexdigest()


# --------------------------------------------------------------- dedup

def test_shingles_and_jaccard():
    assert shingles("a b c d", 3) == ["a b c", "b c d"]
    assert shingles("a b", 3) == ["a b"]
    assert shingles("", 3) == []
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c", "x y z") == 0.0


def test_exact_dedup(ray_session):
    rows = [(1, "same text here"), (2, "same text here"), (3, "unique text")]
    ds = rd.from_arrow(_docs_table(rows))
    groups = exact_dedup_groups(ds).to_pandas()
    assert len(groups) == 2
    dup = groups[groups["n_dups"] == 2].iloc[0]
    assert dup["keeper_id"] == 1
    kept = exact_dedup_keep_first(ds).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]


def test_minhash_signature_similarity():
    mh = MinHasher(num_perm=128)
    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(48)) + " other words"
    far = " ".join(f"zzz{i}" for i in range(50))
    s1, s2, s3 = mh.signature(base), mh.signature(near), mh.signature(far)
    sim_near = (s1 == s2).mean()
    sim_far = (s1 == s3).mean()
    assert sim_near > 0.6 > sim_far


def test_minhash_near_dups_finds_planted_pair(ray_session):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base + " extra"
    rows = [(1, base), (2, near)] + [
        (10 + i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(8)
    ]
    ds = rd.from_arrow(_docs_table(rows))
    out = minhash_near_dups(ds, threshold=0.8).to_pandas()
    assert {(1, 2)} == set(zip(out["a"], out["b"]))
    assert (out["jaccard_e6"] >= 800000).all()


def test_jaccard_exact_guard(ray_session):
    # the O(n^2) ground-truth operator must REFUSE oversized corpora
    # (driver-side shingle-set materialization) rather than sample
    import pytest

    from doctr_ray.functions.dedup import jaccard_pairs_exact

    rows = [(i, f"doc {i} words here") for i in range(10)]
    ds = rd.from_arrow(_docs_table(rows))
    with pytest.raises(ValueError, match="max_docs=5"):
        jaccard_pairs_exact(ds, max_docs=5)
    # at/below the bound it still runs
    out = jaccard_pairs_exact(ds, threshold=0.99, max_docs=10).to_pandas()
    assert len(out) == 0


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely different content entirely unrelated words")
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(a, b) < ham(a, c)
    assert simhash64("") == 0
    assert simhash64("stable words") == simhash64("stable words")


def test_simhash_near_dups(ray_session):
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [(1, base), (2, base + " tiny change")] + [
        (10 + i, " ".join(f"q{i}r{j}" for j in range(30))) for i in range(6)
    ]
    ds = rd.from_arrow(_docs_table(rows))
    out = simhash_near_dups(ds, max_hamming=6).to_pandas()
    assert (1, 2) in set(zip(out["a"], out["b"]))


# --------------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((100, 16))
    return pa.Table.from_pydict(
        {
            "vec_id": list(range(100)),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    ), vecs


def test_ann_topk_exact(ray_session, emb_table):
    table, vecs = emb_table
    queries = {0: vecs[0], 7: vecs[7]}
    out = ann_topk(rd.from_arrow(table), queries, k=5).to_pandas()
    for qid, q in queries.items():
        got = out[out["query_id"] == qid].sort_values("rank")
        sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
        # numpy brute force reference (same fixed-point micro-units)
        order = sorted(range(100), key=lambda i: (-round(sims[i] * 1e6), i))[:5]
        assert got["vec_id"].tolist() == order
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]
        assert got.iloc[0]["vec_id"] == qid and got.iloc[0]["cosine_e6"] == 1_000_000


def test_ann_topk_filtered_semi_join(ray_session, emb_table):
    from doctr_ray.functions.similarity import ann_topk_filtered

    table, vecs = emb_table
    queries = {0: vecs[0]}
    allowed_ids = [i for i in range(100) if i % 3 == 0]
    allowed = rd.from_arrow(pa.table({"doc_id": allowed_ids}))
    out = ann_topk_filtered(
        rd.from_arrow(table), allowed, queries, k=5, rows_hint=100
    ).to_pandas().sort_values("rank")
    # only gated vectors may appear, ranked exactly as numpy brute force
    assert set(out["vec_id"]) <= set(allowed_ids)
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (
        vecs[0] / np.linalg.norm(vecs[0])
    )
    order = sorted(allowed_ids, key=lambda i: (-round(sims[i] * 1e6), i))[:5]
    assert out["vec_id"].tolist() == order
    # block layout does not change the result
    out2 = ann_topk_filtered(
        rd.from_arrow(table).repartition(7),
        allowed.repartition(3),
        queries,
        k=5,
        rows_hint=100,
    ).to_pandas().sort_values("rank")
    assert out2["vec_id"].tolist() == order


def test_ann_topk_lsh_recall(ray_session, emb_table):
    table, vecs = emb_table
    queries = {0: vecs[0], 5: vecs[5], 9: vecs[9]}
    exact = ann_topk(rd.from_arrow(table), queries, k=5).to_pandas()
    approx = ann_topk_lsh(
        rd.from_arrow(table), queries, k=5, dim=16, n_planes=4
    ).to_pandas()
    # the query vector itself always lands in its own bucket -> rank 1
    for qid in queries:
        g = approx[approx["query_id"] == qid].sort_values("rank")
        assert len(g) >= 1 and g.iloc[0]["vec_id"] == qid
    # recall against exact top-5
    hits = total = 0
    for qid in queries:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.2  # bucketing trades recall for pruning


def test_get_language():
    from doctr_ray.functions.text import get_language

    lang, conf = get_language("the value of the row")
    assert lang == "en" and conf > 0.5
    assert get_language("xyz qqq")[0] == "und"


def test_ann_topk_ivf_recall(ray_session, emb_table):
    from doctr_ray.functions.similarity import ann_topk_ivf

    table, vecs = emb_table
    queries = {0: vecs[0], 5: vecs[5], 9: vecs[9]}
    exact = ann_topk(rd.from_arrow(table), queries, k=5).to_pandas()
    approx = ann_topk_ivf(
        rd.from_arrow(table), queries, k=5, n_centroids=8, n_probe=4
    ).to_pandas()
    hits = total = 0
    for qid in queries:
        g = approx[approx["query_id"] == qid].sort_values("rank")
        assert g.iloc[0]["vec_id"] == qid  # own cell always probed
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        hits += len(e & set(g["vec_id"]))
        total += len(e)
    assert hits / total >= 0.5  # probing half the cells


def test_repetition_stats():
    import pyarrow as pa

    from doctr_ray.functions.text import repetition_stats

    t = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [
                "x y x y x y",          # 5 bigrams; 'x y' appears 3x; 2/6 distinct
                "one two three four",   # all distinct
                "",                      # empty
                "solo",                  # single token: 0 bigrams
            ],
        }
    )
    out = repetition_stats(t).to_pandas().set_index("doc_id")
    assert out.loc["a", "n_bigrams"] == 5
    assert out.loc["a", "top_bigram_n"] == 3
    assert out.loc["a", "ttr_e6"] == round(2 * 1e6 / 6)
    assert out.loc["b", "top_bigram_n"] == 1
    assert out.loc["b", "ttr_e6"] == 1_000_000
    assert out.loc["c", "n_bigrams"] == 0 and out.loc["c", "ttr_e6"] == 0
    assert out.loc["d", "n_bigrams"] == 0 and out.loc["d", "top_bigram_n"] == 0
    assert out.loc["d", "ttr_e6"] == 1_000_000


def test_kmeans_embeddings_matches_numpy_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.similarity import kmeans_embeddings

    rng = np.random.default_rng(7)
    # three well-separated blobs, INTERLEAVED so the deterministic init
    # (k lexicographically smallest vec_ids) lands one seed per blob
    raw = [rng.normal(c, 0.05, (20, 4)) for c in ((0, 0, 0, 0), (5, 5, 5, 5), (-5, 5, -5, 5))]
    blobs = np.stack([raw[i % 3][i // 3] for i in range(60)])
    ids = list(range(len(blobs)))
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in blobs]})
    ).repartition(4)

    assigns_ds, C = kmeans_embeddings(ds, k=3, iters=20)
    out = assigns_ds.to_pandas().sort_values("vec_id")

    # driver-side reference: identical init (k smallest vec_ids) + Lloyd
    Cr = blobs[:3].astype(np.float64).copy()
    for _ in range(20):
        d2 = ((blobs[:, None, :] - Cr[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        newC = Cr.copy()
        for j in range(3):
            if (a == j).any():
                newC[j] = blobs[a == j].mean(axis=0)
        if np.abs(newC - Cr).max() < 1e-6:
            Cr = newC
            break
        Cr = newC
    d2 = ((blobs[:, None, :] - Cr[None, :, :]) ** 2).sum(axis=2)
    ref_assign = d2.argmin(axis=1)

    assert np.allclose(C, Cr, atol=1e-9)
    assert list(out["cluster"]) == list(ref_assign)
    # blob membership: each true (interleaved) blob maps to ONE cluster
    clusters = out["cluster"].to_numpy()
    for r in range(3):
        assert len(set(clusters[r::3])) == 1, r


def test_kmeans_deterministic_across_partitionings(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.similarity import kmeans_embeddings

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (40, 3))
    t = pa.table({"vec_id": list(range(40)), "embedding": [list(map(float, v)) for v in vecs]})
    a1, c1 = kmeans_embeddings(rd.from_arrow(t).repartition(2), k=4, iters=5)
    a2, c2 = kmeans_embeddings(rd.from_arrow(t).repartition(7), k=4, iters=5)
    assert np.allclose(c1, c2, atol=1e-9)
    p1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    p2 = a2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert list(p1["cluster"]) == list(p2["cluster"])


def test_top_customers_plan_has_no_global_sort(ray_session):
    # round-2 verdict: top-20 must be partial top-k + final combine, not
    # an all-to-all sort of every per-customer aggregate row
    from doctr_ray.functions.relational import top_customer_revenue

    ds = top_customer_revenue("/root/testdata/sf0.001")
    # exactly ONE all-to-all: the coarse custkey-bucket groupby (Ray
    # implements groupby as a sort shuffle). The top-k itself adds no
    # global Sort — per-bucket partial top-k + one final combine.
    assert repr(ds).count("Sort") == 1
    out = ds.to_pandas()
    assert len(out) == 20
    assert (out["revenue_c"].to_numpy()[:-1] >= out["revenue_c"].to_numpy()[1:]).all()


def test_bucket_mask_adapts_to_table_size():
    from doctr_ray.functions.relational import bucket_mask_for

    # tiny table -> single bucket; shrinking rows_per_bucket grows the
    # mask (power-of-two minus one), never a fixed constant
    small = bucket_mask_for("/root/testdata/sf0.001", "events")
    fine = bucket_mask_for("/root/testdata/sf0.001", "events", rows_per_bucket=100)
    finer = bucket_mask_for("/root/testdata/sf0.001", "events", rows_per_bucket=10)
    assert small <= fine <= finer
    for m in (small, fine, finer):
        assert (m + 1) & m == 0  # power of two


def test_assembly_buckets_adapt():
    from doctr_ray.pipelines.ocr import assembly_buckets_for

    assert assembly_buckets_for(0) == 1
    assert assembly_buckets_for(100) == 1
    assert assembly_buckets_for(100_000) > 64  # old fixed constant
    assert assembly_buckets_for(10_000_000) > assembly_buckets_for(100_000)


def test_minhash_bucket_cap_is_surfaced(ray_session):
    # no-silent-caps: a boilerplate LSH bucket beyond MAX_BUCKET(=256)
    # drops pairs but must SAY so — n_bucket carries the pre-cap size
    import ray

    from doctr_ray.functions.dedup import minhash_candidate_pairs

    n = 300
    t = pa.table(
        {
            "doc_id": [f"d{i:04d}" for i in range(n)],
            "text": ["the same boilerplate line repeated here"] * n,
        }
    )
    pairs = minhash_candidate_pairs(ray.data.from_arrow(t)).to_pandas()
    assert "n_bucket" in pairs.columns
    assert pairs["n_bucket"].max() == n  # pre-cap size, not the capped 256
    assert len(pairs) == 256 * 255 // 2  # capped pair set


def test_lang_id_rtl_breadth_matches_oracle():
    """The marker table now covers the reference's RTL language set
    (reading_order/base.py:33); engine argmax and the GENERATED SQL
    CASE must agree on native-script texts."""
    import duckdb

    import __ray_entry__ as e
    from doctr_ray.functions.text import LANG_MARKERS, lang_id

    rows = [
        ("d_ar", "قال في من على إلى البيت"),
        ("d_he", "הוא של את על לא כאן"),
        ("d_fa", "او که از به را گفت"),
        ("d_ur", "اس کے میں نے کی بات"),
        ("d_yi", "און דער איז פֿון דאָ"),
        ("d_ug", "بىلەن بولۇپ ئۇ ھەم بار"),
        ("d_en", "the value of a row"),
        ("d_und", "xyzzy plugh"),
    ]
    t = pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    got = lang_id(t).to_pandas().set_index("doc_id")["pred_lang"].to_dict()
    assert got["d_ar"] == "ar" and got["d_he"] == "he" and got["d_fa"] == "fa"
    assert got["d_ur"] == "ur" and got["d_yi"] == "yi" and got["d_ug"] == "ug"
    assert got["d_en"] == "en" and got["d_und"] == "und"
    # every RTL language from the reference set is represented
    for lang in ("ar", "arc", "ckb", "dv", "fa", "he", "iw", "ks", "ku",
                 "nqo", "ps", "sd", "syr", "ug", "ur", "yi"):
        assert lang in LANG_MARKERS
    # oracle CASE (generated from the same table) agrees row for row
    con = duckdb.connect()
    con.register("documents", t)
    odf = con.sql(e.oracle_sql()["doc_lang_id"]).df().set_index("doc_id")["pred_lang"].to_dict()
    assert odf == got


def test_lang_id_full_breadth_self_detection():
    """langdetect-surface breadth (round-3 verdict #8): >= 55 languages,
    and for EVERY language a text made of its own markers argmaxes to
    itself (iw -> he is the documented legacy-code exception); the
    generated SQL oracle agrees row for row."""
    import duckdb

    import __ray_entry__ as e
    from doctr_ray.functions.text import LANG_MARKERS, lang_id

    assert len(LANG_MARKERS) >= 55
    # the reference's langdetect language surface (models/_utils.py:
    # 202-218; zh-cn/zh-tw collapse to zh)
    for lang in ("af bg bn ca cs cy da de el en es et fa fi fr gu he hi hr "
                 "hu id it ja kn ko lt lv mk ml mr ne nl no pa pl pt ro ru "
                 "sk sl so sq sv sw ta te th tl tr uk ur vi zh").split():
        assert lang in LANG_MARKERS, lang
    rows = [
        (f"d_{lang}", " ".join(LANG_MARKERS[lang] * 2))
        for lang in sorted(LANG_MARKERS)
    ]
    t = pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    got = lang_id(t).to_pandas().set_index("doc_id")["pred_lang"].to_dict()
    for lang in sorted(LANG_MARKERS):
        want = "he" if lang == "iw" else lang
        assert got[f"d_{lang}"] == want, (lang, got[f"d_{lang}"])
    con = duckdb.connect()
    con.register("documents", t)
    odf = (
        con.sql(e.oracle_sql()["doc_lang_id"])
        .df()
        .set_index("doc_id")["pred_lang"]
        .to_dict()
    )
    assert odf == got


def test_normalize_clean_unicode_and_whitespace():
    import numpy as np
    import pyarrow as pa

    from doctr_ray.functions.text import normalize_clean

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "Café du  monde",   # decomposed + double space
                    "  lead\t\ntrail  ",      # mixed runs + strip
                    "already clean",
                    None,                      # null -> empty, unchanged
                ],
                pa.string(),
            ),
        }
    )
    out = normalize_clean(batch).to_pandas().set_index("doc_id")
    assert out.loc["1", "clean_text"] == "Café du monde"  # precomposed
    assert out.loc["1", "changed"] == 1
    assert out.loc["2", "clean_text"] == "lead trail"
    assert out.loc["2", "changed"] == 1
    assert out.loc["3", "changed"] == 0
    assert out.loc["4", "clean_text"] == ""
    # idempotent: cleaning clean text changes nothing
    again = normalize_clean(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([out.loc["1", "clean_text"]], pa.string()),
            }
        )
    ).to_pandas()
    assert again["changed"].tolist() == [0]


def test_rag_chunks_windows(ray_session):
    from doctr_ray.functions.text import rag_chunks

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    " ".join(f"t{i}" for i in range(10)),  # 3 chunks
                    "a b c",                               # 1 chunk (n <= size)
                    "",                                    # empty -> none
                    " ".join(f"t{i}" for i in range(7)),   # exactly 1+ceil(3/3)=2
                ],
            }
        )
    )
    got = (
        rag_chunks(docs, size=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    by = {
        (r.doc_id, r.chunk_idx): (r.n_tok, r.chunk_text) for r in got.itertuples()
    }
    # doc 1: n=10 -> chunks at 0,3,6 (ceil(6/3)+1 = 3); windows of 4
    assert by[(1, 0)] == (4, "t0 t1 t2 t3")
    assert by[(1, 1)] == (4, "t3 t4 t5 t6")
    assert by[(1, 2)] == (4, "t6 t7 t8 t9")
    assert by[(2, 0)] == (3, "a b c")
    assert 3 not in got["doc_id"].tolist()
    assert by[(4, 0)] == (4, "t0 t1 t2 t3")
    assert by[(4, 1)] == (4, "t3 t4 t5 t6")
    assert len(got) == 6
    with pytest.raises(ValueError, match="stride"):
        rag_chunks(docs, size=4, stride=5)


def test_gopher_quality_rules(ray_session):
    """Every Gopher rule flips on crafted documents, and the integer
    cross-multiplied flags match hand-computed expectations."""
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.text import gopher_quality_stats

    good = "the quick brown fox jumps with energy " * 8  # 64 words, stops
    docs = {
        "good": good + "of and",  # 3 distinct stop words
        "short": "tiny doc",  # fails word count + stops
        "longsyms": ("#### " * 60) + good + "of",  # symbol ratio fails
        "bullets": "\n".join("- item here" for _ in range(10))
        + "\n" + good + "of",  # >90% bullet lines fails
        "dots": "\n".join("trailing line..." for _ in range(9))
        + "\n" + good + "of",  # 9/10 ellipsis lines fails
        "nums": ("12345 " * 60) + "the of",  # alpha fraction fails
    }
    tbl = pa.Table.from_pydict(
        {"doc_id": list(docs), "text": list(docs.values())}
    )
    out = (
        gopher_quality_stats(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["good", "gopher_pass"] == 1
    assert out.loc["short", "r_wordcount"] == 0
    assert out.loc["short", "r_stop"] == 0
    assert out.loc["longsyms", "r_symbol"] == 0
    assert out.loc["bullets", "r_bullet"] == 0
    assert out.loc["dots", "r_ellipsis"] == 0
    assert out.loc["nums", "r_alpha"] == 0
    # every failing doc fails overall
    for k in ("short", "longsyms", "bullets", "dots", "nums"):
        assert out.loc[k, "gopher_pass"] == 0


def test_gopher_repetition_rules(ray_session):
    """Repetitive documents trip the A1.2 caps: a doc that repeats one
    long phrase fails the duplicated-n-gram mass rules; diverse text
    passes."""
    import pyarrow as pa
    import ray.data as rd

    from doctr_ray.functions.text import gopher_repetition_stats

    phrase = "one two three four five six seven eight nine ten "
    docs = {
        "looped": phrase * 12,  # every 5..10-gram duplicated
        "diverse": " ".join(f"tok{i}" for i in range(120)),
        "bigram": "ha ha " * 40 + " ".join(f"w{i}" for i in range(30)),
    }
    tbl = pa.Table.from_pydict(
        {"doc_id": list(docs), "text": list(docs.values())}
    )
    out = (
        gopher_repetition_stats(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["diverse", "repetition_pass"] == 1
    for n in range(5, 11):
        assert out.loc["looped", f"r_rep_{n}"] == 0
    assert out.loc["bigram", "r_rep_2"] == 0  # 'ha ha' mass dominates
    assert out.loc["looped", "repetition_pass"] == 0
