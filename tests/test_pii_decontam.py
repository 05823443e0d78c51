"""PII scan/redaction, decontamination, and commonness scoring."""

import duckdb
import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.functions.decontam import BENCH_PASSAGE, decontaminate, decontaminate_sql
from doctr_ray.functions.pii import pii_redact_sql, pii_scan, pii_scan_batch
from doctr_ray.functions.text import doc_commonness


def _docs_table(rows):
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
        }
    )


# ----------------------------------------------------------------- PII

PII_CASES = [
    "write to bob.smith+x@ex-ample.co.uk or call +1-202-555-0176 from 10.0.0.1",
    "no pii here",
    "a@b.io c@d.org +44-123-456-7890 +1-2-3 256.1.2.3 1.2.3.4.5 a@@b.com",
    "",
    "edge 999.999.999.999 x1.2.3.4 1.2.3.4x user_%+-@host.name.museum",
    "double email a@b.cd e@f.gh and ip 8.8.8.8 8.8.4.4",
]


def test_pii_scan_batch_matches_duckdb():
    """The Arrow RE2 kernel chain and the DuckDB RE2 mirror must agree
    byte-for-byte on counts AND redacted text (both engines are RE2 —
    this is the oracle contract)."""
    tbl = _docs_table(list(enumerate(PII_CASES)))
    got = pii_scan_batch(tbl).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(pii_redact_sql()).fetch_arrow_table().to_pandas()
    pd_sort = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert pd_sort(want).equals(pd_sort(got))


def test_pii_scan_redacts_and_counts():
    tbl = _docs_table([(1, "mail a@b.co twice c@d.org, ip 1.2.3.4")])
    out = pii_scan_batch(tbl).to_pandas().iloc[0]
    assert out["n_email"] == 2 and out["n_ipv4"] == 1 and out["n_phone"] == 0
    assert out["redacted"] == "mail <EMAIL> twice <EMAIL>, ip <IP>"


def test_pii_scan_dataset(ray_session):
    ds = pii_scan(rd.from_arrow(_docs_table(list(enumerate(PII_CASES)))))
    df = ds.to_pandas()
    assert len(df) == len(PII_CASES)
    assert df["n_email"].sum() >= 5


# -------------------------------------------------------- decontamination


def test_decontaminate_planted_overlap(ray_session):
    # doc 0 is eval (0 % 97 == 0) and shares its passage with doc 5;
    # doc 7 is clean; doc 3 is too short to carry an 8-gram.
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "eval doc holds " + passage),
        (5, "train doc repeats " + passage + " verbatim here"),
        (7, "totally different words with no overlap against the benchmark suite"),
        (3, "too short"),
    ]
    out = (
        decontaminate(rd.from_arrow(_docs_table(rows)))
        .to_pandas()
        .set_index("doc_id")
    )
    assert 0 not in out.index  # eval doc excluded
    assert 3 not in out.index  # < 8 tokens -> no gram evidence
    assert bool(out.loc[5, "contaminated"]) is True
    assert out.loc[5, "n_contaminated"] >= 3  # 10-token shared passage
    assert bool(out.loc[7, "contaminated"]) is False


def test_decontaminate_matches_sql_oracle(ray_session):
    rows = [
        (i, f"filler w{i} " + (BENCH_PASSAGE if i % 13 == 0 else f"tail x{i} y z a b c d e f"))
        for i in range(30)
    ]
    tbl = _docs_table(rows)
    got = (
        decontaminate(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(decontaminate_sql())
        .fetch_arrow_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(want["doc_id"]) == list(got["doc_id"])
    assert list(want["n_contaminated"].astype(int)) == list(
        got["n_contaminated"].astype(int)
    )
    # doc 13 and 26 carry the passage doc 0 put into the eval set
    assert bool(got.set_index("doc_id").loc[13, "contaminated"]) is True


# ----------------------------------------------------------- commonness


def test_doc_commonness_integer_exact(ray_session):
    rows = [
        (1, "the the the rare"),
        (2, "the unique"),
        (3, ""),
    ]
    out = (
        doc_commonness(rd.from_arrow(_docs_table(rows)), k=2)
        .to_pandas()
        .set_index("doc_id")
    )
    # corpus counts: the=4, rare=1, unique=1; top-2 by (count desc,
    # token asc): the(4), rare(1) — 'rare' beats 'unique' lexically
    assert 3 not in out.index  # empty doc dropped
    assert out.loc[1, "hits"] == 3 * 4 + 1  # three 'the' @4 + 'rare' @1
    assert out.loc[1, "commonness_e6"] == (1_000_000 * 13) // 4
    assert out.loc[2, "hits"] == 4  # 'the' @4, 'unique' out of vocab


# ------------------------------------------------------- bpe token count


def test_bpe_token_stats_matches_duckdb():
    from doctr_ray.functions.text import bpe_token_stats, bpe_token_sql

    texts = [
        "don't stop 12345 times!! it's e.g. 3.14, ok?",
        "",
        "hello   world",
        "ünïcode mixed ascii x9",
        "they'll we've I'm you'd",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = bpe_token_stats(tbl).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(bpe_token_sql()).fetch_arrow_table().to_pandas()
    assert want.equals(got)
    # "don't" -> " don" + "'t"; long number chunks into 3+2 digits
    row = got.set_index("doc_id").loc[0]
    assert row["n_bpe_tokens"] == 19


# -------------------------------------------------- dup n-gram fraction


def test_dup_ngram_stats_matches_duckdb(ray_session):
    from doctr_ray.functions.dedup import dup_ngram_sql, dup_ngram_stats

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, "prefix " + shared + " suffix a b c"),
        (2, "other " + shared + " tail"),
        (3, "independent text with no overlapping window at all here ok"),
        (4, "tiny"),
        (5, "rep rep rep rep rep rep rep rep rep"),  # within-doc only
    ]
    tbl = _docs_table(rows)
    got = (
        dup_ngram_stats(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(dup_ngram_sql())
        .fetch_arrow_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert want.astype("int64").equals(got.astype("int64"))
    g = got.set_index("doc_id")
    assert 4 not in g.index  # < 8 tokens -> no grams
    assert g.loc[1, "n_dup"] == 3  # three shared 8-gram windows
    assert g.loc[3, "n_dup"] == 0
    # within-doc repetition is NOT cross-doc duplication
    assert g.loc[5, "n_dup"] == 0 and g.loc[5, "n_grams"] == 2
