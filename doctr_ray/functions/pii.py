"""PII detection and redaction over a documents table.

The anonymization stage every large-scale training-data pipeline runs
before the text reaches a model (the CCNet/Dolma-style pass: emails,
phone numbers, IP addresses -> typed placeholders). The reference has
no data-plane analog (it extracts text; it never filters it), so this
follows the standard published recipe: a fixed ordered list of RE2
patterns applied corpus-wide.

Ray-Data-native and scale-shaped:

- the whole kernel is three vectorized RE2 passes per batch
  (``pyarrow.compute.count_substring_regex`` /
  ``replace_substring_regex`` — C++ kernels over Arrow string arrays,
  zero Python per row);
- stateless task stage (no actor pool needed: the compiled regex lives
  inside Arrow's kernel, there is no per-worker setup to amortize);
- streaming: one pass, no shuffle, output is (doc_id, counts, redacted
  text) row-for-row with the input.

Both pyarrow and DuckDB use RE2, so the DuckDB oracle evaluates the
IDENTICAL patterns with identical semantics — counts and redacted
strings hash-match exactly.

Redaction order is part of the contract: emails first (their local
parts can contain digit runs that would otherwise shadow the IP scan),
then phones, then IPv4; each count is measured on the text as it stood
when that pattern ran.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns (no backrefs/lookaround — portable to pyarrow AND DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# (pattern, placeholder) in application order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("n_email", EMAIL_RE, "<EMAIL>"),
    ("n_phone", PHONE_RE, "<PHONE>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
)


def pii_scan_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One batch -> (doc_id, n_email, n_phone, n_ipv4, redacted).

    Sequential count-then-replace per rule so the counts are
    well-defined under overlapping pattern families.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols = [batch["doc_id"]]
    names = ["doc_id"]
    for name, pattern, placeholder in PII_RULES:
        cols.append(pc.count_substring_regex(text, pattern).cast(pa.int64()))
        names.append(name)
        text = pc.replace_substring_regex(text, pattern, placeholder)
    cols.append(text)
    names.append("redacted")
    return pa.Table.from_arrays(cols, names=names)


def pii_scan(docs_ds, text_col: str = "text"):
    """Dataset(doc_id, text) -> Dataset(doc_id, n_email, n_phone,
    n_ipv4, redacted). Pure streaming map — no shuffle, no state."""
    return docs_ds.map_batches(
        lambda b: pii_scan_batch(b, text_col), batch_format="pyarrow"
    )


def pii_redact_sql(source: str = "documents", text_expr: str = "text") -> str:
    """The DuckDB mirror of :func:`pii_scan` over ``source``: identical
    RE2 rules in identical order (DuckDB's regexp engine is also RE2).
    ``text_expr`` lets callers pre-augment the text the same way on
    both sides."""
    sql = f"SELECT doc_id, {text_expr} AS t FROM {source}"
    carried: list[str] = []
    for name, pattern, placeholder in PII_RULES:
        keep = (", ".join(carried) + ", ") if carried else ""
        sql = (
            f"SELECT doc_id, {keep}"
            f"len(regexp_extract_all(t, '{pattern}')) AS {name}, "
            f"regexp_replace(t, '{pattern}', '{placeholder}', 'g') AS t "
            f"FROM ({sql})"
        )
        carried.append(name)
    return (
        f"SELECT doc_id, {', '.join(carried)}, t AS redacted FROM ({sql})"
    )
