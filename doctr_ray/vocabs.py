"""Vocabularies and sequence encoding utilities.

Re-expressed from the reference's vocab/encoding layer (reference:
datasets/vocabs.py:13-241 — charsets composed from base sets, char
index == label id; datasets/utils.py:35-179 — translate/encode_string/
decode_sequence/encode_sequences with NFD fallback and pad/eos/sos
handling). The engine's recognition stage uses :data:`doctr_ray.glyphs.
VOCAB`; these utilities exist for parity and for training-data prep.
"""

from __future__ import annotations

import unicodedata

import numpy as np

# base charsets (reference datasets/vocabs.py:13-30)
DIGITS = "0123456789"
ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
PUNCTUATION = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
CURRENCY = "£€¥¢฿"
ACCENTS_LATIN = "àâéèêëîïôùûüçÀÂÉÈÊËÎÏÔÙÛÜÇ"

VOCABS: dict[str, str] = {
    "digits": DIGITS,
    "ascii_letters": ASCII_LETTERS,
    "punctuation": PUNCTUATION,
    "currency": CURRENCY,
    "latin": DIGITS + ASCII_LETTERS + PUNCTUATION,
    "english": DIGITS + ASCII_LETTERS + PUNCTUATION + "°" + CURRENCY,
    "french": DIGITS + ASCII_LETTERS + PUNCTUATION + "°" + CURRENCY + ACCENTS_LATIN,
    "legacy_french": "°" + DIGITS + ASCII_LETTERS + PUNCTUATION + CURRENCY + ACCENTS_LATIN,
}


def translate(input_string: str, vocab_name: str, unknown_char: str = "■") -> str:
    """Map a string into a vocab, NFD-decomposing unsupported chars
    (reference: datasets/utils.py:35-66)."""
    vocab = VOCABS[vocab_name]
    out = []
    for ch in input_string:
        if ch in vocab:
            out.append(ch)
            continue
        decomp = unicodedata.normalize("NFD", ch)
        base = decomp[0] if decomp else ch
        out.append(base if base in vocab else unknown_char)
    return "".join(out)


def encode_string(input_string: str, vocab: str) -> list[int]:
    """char sequence -> label ids (char index in vocab).
    reference: datasets/utils.py:69-90; raises on out-of-vocab."""
    try:
        return [vocab.index(c) for c in input_string]
    except ValueError as e:
        missing = sorted({c for c in input_string if c not in vocab})
        raise ValueError(f"characters not in vocab: {missing}") from e


def decode_sequence(codes, vocab: str) -> str:
    """label ids -> string (reference: datasets/utils.py:93-110)."""
    arr = np.asarray(codes)
    if arr.ndim != 1:
        raise ValueError("decode_sequence expects a 1-D sequence")
    return "".join(vocab[int(i)] for i in arr)


def encode_sequences(
    sequences: list[str],
    vocab: str,
    target_size: int | None = None,
    eos: int = -1,
    sos: int | None = None,
    pad: int | None = None,
) -> np.ndarray:
    """Batch-encode strings to a fixed-width int array with eos/sos/pad
    semantics (reference: datasets/utils.py:113-179)."""
    if not sequences:
        return np.zeros((0, target_size or 0), dtype=np.int32)
    max_len = max(len(s) for s in sequences)
    width = max_len + 1  # room for eos
    if sos is not None:
        width += 1
    if target_size is not None:
        width = target_size
    fill = eos if pad is None else pad
    out = np.full((len(sequences), width), fill, dtype=np.int32)
    offset = 0
    if sos is not None:
        out[:, 0] = sos
        offset = 1
    for i, seq in enumerate(sequences):
        codes = encode_string(seq, vocab)[: width - offset]
        out[i, offset : offset + len(codes)] = codes
        if pad is not None and offset + len(codes) < width:
            out[i, offset + len(codes)] = eos
    return out
