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
import re as _re

DIGITS = "0123456789"
ASCII_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
PUNCTUATION = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
CURRENCY = "£€¥¢฿"
ACCENTS_LATIN = "àâéèêëîïôùûüçÀÂÉÈÊËÎÏÔÙÛÜÇ"


def _urange(*spans: tuple[int, int]) -> str:
    """Charset from inclusive unicode codepoint ranges."""
    return "".join(chr(c) for a, b in spans for c in range(a, b + 1))


def _both_cases(lower: str) -> str:
    return lower + lower.upper()


def _with_tones(bases: str, marks: str) -> str:
    """Compose each base letter with each combining mark (NFC) — the
    rule behind large diacritic alphabets like Vietnamese."""
    out = []
    for b in bases:
        for m in marks:
            c = unicodedata.normalize("NFC", b + m)
            if len(c) == 1:
                out.append(c)
    return "".join(out)


def _without(vocab: str, letters: str) -> str:
    """Drop letters absent from a language's orthography (the
    reference composes e.g. bosnian = english minus QWXY + diacritics,
    vocabs.py:248-340)."""
    return _re.sub(f"[{letters}]", "", vocab)


# script blocks composed from unicode ranges (public orthography)
_CYRILLIC_CORE = _both_cases("абвгдежзийклмнопрстуфхцчшщьюя")
_GREEK = _both_cases("αβγδεζηθικλμνξοπρστυφχψω") + "ς"
_ARABIC_LETTERS = _urange((0x0621, 0x063A), (0x0641, 0x064A)) + "ٱ"
_ARABIC_DIGITS = _urange((0x0660, 0x0669))
_ARABIC_PUNCT = "؟؛«»—،"
_PERSIAN_EXTRA = "پچژگکی"
_HEBREW_LETTERS = _urange((0x05D0, 0x05EA))
_DEVANAGARI = _urange((0x0901, 0x0939), (0x093C, 0x094D), (0x0950, 0x0950), (0x0966, 0x096F))
_BENGALI = _urange((0x0981, 0x0983), (0x0985, 0x098B), (0x098F, 0x0990), (0x0993, 0x09A8), (0x09AA, 0x09B0), (0x09B2, 0x09B2), (0x09B6, 0x09B9), (0x09BC, 0x09C4), (0x09C7, 0x09C8), (0x09CB, 0x09CD), (0x09E6, 0x09EF))
_HIRAGANA = _urange((0x3041, 0x3096))
_KATAKANA = _urange((0x30A1, 0x30FA)) + "ー"
_VI_MARKS = "̣̀́̃̉"  # grave acute tilde hook below-dot
_VI_BASES = "aăâeêioôơuưyAĂÂEÊIOÔƠUƯY"

_LATIN = DIGITS + ASCII_LETTERS + PUNCTUATION
_EN = _LATIN + "°" + CURRENCY

VOCABS: dict[str, str] = {
    "digits": DIGITS,
    "ascii_letters": ASCII_LETTERS,
    "punctuation": PUNCTUATION,
    "currency": CURRENCY,
    "latin": _LATIN,
    "english": _EN,
    # Latin-script languages: english +/- orthography-specific letters
    # (composition rules mirror reference datasets/vocabs.py:241-360)
    "albanian": _EN + _both_cases("çë"),
    "basque": _EN + _both_cases("ñç"),
    "catalan": _EN + _both_cases("àèéíïòóúüç"),
    "croatian": _EN + _both_cases("čćđšž"),
    "czech": _EN + _both_cases("áčďéěíňóřšťúůýž"),
    "danish": _EN + _both_cases("æøå"),
    "dutch": _EN + _both_cases("áéíóúüñ"),
    "estonian": _EN + _both_cases("šžõäöü"),
    "finnish": _EN + _both_cases("äö"),
    "french": _EN + ACCENTS_LATIN,
    "german": _EN + "äöüßÄÖÜẞ",
    "hungarian": _EN + _both_cases("áéíóöúü"),
    "icelandic": _without(_EN, "CcQqWw") + _both_cases("ðáéíóúýþæö"),
    "irish": _EN + _both_cases("áéíóú"),
    "italian": _EN + _both_cases("àèéìíîòóùú"),
    "latvian": _without(_EN, "QqWwXx") + _both_cases("āčēģīķļņšūž"),
    "lithuanian": _without(_EN, "QqWwXx") + _both_cases("ąčęėįšųūž"),
    "maltese": _without(_EN, "CcYy") + _both_cases("ċġħż"),
    "norwegian": _EN + _both_cases("æøå"),
    "polish": _EN + _both_cases("ąćęłńóśźż"),
    "portuguese": _EN + _both_cases("áàâãéêíïóôõúüç"),
    "romanian": _EN + _both_cases("ăâîșț"),
    "serbian_latin": _EN + _both_cases("čćđžš"),
    "slovak": _EN + _both_cases("ôäčďľňšťžáéíĺóŕúý"),
    "slovene": _without(_EN, "QqWwXxYy") + _both_cases("čćđšž"),
    "spanish": _EN + _both_cases("áéíóúüñ") + "¡¿",
    "swedish": _EN + _both_cases("åäö"),
    "turkish": _without(_EN, "QqWwXx") + _both_cases("çğöşü") + "ıİ",
    "vietnamese": _EN + _both_cases("ăâđêôơư") + _with_tones(_VI_BASES, _VI_MARKS),
    # non-Latin scripts: english digits/punctuation + script block
    "russian": DIGITS + PUNCTUATION + "°" + CURRENCY + _CYRILLIC_CORE + _both_cases("ёыэъ") + "₽",
    "ukrainian": DIGITS + PUNCTUATION + "°" + CURRENCY + _CYRILLIC_CORE + _both_cases("ґєії") + "₴",
    "bulgarian": DIGITS + PUNCTUATION + "°" + CURRENCY + _CYRILLIC_CORE + _both_cases("ъ"),
    "greek": _EN + _GREEK,
    "arabic": DIGITS + _ARABIC_DIGITS + PUNCTUATION + _ARABIC_PUNCT + _ARABIC_LETTERS,
    "persian": DIGITS + _ARABIC_DIGITS + PUNCTUATION + _ARABIC_PUNCT + _ARABIC_LETTERS + _PERSIAN_EXTRA,
    "hebrew": _EN + _HEBREW_LETTERS,
    "hindi": _DEVANAGARI + PUNCTUATION + "।॥",
    "bangla": _BENGALI + PUNCTUATION + "।",
    "japanese_kana": DIGITS + PUNCTUATION + _HIRAGANA + _KATAKANA + "。、「」",
    "legacy_french": "°" + DIGITS + ASCII_LETTERS + PUNCTUATION + CURRENCY + ACCENTS_LATIN,
}

# merged multi-script vocab (reference composes 'multilingual' from the
# per-language sets, de-duplicated order-preserving)


def _merge(*names: str) -> str:
    seen: dict[str, None] = {}
    for n in names:
        for ch in VOCABS[n]:
            seen.setdefault(ch, None)
    return "".join(seen)


VOCABS["multilingual"] = _merge(
    "french", "german", "spanish", "portuguese", "italian", "dutch", "polish",
    "czech", "romanian", "vietnamese", "russian", "greek", "arabic", "hebrew",
)


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
