"""Vocabulary contract + encode/translate semantics.

The charsets are the reference's public data contract (char index ==
recognition label id), decoded from the codepoint-run tables in
doctr_ray/vocabs_data.py (tools/gen_vocab_spans.py documents the
derivation). Exact string identity with the reference module is
asserted in test_reference_parity.py; this file checks the
composition invariants and the translate/encode/decode contracts
(datasets/utils.py:35-179).
"""

import numpy as np
import pytest

from doctr_ray.vocabs import (
    VOCABS,
    decode_sequence,
    encode_sequences,
    encode_string,
    translate,
)


def test_vocab_inventory():
    # full reference contract (215 entries) + engine aliases
    assert len(VOCABS) >= 215
    for required in (
        "english", "french", "german", "spanish", "vietnamese", "turkish",
        "russian", "ukrainian", "greek", "arabic", "persian", "hebrew",
        "hindi", "bengali", "japanese", "korean", "simplified_chinese",
        "thai", "tamil", "telugu", "georgian", "armenian", "khmer",
        "bangla", "japanese_kana", "multilingual", "latex",
    ):
        assert required in VOCABS, required


def test_no_duplicate_chars():
    for name, vocab in VOCABS.items():
        assert len(vocab) == len(set(vocab)), f"duplicate chars in {name}"


def test_composition_rules():
    # english extends latin (reference vocabs.py:241-242)
    assert set(VOCABS["latin"]) < set(VOCABS["english"])
    # diacritic languages extend english
    for lang in ("french", "german", "spanish", "polish", "portuguese"):
        assert set(VOCABS["english"]) < set(VOCABS[lang]), lang
    # letter-removal languages drop orthographically absent letters
    # (reference pattern: re.sub over english, vocabs.py:248-340)
    assert "Q" not in VOCABS["icelandic"] and "þ" in VOCABS["icelandic"]
    assert "x" not in VOCABS["lithuanian"] and "ė" in VOCABS["lithuanian"]
    # composed tone letters (NFC), not base+combining pairs
    assert "ế" in VOCABS["vietnamese"]
    assert all(len(c) == 1 for c in VOCABS["vietnamese"])
    # multilingual is the order-preserving union of the European-script
    # languages (the reference's composition does NOT include Arabic)
    assert set(VOCABS["french"]) <= set(VOCABS["multilingual"])
    assert set(VOCABS["russian"]) <= set(VOCABS["multilingual"])
    assert not set(VOCABS["arabic"]) <= set(VOCABS["multilingual"])
    assert len(VOCABS["multilingual"]) == len(set(VOCABS["multilingual"]))


def test_script_blocks():
    assert "ж" in VOCABS["russian"] and "ё" in VOCABS["russian"]
    assert "ї" in VOCABS["ukrainian"]
    assert "ς" in VOCABS["greek"]  # final sigma
    # the reference's arabic set already includes the Persian letters
    assert "ا" in VOCABS["arabic"] and "پ" in VOCABS["arabic"]
    assert "پ" in VOCABS["persian"]
    assert "א" in VOCABS["hebrew"]
    assert "क" in VOCABS["hindi"] and "।" in VOCABS["hindi"]
    assert "あ" in VOCABS["japanese_kana"] and "ー" in VOCABS["japanese_kana"]


def test_translate_nfd_fallback():
    # reference datasets/utils.py:35-66: unsupported chars decompose to
    # their NFD base before falling back to the unknown glyph
    assert translate("café", "english") == "cafe"
    assert translate("café", "french") == "café"
    assert translate("naïve", "english") == "naive"
    assert translate("日本", "english") == "■■"
    assert translate("über", "german") == "über"
    assert translate("über", "english") == "uber"


def test_encode_decode_roundtrip():
    vocab = VOCABS["english"]
    s = "Hello,World!42"  # vocabs carry no space char, like the reference
    codes = encode_string(s, vocab)
    assert decode_sequence(codes, vocab) == s
    with pytest.raises(ValueError, match="not in vocab"):
        encode_string("日本", vocab)


def test_encode_sequences_padding():
    vocab = VOCABS["latin"]
    out = encode_sequences(["ab", "a"], vocab, target_size=5, eos=-1)
    assert out.shape == (2, 5)
    assert decode_sequence(out[0][out[0] >= 0], vocab) == "ab"
    # sos/pad layout
    out = encode_sequences(["ab"], vocab, target_size=6, eos=-1, sos=98, pad=99)
    assert out[0, 0] == 98
    assert list(out[0, 3:]) == [-1, 99, 99] or out[0, 3] == -1
    assert encode_sequences([], vocab, target_size=4).shape == (0, 4)


def test_every_vocab_encodes_itself():
    for name, vocab in VOCABS.items():
        codes = encode_string(vocab, vocab)
        assert codes == list(range(len(vocab))), name
        assert decode_sequence(np.asarray(codes), vocab) == vocab
