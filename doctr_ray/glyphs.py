"""Deterministic procedural bitmap font.

The reference renders synthetic text fixtures with PIL
(reference: datasets/generator/base.py:19-56, tests/conftest.py:26-42).
This sandbox has no PIL, so we use a deterministic procedural font: each
glyph is a 5x7 binary cell whose border ring is always ink and whose
3x5 interior bits are derived from sha256(char). Properties this
guarantees (all load-bearing for the exact OCR round-trip):

- every glyph is 4-connected (the border ring) -> one word = one
  connected component after small dilation;
- every glyph has ink in its first/last row and column -> the tight ink
  bounding box of a rendered word is exactly its layout cell extent,
  so detection boxes are pixel-exact;
- glyph patterns are pairwise distinct (checked at import; interior
  bits are perturbed deterministically on collision).

Glyphs are matched by nearest-template distance in
:mod:`doctr_ray.recognition` — legibility to humans is irrelevant,
distinctness is what matters.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Base (unscaled) glyph cell geometry.
GLYPH_W = 5
GLYPH_H = 7
# Default rendering scale (reference rasterizes PDFs at scale=2 / 144 dpi,
# io/pdf.py:16-43; we keep the same knob).
SCALE = 2
# Scaled metrics used by the renderer and the recognizer (fixed-pitch font).
CHAR_W = GLYPH_W * SCALE          # 10 px
CHAR_H = GLYPH_H * SCALE          # 14 px
CHAR_SPACE = 1 * SCALE            # 2 px between glyphs of a word
CHAR_PITCH = CHAR_W + CHAR_SPACE  # 12 px fixed pitch

# The supported character set. Covers the synthetic corpora (lowercase
# ascii words) plus digits and light punctuation.
VOCAB = "abcdefghijklmnopqrstuvwxyz0123456789.,-'?!:%()/+="


def _interior_bits(ch: str, salt: int = 0) -> np.ndarray:
    """15 deterministic bits for the 3x5 interior of ``ch``'s glyph."""
    h = hashlib.sha256(f"glyph:{ch}:{salt}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(h[:2], dtype=np.uint8))
    # 16 bits from 2 bytes; take 15.
    return bits[:15].reshape(5, 3).astype(np.uint8)


def _build_font() -> dict[str, np.ndarray]:
    font: dict[str, np.ndarray] = {}
    seen: dict[bytes, str] = {}
    for ch in VOCAB:
        salt = 0
        while True:
            g = np.ones((GLYPH_H, GLYPH_W), dtype=np.uint8)
            g[1:-1, 1:-1] = _interior_bits(ch, salt)
            key = g.tobytes()
            if key not in seen:
                seen[key] = ch
                font[ch] = g
                break
            salt += 1
    return font


#: char -> (7,5) uint8 {0,1} ink mask
FONT: dict[str, np.ndarray] = _build_font()


def glyph(ch: str, scale: int = SCALE) -> np.ndarray:
    """Scaled ink mask for one character, shape (GLYPH_H*scale, GLYPH_W*scale)."""
    g = FONT.get(ch)
    if g is None:
        g = FONT["?"]
    if scale == 1:
        return g
    return np.kron(g, np.ones((scale, scale), dtype=np.uint8))


import functools


@functools.lru_cache(maxsize=8192)
def _render_word_cached(word: str, scale: int) -> np.ndarray:
    if not word:
        return np.zeros((GLYPH_H * scale, 0), dtype=np.uint8)
    cw, sp = GLYPH_W * scale, 1 * scale
    out = np.zeros((GLYPH_H * scale, len(word) * (cw + sp) - sp), dtype=np.uint8)
    for i, ch in enumerate(word):
        x = i * (cw + sp)
        out[:, x : x + cw] = glyph(ch, scale)
    out.setflags(write=False)  # cached: callers must not mutate
    return out


def render_word(word: str, scale: int = SCALE) -> np.ndarray:
    """Render a word as an ink mask (uint8 {0,1}).

    Shape: (CHAR_H, len(word)*CHAR_PITCH - CHAR_SPACE) at default scale.
    Fixed-pitch: glyph cells separated by ``CHAR_SPACE`` blank columns.
    LRU-cached (vocabulary words repeat heavily); the returned array is
    read-only.
    """
    return _render_word_cached(word, scale)


def word_width(word: str, scale: int = SCALE) -> int:
    if not word:
        return 0
    cw, sp = GLYPH_W * scale, 1 * scale
    return len(word) * (cw + sp) - sp


def template_matrix(scale: int = SCALE) -> tuple[np.ndarray, str]:
    """(K, CHAR_H*CHAR_W) float32 glyph templates + the vocab string.

    Built once per recognition actor (doctr loads its vocab + weights once
    per predictor: models/utils/pytorch.py:41, datasets/vocabs.py).
    """
    mats = [glyph(ch, scale).reshape(-1).astype(np.float32) for ch in VOCAB]
    return np.stack(mats), VOCAB
