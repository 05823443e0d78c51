import numpy as np

from doctr_ray.glyphs import (
    CHAR_H,
    CHAR_PITCH,
    CHAR_SPACE,
    CHAR_W,
    FONT,
    VOCAB,
    glyph,
    render_word,
    template_matrix,
    word_width,
)


def test_font_covers_vocab_and_is_distinct():
    assert set(FONT) == set(VOCAB)
    patterns = {g.tobytes() for g in FONT.values()}
    assert len(patterns) == len(VOCAB)


def test_glyphs_have_full_border():
    # load-bearing: tight bbox of a word == its layout cell extent
    for ch, g in FONT.items():
        assert g[0].all() and g[-1].all(), ch
        assert g[:, 0].all() and g[:, -1].all(), ch


def test_render_word_geometry():
    w = render_word("abc")
    assert w.shape == (CHAR_H, 3 * CHAR_PITCH - CHAR_SPACE)
    assert word_width("abc") == w.shape[1]
    # each char cell occupied, spacing blank
    assert w[:, :CHAR_W].any()
    assert not w[:, CHAR_W : CHAR_W + CHAR_SPACE].any()


def test_template_matrix_shape():
    t, vocab = template_matrix()
    assert t.shape == (len(VOCAB), CHAR_H * CHAR_W)
    assert vocab == VOCAB
    # rows distinct
    assert len({row.tobytes() for row in t}) == len(VOCAB)


def test_scaled_glyph():
    g1 = glyph("a", scale=1)
    g3 = glyph("a", scale=3)
    assert g3.shape == (g1.shape[0] * 3, g1.shape[1] * 3)
    assert np.array_equal(g3[::3, ::3], g1)
