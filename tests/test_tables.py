"""Table structure: grid detection, cell assignment, to_grid, e2e query shape."""

import numpy as np
import pytest

from doctr_ray.media import encode_media_ref, rasterize_synth
from doctr_ray.recognition import GlyphRecognizer
from doctr_ray.tables import Table, TableCell, extract_tables


@pytest.fixture(scope="module")
def rec():
    return GlyphRecognizer()


def test_extract_table_grid(rec):
    ref = encode_media_ref("a1 b2 c3 d4 e5 f6 tail words", table=(2, 3))
    page = rasterize_synth(ref)[0]
    tables, body_mask = extract_tables(page.image, rec)
    assert len(tables) == 1
    t = tables[0]
    assert (t.num_rows, t.num_cols) == (2, 3)
    assert t.to_grid() == [["a1", "b2", "c3"], ["d4", "e5", "f6"]]
    assert body_mask.sum() == 2  # 'tail', 'words'
    assert all(c.confidence == pytest.approx(1.0) for c in t.cells)


def test_extract_table_various_shapes(rec):
    for R, C in [(2, 2), (3, 4), (4, 3)]:
        words = " ".join(f"w{i:02d}" for i in range(R * C))
        page = rasterize_synth(encode_media_ref(words, table=(R, C)))[0]
        tables, _ = extract_tables(page.image, rec)
        assert len(tables) == 1
        grid = tables[0].to_grid()
        assert grid == [
            [f"w{r * C + c:02d}" for c in range(C)] for r in range(R)
        ], (R, C)


def test_no_table_on_plain_page(rec):
    page = rasterize_synth(encode_media_ref("just plain words here"))[0]
    tables, body_mask = extract_tables(page.image, rec)
    assert tables == []
    assert body_mask.all()


def test_artefact_not_mistaken_for_table(rec):
    page = rasterize_synth(encode_media_ref("words here", artefacts=2))[0]
    tables, body_mask = extract_tables(page.image, rec)
    assert tables == []  # solid blocks have no lattice


def test_table_export_shape(rec):
    page = rasterize_synth(encode_media_ref("a b c d", table=(2, 2)))[0]
    t = extract_tables(page.image, rec)[0][0]
    e = t.export()
    assert e["num_rows"] == 2 and e["num_cols"] == 2
    assert len(e["cells"]) == 4
    c = e["cells"][0]
    assert c["row_end"] == c["row_start"] + 1
    assert 0 <= c["geometry"][0] <= c["geometry"][2] <= 1
