"""Numpy TableCenterNet tower: each kernel differentially tested
against a naive obviously-correct implementation (torch/torchvision
are absent, so the documented op math is the oracle), the decode and
relocation postprocessor driven by HAND-BUILT head maps whose expected
cells are known exactly, the end-to-end shape contract, a fixed-seed
determinism pin, load-once weights accounting, and the zoo's table
slot."""

import hashlib

import numpy as np
import pytest

from doctr_ray.tablecenternet import (
    TableCenterNetNumpy,
    TableCenterNetPostProcessorNumpy,
    _gather_rows,
    _topk_keypoints,
    conv_transpose2d_grouped,
    dcn_v2,
    depthwise_conv2d,
    grid_sample_bilinear_ac,
    maxpool3x3_same,
    points_in_polygon,
    polygons_decode,
    random_tablecenternet_weights,
    relu6,
    resolve_logic_coords,
    small_tablecenternet,
)

RNG = np.random.RandomState(5)


# ---------------------------------------------------------------- kernels


def test_relu6():
    x = np.array([-3.0, 0.0, 2.5, 6.0, 9.0])
    np.testing.assert_allclose(relu6(x), [0, 0, 2.5, 6, 6])


def test_depthwise_conv_matches_per_channel_loop():
    x = RNG.standard_normal((2, 3, 8, 9)).astype(np.float64)
    w = RNG.standard_normal((3, 1, 7, 7))
    b = RNG.standard_normal(3)
    got = depthwise_conv2d(x, w, b, pad=3)
    xp = np.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3)))
    for n in range(2):
        for c in range(3):
            for i in range(8):
                for j in range(0, 9, 4):
                    want = (xp[n, c, i : i + 7, j : j + 7] * w[c, 0]).sum() + b[c]
                    assert got[n, c, i, j] == pytest.approx(want, rel=1e-9)


def test_conv_transpose_grouped_matches_scatter():
    # naive transposed conv: scatter each input pixel through the kernel
    x = RNG.standard_normal((1, 2, 4, 5))
    f = 2
    w = RNG.standard_normal((2, 1, 2 * f, 2 * f))
    got = conv_transpose2d_grouped(x, w, stride=f, padding=f // 2)
    H, W, k, pad = 4, 5, 2 * f, f // 2
    Ho, Wo = (H - 1) * f - 2 * pad + k, (W - 1) * f - 2 * pad + k
    want = np.zeros((1, 2, Ho + 2 * pad, Wo + 2 * pad))
    for c in range(2):
        for i in range(H):
            for j in range(W):
                want[0, c, i * f : i * f + k, j * f : j * f + k] += x[0, c, i, j] * w[c, 0]
    want = want[:, :, pad : pad + Ho, pad : pad + Wo]
    assert got.shape == (1, 2, 2 * H, 2 * W)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_grid_sample_align_corners_true():
    # align_corners=True: grid -1 -> pixel 0, +1 -> pixel size-1
    v = np.arange(6, dtype=np.float64).reshape(1, 1, 2, 3)
    gx = np.array([[[-1.0, 1.0, 0.0]]])
    gy = np.array([[[-1.0, 1.0, 0.0]]])
    got = grid_sample_bilinear_ac(v, gx, gy)
    np.testing.assert_allclose(got.ravel(), [0.0, 5.0, 2.5])


def test_grid_sample_ac_zero_padding_out_of_bounds():
    v = np.ones((1, 1, 4, 4))
    gx = np.array([[[-3.0, 3.0]]])
    gy = np.array([[[0.0, 0.0]]])
    got = grid_sample_bilinear_ac(v, gx, gy)
    np.testing.assert_allclose(got.ravel(), [0.0, 0.0])


def test_dcnv2_zero_offsets_is_half_plain_conv():
    """Zero offset/mask logits -> sampling on the regular grid with
    modulation sigmoid(0) = 0.5: DCNv2 == 0.5 * conv2d + bias."""
    from doctr_ray.dbnet import conv2d

    ci, co = 3, 4
    x = RNG.standard_normal((1, ci, 6, 6)).astype(np.float64)
    p = {
        "d.weight": RNG.standard_normal((co, ci, 3, 3)),
        "d.bias": RNG.standard_normal(co),
        "d.conv_offset_mask.weight": np.zeros((27, ci, 3, 3)),
        "d.conv_offset_mask.bias": np.zeros(27),
    }
    got = dcn_v2(x, p, "d")
    want = 0.5 * conv2d(x, p["d.weight"], None, stride=1, pad=1) + p["d.bias"][None, :, None, None]
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_dcnv2_integer_offset_shifts_sampling():
    """An offset of exactly (dy=0, dx=1) on every kernel position
    samples the pixel one column right — equal to convolving the
    shifted input."""
    from doctr_ray.dbnet import conv2d

    x = RNG.standard_normal((1, 1, 8, 8)).astype(np.float64)
    bias27 = np.zeros(27)
    bias27[1:18:2] = 1.0  # dx channels (odd indices of the offset half)
    p = {
        "d.weight": RNG.standard_normal((1, 1, 3, 3)),
        "d.bias": np.zeros(1),
        "d.conv_offset_mask.weight": np.zeros((27, 1, 3, 3)),
        "d.conv_offset_mask.bias": bias27,
    }
    got = dcn_v2(x, p, "d")
    shifted = np.zeros_like(x)
    shifted[..., :-1] = x[..., 1:]
    want = 0.5 * conv2d(shifted, p["d.weight"], None, stride=1, pad=1)
    # interior only: the shift interacts with zero padding at borders
    np.testing.assert_allclose(got[..., 1:-1, 1:-2], want[..., 1:-1, 1:-2], atol=1e-8)


def test_maxpool3x3_same_matches_naive():
    x = RNG.standard_normal((1, 1, 5, 6))
    got = maxpool3x3_same(x)
    for i in range(5):
        for j in range(6):
            want = x[0, 0, max(0, i - 1) : i + 2, max(0, j - 1) : j + 2].max()
            assert got[0, 0, i, j] == pytest.approx(want)


def test_points_in_polygon():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    pts = np.array([[2, 2], [5, 2], [-1, -1], [3.9, 3.9]])
    np.testing.assert_array_equal(points_in_polygon(sq, pts), [True, False, False, True])
    # non-convex chevron: the notch is outside
    chev = np.array([[0, 0], [4, 0], [4, 4], [2, 1.5], [0, 4]], float)
    np.testing.assert_array_equal(
        points_in_polygon(chev, np.array([[2, 0.5], [2, 3.0]])), [True, False]
    )


# ------------------------------------------------------------- decode


def test_topk_keypoints_nms_and_order():
    heat = np.zeros((1, 1, 8, 8), np.float32)
    heat[0, 0, 2, 3] = 0.9
    heat[0, 0, 2, 4] = 0.8   # adjacent, suppressed by the 3x3 NMS
    heat[0, 0, 6, 6] = 0.7
    scores, inds, xs, ys = _topk_keypoints(heat, 3)
    assert scores[0, 0] == pytest.approx(0.9)
    assert (xs[0, 0], ys[0, 0]) == (3, 2)
    assert scores[0, 1] == pytest.approx(0.7)
    assert (xs[0, 1], ys[0, 1]) == (6, 6)
    assert scores[0, 2] == 0.0  # the suppressed peak never surfaces


def test_gather_rows():
    fm = np.arange(2 * 3 * 4, dtype=np.float32).reshape(1, 2, 3, 4)
    inds = np.array([[5, 0]])
    got = _gather_rows(fm, inds)
    np.testing.assert_allclose(got[0, 0], [fm[0, 0, 1, 1], fm[0, 1, 1, 1]])
    np.testing.assert_allclose(got[0, 1], [fm[0, 0, 0, 0], fm[0, 1, 0, 0]])


def test_polygons_decode_geometry():
    heat = np.zeros((1, 1, 8, 8), np.float32)
    heat[0, 0, 4, 4] = 0.95
    reg = np.zeros((1, 2, 8, 8), np.float32)
    reg[0, 0, 4, 4] = 0.25  # sub-pixel x
    vec = np.zeros((1, 8, 8, 8), np.float32)
    # corners at center - v: TL (-2,-1), TR (+2,-1), BR (+2,+1), BL (-2,+1)
    vec[0, :, 4, 4] = [2, 1, -2, 1, -2, -1, 2, -1]
    scores, inds, xs, ys, polys = polygons_decode(heat, vec, reg, 2)
    assert scores[0, 0] == pytest.approx(0.95)
    cx = 4.25
    np.testing.assert_allclose(
        polys[0, 0], [cx - 2, 3, cx + 2, 3, cx + 2, 5, cx - 2, 5], atol=1e-6
    )


# -------------------------------------------------- logic + postprocessor


def test_resolve_logic_coords_aligned_pairs():
    # TL/BL agree on the start column; TL/TR agree on the start row
    lc = np.array([[1.0, 1.0], [2.2, 1.1], [2.4, 2.0], [1.0, 2.1]])
    assert resolve_logic_coords(lc, 2, 2) == (1, 2, 1, 2)
    # end-aligned: TR/BR agree -> end_col anchors at
    # max(col_span + 1, TR) - 1 and the span walks back the start
    lc2 = np.array([[1.4, 1.0], [3.0, 1.0], [3.0, 2.0], [1.6, 2.0]])
    assert resolve_logic_coords(lc2, 2, 1) == (1, 2, 1, 1)
    # wide end corner: the corner index (4) beats col_span + 1
    lc3 = np.array([[1.4, 1.0], [4.0, 1.0], [4.0, 2.0], [1.6, 2.0]])
    assert resolve_logic_coords(lc3, 2, 1) == (2, 3, 1, 1)


def test_resolve_logic_coords_mean_fallback():
    # no aligned pair: the tighter (TL, BL) mean anchors the start
    lc = np.array([[1.2, 1.3], [2.0, 1.0], [2.6, 2.0], [1.4, 2.4]])
    start_col, end_col, start_row, end_row = resolve_logic_coords(lc, 1, 1)
    assert (start_col, end_col) == (1, 1)  # round(mean(1.2, 1.4)) = 1


def _grid_heads(feat: int = 16):
    """Hand-built decoded dict for a 2x2 table on a feat x feat grid:
    four cells of size 4x4 starting at (2, 2), corner key-points on
    the shared lattice, logical maps painted per cell."""
    cells = [(2, 2, 6, 6, 1, 1), (6, 2, 10, 6, 2, 1), (2, 6, 6, 10, 1, 2), (6, 6, 10, 10, 2, 2)]
    n = len(cells)
    center_polys = np.zeros((1, n, 8), np.float32)
    center_scores = np.full((1, n), 0.9, np.float32)
    center_spans = np.ones((1, n, 2), np.float32)
    # cn2ct encodes, per corner, the vector to the center of the cell
    # whose j-th corner it is (zero when no such cell): the corner
    # "polygon" therefore spans the ADJACENT CELL CENTERS
    corners: dict = {}
    for x0, y0, x1, y1, col, row in cells:
        ctr = ((x0 + x1) / 2.0, (y0 + y1) / 2.0)
        for slot, (cx, cy) in enumerate(((x0, y0), (x1, y0), (x1, y1), (x0, y1))):
            corners.setdefault((cx, cy), {})[slot] = ctr
    corner_xy = list(corners)
    kn = len(corner_xy)
    corner_points = np.array(corner_xy, np.float32).reshape(1, kn, 2)
    corner_scores = np.full((1, kn), 0.8, np.float32)
    corner_polys = np.zeros((1, kn, 8), np.float32)
    corner_logics = np.zeros((1, kn, 2), np.float32)
    for k, (cx, cy) in enumerate(corner_xy):
        for slot in range(4):
            vx, vy = corners[(cx, cy)].get(slot, (cx, cy))
            corner_polys[0, k, 2 * slot : 2 * slot + 2] = [vx, vy]
        # logical coordinate of the corner = lattice index + 1
        corner_logics[0, k] = [(cx - 2) / 4 + 1, (cy - 2) / 4 + 1]
    for i, (x0, y0, x1, y1, col, row) in enumerate(cells):
        # slightly off the lattice: relocation must snap them back
        center_polys[0, i] = [x0 + 0.3, y0 + 0.2, x1 - 0.25, y0 + 0.3,
                              x1 - 0.2, y1 - 0.3, x0 + 0.25, y1 - 0.2]
    lc_map = np.zeros((1, 2, feat, feat), np.float32)
    for x0, y0, x1, y1, col, row in cells:
        lc_map[0, 0, y0:y1 + 1, x0:x1 + 1] = col
        lc_map[0, 1, y0:y1 + 1, x0:x1 + 1] = row
    return {
        "center_polygons": center_polys,
        "center_scores": center_scores,
        "center_spans": center_spans,
        "corner_polygons": corner_polys,
        "corner_scores": corner_scores,
        "corner_points": corner_points,
        "corner_logics": corner_logics,
        "lc": lc_map,
        "feat_size": (feat, feat),
    }, cells


def test_postprocessor_relocates_to_lattice_and_resolves_logic():
    decoded, cells = _grid_heads()
    post = TableCenterNetPostProcessorNumpy(center_thresh=0.5, corner_thresh=0.5)
    out = post(decoded)[0]
    assert out["polygons"].shape == (4, 4)
    # every cell relocated EXACTLY onto the lattice (all 4 corners
    # snapped), scores undecayed
    np.testing.assert_allclose(out["scores"], 0.9)
    got = sorted(
        (tuple(np.round(p * 16).astype(int)), tuple(lc))
        for p, lc in zip(out["polygons"], out["logical"])
    )
    want = sorted(
        ((x0, y0, x1, y1), (col - 1, col - 1, row - 1, row - 1))
        for x0, y0, x1, y1, col, row in cells
    )
    assert got == want


def test_postprocessor_score_decay_without_corners():
    decoded, _ = _grid_heads()
    decoded = dict(decoded)
    decoded["corner_scores"] = np.zeros_like(decoded["corner_scores"])  # no corners
    post = TableCenterNetPostProcessorNumpy(center_thresh=0.3, corner_thresh=0.5)
    out = post(decoded)[0]
    # cells optimized on <= 2 corners decay by 0.4 (base.py:164-167)
    np.testing.assert_allclose(out["scores"], 0.9 * 0.4, atol=1e-6)
    # logical coords still resolved from the lc map lookups
    assert set(map(tuple, out["logical"])) == {(0, 0, 0, 0), (1, 1, 0, 0), (0, 0, 1, 1), (1, 1, 1, 1)}


def test_postprocessor_not_relocate_keeps_raw_polygons():
    decoded, _ = _grid_heads()
    post = TableCenterNetPostProcessorNumpy(
        center_thresh=0.5, not_relocate=True, assume_straight_pages=False
    )
    out = post(decoded)[0]
    assert out["polygons"].shape == (4, 4, 2)
    # raw (un-snapped) corners survive
    assert not np.allclose(out["polygons"] * 16, np.round(out["polygons"] * 16))


# ---------------------------------------------------------- tower contract


@pytest.fixture(scope="module")
def tower():
    return small_tablecenternet()


def test_forward_heads_shapes(tower):
    x = RNG.rand(1, 3, 64, 64).astype(np.float32)
    heads = tower.forward_heads(x)
    assert set(heads) == {"hm", "reg", "ct2cn", "cn2ct", "lc", "sp"}
    for name, ch in (("hm", 2), ("reg", 2), ("ct2cn", 8), ("cn2ct", 8), ("lc", 2), ("sp", 2)):
        assert heads[name].shape == (1, ch, 16, 16)  # stride 4
        assert np.isfinite(heads[name]).all()


def test_forward_deterministic_pin(tower):
    x = np.linspace(0, 1, 3 * 64 * 64, dtype=np.float32).reshape(1, 3, 64, 64)
    h1 = tower.forward_heads(x)
    h2 = tower.forward_heads(x)
    d1 = hashlib.md5(np.round(h1["hm"], 5).tobytes()).hexdigest()
    d2 = hashlib.md5(np.round(h2["hm"], 5).tobytes()).hexdigest()
    assert d1 == d2


def test_decode_contract(tower):
    x = RNG.rand(1, 3, 64, 64).astype(np.float32)
    decoded = tower.decode(tower.forward_heads(x))
    assert decoded["center_polygons"].shape == (1, 50, 8)
    assert decoded["corner_polygons"].shape == (1, 80, 8)
    assert decoded["feat_size"] == (16, 16)
    # heatmap prior bias (-2.19) keeps random-weight scores low
    assert decoded["center_scores"].max() < 0.4


def test_predictor_contract(tower):
    crop = (RNG.rand(40, 70) * 255).astype(np.uint8)
    out = tower([crop])
    assert len(out) == 1
    assert set(out[0]) == {"cells", "num_rows", "num_cols"}
    for cell in out[0]["cells"]:
        assert set(cell) == {"geometry", "score", "row_start", "row_end", "col_start", "col_end"}


def test_weights_load_once():
    from doctr_ray import weights as W

    blob = random_tablecenternet_weights()
    before = W.LOAD_COUNT
    m = small_tablecenternet(weights=blob)
    assert W.LOAD_COUNT == before + 1
    m([np.full((32, 32), 255, np.uint8)])
    assert W.LOAD_COUNT == before + 1


def test_shape_inference_from_blob():
    blob = random_tablecenternet_weights(depths=(1, 2, 1, 1), base_dim=8)
    m = TableCenterNetNumpy(blob, input_size=64)
    assert m.depths == [1, 2, 1, 1] and m.num_stages == 5


# ----------------------------------------------------------------- zoo slot


def test_table_predictor_factory():
    from doctr_ray.zoo import table_predictor

    with pytest.raises(ValueError, match="unknown"):
        table_predictor("resnet")
    m = table_predictor("tablecenternet", weights=random_tablecenternet_weights(),
                        input_size=64, center_k=50, corner_k=80)
    assert isinstance(m, TableCenterNetNumpy)
    assert table_predictor(m) is m
    lattice = table_predictor("lattice_detect")
    crop = np.full((40, 40), 255, np.uint8)
    out = lattice([crop])
    assert out[0]["num_rows"] == 0 and out[0]["cells"] == []


def test_lattice_table_predictor_on_real_grid():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import table_predictor

    page = rasterize_synth(encode_media_ref("aa bb cc dd", 640, 480, table=(2, 2)))[0].image
    grids = table_predictor("lattice_detect")([page])
    assert grids[0]["num_rows"] == 2 and grids[0]["num_cols"] == 2
    assert len(grids[0]["cells"]) == 4
    cell = grids[0]["cells"][0]
    assert {"geometry", "score", "row_start", "row_end", "col_start", "col_end"} <= set(cell)


def test_ocr_predictor_table_arch_instance_slot():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor, table_predictor

    page = rasterize_synth(encode_media_ref("aa bb cc dd", 640, 480, table=(2, 2)))[0].image
    pred = ocr_predictor(detect_tables=True, table_arch=table_predictor("lattice_detect"))
    ex = pred.forward_pages([page])[0]
    assert len(ex["tables"]) == 1
    assert ex["tables"][0]["num_rows"] == 2 and ex["tables"][0]["num_cols"] == 2
