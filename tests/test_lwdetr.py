"""Numpy LW-DETR layout tower: each kernel differentially tested
against a naive obviously-correct implementation (torch/cv2 are
absent, so the per-op math — torch's / OpenCV's documented equations —
is the oracle), plus the postprocessor contract, the end-to-end shape
contract, a fixed-seed determinism pin, load-once weights accounting,
and the zoo's layout slot (instance-not-name, detect_layout /
ignore_regions / detect_tables wiring)."""

import hashlib

import numpy as np
import pytest

from doctr_ray.lwdetr import (
    LAYOUT_CLASSES,
    LWDETRNumpy,
    LWDETRPostProcessorNumpy,
    box_points,
    channel_layer_norm,
    convex_clip,
    convex_iou,
    gen_sine_position_embeddings,
    grid_sample_bilinear,
    mlp_head,
    order_points,
    polygon_area,
    random_lwdetr_weights,
    refine_obb_boxes,
    silu,
    small_lwdetr,
)

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------- kernels


def test_silu_matches_definition():
    x = RNG.standard_normal(100).astype(np.float32)
    want = x * (1.0 / (1.0 + np.exp(-x)))
    np.testing.assert_allclose(silu(x), want, rtol=1e-6)


def test_channel_layer_norm_matches_naive():
    x = RNG.standard_normal((2, 6, 3, 4)).astype(np.float32)
    w = RNG.rand(6).astype(np.float32)
    b = RNG.rand(6).astype(np.float32)
    got = channel_layer_norm(x, w, b)
    for n in range(2):
        for i in range(3):
            for j in range(4):
                col = x[n, :, i, j].astype(np.float64)
                want = (col - col.mean()) / np.sqrt(((col - col.mean()) ** 2).mean() + 1e-6)
                want = want * w + b
                np.testing.assert_allclose(got[n, :, i, j], want, rtol=1e-4, atol=1e-5)


def test_refine_obb_boxes_matches_naive():
    ref = RNG.rand(5, 6).astype(np.float32)
    ref[:, 4:] = ref[:, 4:] * 2 - 1
    delta = (RNG.standard_normal((5, 6)) * 2).astype(np.float32)
    got = refine_obb_boxes(ref, delta)
    for i in range(5):
        cx, cy, w, h, sr, cr = (float(v) for v in ref[i])
        dcx, dcy, dw, dh, ds, dc = (float(v) for v in delta[i])
        n = max(np.hypot(ds, dc), 1e-6)
        ds, dc = ds / n, dc / n
        want_cx, want_cy = dcx * w + cx, dcy * h + cy
        want_w = np.exp(np.clip(dw, -5, 3.5)) * w
        want_h = np.exp(np.clip(dh, -5, 3.5)) * h
        s_new = sr * dc + cr * ds
        c_new = cr * dc - sr * ds
        n2 = max(np.hypot(s_new, c_new), 1e-6)
        want = [want_cx, want_cy, want_w, want_h, s_new / n2, c_new / n2]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_mlp_head_relu_placement():
    p = {
        "h.layers.0.weight": np.array([[1.0, -1.0]], np.float32),
        "h.layers.0.bias": np.array([0.0], np.float32),
        "h.layers.1.weight": np.array([[-2.0]], np.float32),
        "h.layers.1.bias": np.array([1.0], np.float32),
    }
    x = np.array([[2.0, 1.0], [1.0, 2.0]], np.float32)
    # layer0 -> [1, -1], relu -> [1, 0], layer1 (linear, NO relu) -> [-1, 1]
    np.testing.assert_allclose(mlp_head(x, p, "h", 2).ravel(), [-1.0, 1.0])


def _grid_sample_naive(v, grid):
    N, C, H, W = v.shape
    _, Q, P, _ = grid.shape
    out = np.zeros((N, C, Q, P))
    for n in range(N):
        for q in range(Q):
            for p_ in range(P):
                gx = (grid[n, q, p_, 0] + 1) * W / 2 - 0.5
                gy = (grid[n, q, p_, 1] + 1) * H / 2 - 0.5
                x0, y0 = int(np.floor(gx)), int(np.floor(gy))
                for dx in (0, 1):
                    for dy in (0, 1):
                        xi, yi = x0 + dx, y0 + dy
                        wgt = (1 - abs(gx - xi)) * (1 - abs(gy - yi))
                        if 0 <= xi < W and 0 <= yi < H:
                            out[n, :, q, p_] += v[n, :, yi, xi] * wgt
    return out


def test_grid_sample_bilinear_matches_naive():
    v = RNG.standard_normal((3, 4, 5, 6)).astype(np.float64)
    grid = (RNG.rand(3, 7, 2, 2) * 2.6 - 1.3).astype(np.float64)  # includes OOB
    np.testing.assert_allclose(
        grid_sample_bilinear(v, grid), _grid_sample_naive(v, grid), atol=1e-10
    )


def test_grid_sample_center_alignment():
    """align_corners=False: grid 0 maps to the pixel-center average."""
    v = np.arange(4, dtype=np.float64).reshape(1, 1, 2, 2)
    got = grid_sample_bilinear(v, np.zeros((1, 1, 1, 2)))
    np.testing.assert_allclose(got.ravel(), [v.mean()])


def test_sine_position_embeddings_match_naive():
    pos = RNG.rand(2, 3, 4).astype(np.float32)
    hidden = 8
    got = gen_sine_position_embeddings(pos, hidden)
    assert got.shape == (2, 3, 2 * hidden)
    dim = hidden // 2
    dim_t = 10000.0 ** (2 * (np.arange(dim) // 2) / dim)
    for b in range(2):
        for q in range(3):
            parts = []
            for coord in (pos[b, q, 1], pos[b, q, 0], pos[b, q, 2], pos[b, q, 3]):
                v = coord * 2 * np.pi / dim_t
                emb = np.stack([np.sin(v[0::2]), np.cos(v[1::2])], axis=1).reshape(-1)
                parts.append(emb)
            np.testing.assert_allclose(got[b, q], np.concatenate(parts), atol=1e-5)


# ------------------------------------------------------- polygon geometry


def test_box_points_axis_aligned():
    # cv2.boxPoints order for angle 0: BL, TL, TR, BR
    pts = box_points(1.0, 2.0, 4.0, 2.0, 0.0)
    np.testing.assert_allclose(pts, [[-1, 3], [-1, 1], [3, 1], [3, 3]])


def test_box_points_rotation_preserves_shape():
    pts = box_points(5.0, 5.0, 4.0, 2.0, 30.0)
    sides = [np.linalg.norm(pts[(i + 1) % 4] - pts[i]) for i in range(4)]
    np.testing.assert_allclose(sorted(sides), [2, 2, 4, 4], atol=1e-5)
    np.testing.assert_allclose(pts.mean(axis=0), [5, 5], atol=1e-5)
    np.testing.assert_allclose(polygon_area(pts.astype(np.float64)), 8.0, atol=1e-4)


def test_order_points_tl_tr_br_bl():
    quad = np.array([[10, 10], [20, 10], [20, 18], [10, 18]], float)
    for _ in range(6):
        perm = quad[RNG.permutation(4)]
        np.testing.assert_allclose(order_points(perm), quad)


def test_convex_clip_half_overlap():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    b = a + [0.5, 0.0]
    inter = convex_clip(a, b)
    assert polygon_area(inter) == pytest.approx(0.5, abs=1e-9)


def test_convex_iou_exact_cases():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    assert convex_iou(sq, sq) == pytest.approx(1.0, abs=1e-5)
    assert convex_iou(sq, sq + 10) == 0.0
    # 45-degree square inscribed: intersection is that diamond (area 2)
    diamond = np.array([[1, 0], [2, 1], [1, 2], [0, 1]], float)
    assert convex_iou(sq, diamond) == pytest.approx(2.0 / (4 + 2 - 2), abs=1e-5)
    # clip orientation must not matter
    assert convex_iou(sq, diamond[::-1]) == pytest.approx(convex_iou(sq, diamond), abs=1e-9)


def test_convex_iou_matches_monte_carlo():
    rng = np.random.RandomState(3)
    for _ in range(5):
        p1 = order_points(box_points(*rng.rand(2) * 4 + 2, *(rng.rand(2) * 3 + 1), rng.rand() * 180))
        p2 = order_points(box_points(*rng.rand(2) * 4 + 2, *(rng.rand(2) * 3 + 1), rng.rand() * 180))
        pts = rng.rand(60000, 2) * 10

        def inside(poly, q):
            sign = np.ones(len(q), bool)
            for i in range(4):
                a, b = poly[i], poly[(i + 1) % 4]
                cross = (b[0] - a[0]) * (q[:, 1] - a[1]) - (b[1] - a[1]) * (q[:, 0] - a[0])
                sign &= cross >= 0 if polygon_signed(poly) > 0 else cross <= 0
            return sign

        def polygon_signed(poly):
            x, y = poly[:, 0], poly[:, 1]
            return np.sum(x * np.roll(y, -1) - y * np.roll(x, -1))

        in1, in2 = inside(p1, pts), inside(p2, pts)
        inter = (in1 & in2).mean() * 100
        union = (in1 | in2).mean() * 100
        if union < 1e-9:
            continue
        mc = inter / union
        assert convex_iou(p1, p2) == pytest.approx(mc, abs=0.02)


# ------------------------------------------------------- postprocessor


def _obb(cx, cy, w, h):
    return [cx, cy, w, h, 0.0, 1.0]


def test_postprocessor_threshold_and_labels():
    post = LWDETRPostProcessorNumpy(num_classes=3, score_thresh=0.5, iou_thresh=0.5)
    logits = np.full((1, 4, 3), -10.0, np.float32)
    logits[0, 0, 1] = 4.0  # strong class-1 at query 0
    logits[0, 2, 2] = 3.0  # strong class-2 at query 2
    boxes = np.array(
        [[_obb(0.2, 0.2, 0.1, 0.1), _obb(0.8, 0.8, 0.1, 0.1),
          _obb(0.5, 0.5, 0.2, 0.1), _obb(0.3, 0.7, 0.1, 0.1)]],
        np.float32,
    )
    labels, out_boxes, scores = post(logits, boxes)[0]
    assert labels == [1, 2]
    assert all(s > 0.5 for s in scores)
    # straight output: (xmin, ymin, xmax, ymax) of the first box
    np.testing.assert_allclose(out_boxes[0], [0.15, 0.15, 0.25, 0.25], atol=1e-5)


def test_postprocessor_nms_suppresses_same_class_only():
    post = LWDETRPostProcessorNumpy(num_classes=2, score_thresh=0.3, iou_thresh=0.5)
    logits = np.full((1, 3, 2), -10.0, np.float32)
    logits[0, 0, 0] = 3.0   # box A class 0 (stronger)
    logits[0, 1, 0] = 2.0   # overlapping box class 0 -> suppressed
    logits[0, 2, 1] = 2.0   # same place, class 1 -> kept
    same = _obb(0.5, 0.5, 0.2, 0.2)
    boxes = np.array([[same, same, same]], np.float32)
    labels, out_boxes, scores = post(logits, boxes)[0]
    assert sorted(labels) == [0, 1]
    assert len(out_boxes) == 2


def test_postprocessor_rotated_output_shape():
    post = LWDETRPostProcessorNumpy(num_classes=1, score_thresh=0.3, assume_straight_pages=False)
    logits = np.array([[[3.0]]], np.float32)
    boxes = np.array([[[0.5, 0.5, 0.4, 0.2, np.sin(0.3), np.cos(0.3)]]], np.float32)
    labels, out_boxes, scores = post(logits, boxes)[0]
    assert out_boxes.shape == (1, 4, 2)
    # polygon center is the OBB center
    np.testing.assert_allclose(out_boxes[0].mean(axis=0), [0.5, 0.5], atol=1e-5)


def test_postprocessor_empty_when_all_below_threshold():
    post = LWDETRPostProcessorNumpy(num_classes=2, score_thresh=0.99)
    logits = np.zeros((1, 4, 2), np.float32)
    boxes = np.tile(np.array(_obb(0.5, 0.5, 0.1, 0.1), np.float32), (1, 4, 1))
    labels, out_boxes, scores = post(logits, boxes)[0]
    assert labels == [] and len(out_boxes) == 0 and scores == []


# ---------------------------------------------------------- tower contract


@pytest.fixture(scope="module")
def tower():
    return small_lwdetr()


def test_forward_shapes_and_finiteness(tower):
    x = RNG.rand(2, 3, 128, 128).astype(np.float32)
    logits, boxes = tower.forward(x)
    assert logits.shape == (2, tower.num_queries, 11)
    assert boxes.shape == (2, tower.num_queries, 6)
    assert np.isfinite(logits).all() and np.isfinite(boxes).all()
    # rotation components stay unit-normalized
    np.testing.assert_allclose(
        np.hypot(boxes[..., 4], boxes[..., 5]), 1.0, atol=1e-4
    )


def test_forward_deterministic_pin(tower):
    x = np.linspace(0, 1, 3 * 128 * 128, dtype=np.float32).reshape(1, 3, 128, 128)
    logits, boxes = tower.forward(x)
    digest = hashlib.md5(
        np.round(np.concatenate([logits.ravel(), boxes.ravel()]), 4).tobytes()
    ).hexdigest()
    logits2, boxes2 = tower.forward(x)
    digest2 = hashlib.md5(
        np.round(np.concatenate([logits2.ravel(), boxes2.ravel()]), 4).tobytes()
    ).hexdigest()
    assert digest == digest2  # bit-stable across calls


def test_padding_mask_changes_predictions(tower):
    x = RNG.rand(1, 3, 128, 128).astype(np.float32)
    full = np.ones((1, 128, 128), bool)
    half = full.copy()
    half[:, :, 64:] = False
    lg_full, _ = tower.forward(x, full)
    lg_half, _ = tower.forward(x, half)
    assert not np.allclose(lg_full, lg_half)


def test_resize_valid_mask_any_semantics():
    mask = np.zeros((1, 8, 8), bool)
    mask[0, 0, 0] = True  # one valid pixel in the top-left 4x4 cell
    got = LWDETRNumpy._resize_valid_mask(mask, (2, 2))
    assert got[0, 0, 0] and not got[0, 0, 1] and not got[0, 1, 0]


def test_encoder_proposals_grid_values(tower):
    enc = np.ones((1, 4, tower.d_model), np.float32)
    valid = np.array([[True, True, True, False]])
    oq, props, invalid = tower.gen_encoder_output_proposals(enc, valid, [(2, 2)])
    # cell centers of a 2x2 grid
    np.testing.assert_allclose(props[0, 0, :2], [0.25, 0.25])
    np.testing.assert_allclose(props[0, 3, :2], [0, 0])  # invalid -> zeroed
    np.testing.assert_allclose(props[0, 1, 2:4], [0.05, 0.05])
    assert invalid[0, 3, 0] and not invalid[0, 0, 0]
    assert (oq[0, 3] == 0).all()


def test_page_contract_and_padding_removal(tower):
    page = (RNG.rand(100, 160) * 255).astype(np.uint8)
    out = tower([page])
    assert len(out) == 1
    res = out[0]
    assert set(res) == {"class_names", "boxes", "scores"}
    assert all(n in LAYOUT_CLASSES for n in res["class_names"])
    assert res["boxes"].shape == (len(res["class_names"]), 4)
    assert len(res["scores"]) == len(res["class_names"])
    assert (res["boxes"] >= 0).all() and (res["boxes"] <= 1).all()


def test_weights_load_once_per_instance():
    from doctr_ray import weights as W

    blob = random_lwdetr_weights()
    before = W.LOAD_COUNT
    m = small_lwdetr(weights=blob)
    assert W.LOAD_COUNT == before + 1
    m([np.full((64, 64), 255, np.uint8)])
    m([np.full((64, 64), 255, np.uint8)])
    assert W.LOAD_COUNT == before + 1  # no per-call reload


def test_class_names_must_match_checkpoint():
    with pytest.raises(ValueError, match="classes"):
        LWDETRNumpy(random_lwdetr_weights(), class_names=["a", "b"], group_detr=2)


def test_shape_inference_from_blob():
    blob = random_lwdetr_weights(num_queries=9, group_detr=3, dec_layers=3, vit_num_layers=2)
    m = LWDETRNumpy(
        blob, group_detr=3, vit_num_heads=4, sa_num_heads=4, ca_num_heads=4,
        input_size=128, window_block_indexes=(0,), out_feature_indexes=(0, 1),
    )
    assert m.num_queries == 9 and m.dec_layers == 3 and m.vit_num_layers == 2
    assert m.c2f_num_blocks == 3


# ----------------------------------------------------------------- zoo slot


def test_layout_predictor_factory():
    from doctr_ray.zoo import ComponentClassifyLayout, layout_predictor

    assert isinstance(layout_predictor("lw_detr_s"), ComponentClassifyLayout)
    assert isinstance(layout_predictor("component_classify"), ComponentClassifyLayout)
    with pytest.raises(ValueError, match="unknown"):
        layout_predictor("resnet50")
    # weights route a name to the real tower
    m = layout_predictor(
        "lw_detr_s", weights=random_lwdetr_weights(), group_detr=2,
        vit_num_heads=4, sa_num_heads=4, ca_num_heads=4, input_size=128,
        window_block_indexes=(0, 2), out_feature_indexes=(1, 3),
    )
    assert isinstance(m, LWDETRNumpy)
    # instance-not-name passthrough
    assert layout_predictor(m) is m


def test_ocr_predictor_detect_layout_export():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    page = rasterize_synth(
        encode_media_ref("alpha beta gamma delta", 480, 360, artefacts=2)
    )[0].image
    ex = ocr_predictor(detect_layout=True).forward_pages([page])[0]
    assert len(ex["layout"]) >= 4
    for region in ex["layout"]:
        assert set(region) == {"geometry", "type", "confidence"}
        assert region["type"] in LAYOUT_CLASSES
    types = {r["type"] for r in ex["layout"]}
    assert "Text" in types and "Picture" in types
    # without the flag the export carries no layout key
    assert "layout" not in ocr_predictor().forward_pages([page])[0]


def test_ocr_predictor_ignore_regions_masks_before_detection():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    page = rasterize_synth(
        encode_media_ref("alpha beta gamma delta", 480, 360, artefacts=2)
    )[0].image
    plain = ocr_predictor(detect_layout=True).forward_pages([page])[0]
    masked = ocr_predictor(
        detect_layout=True, ignore_regions=["Picture"]
    ).forward_pages([page])[0]
    n = lambda e: sum(len(l["words"]) for b in e["blocks"] for l in b["lines"])
    assert n(masked) < n(plain)  # pictures no longer reach detection
    # the text words survive masking
    words = {w["value"] for b in masked["blocks"] for l in b["lines"] for w in l["words"]}
    assert {"alpha", "beta", "gamma", "delta"} <= words


def test_ocr_predictor_detect_tables_export():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    page = rasterize_synth(
        encode_media_ref("aa bb cc dd", 640, 480, table=(2, 2))
    )[0].image
    ex = ocr_predictor(detect_tables=True).forward_pages([page])[0]
    assert len(ex["tables"]) == 1
    assert ex["tables"][0]["num_rows"] == 2 and ex["tables"][0]["num_cols"] == 2
    # layout regions ride along (the reference builds the layout model
    # whenever tables are requested, models/zoo.py:57-68)
    assert "layout" in ex


def test_ocr_predictor_lwdetr_instance_slot():
    from doctr_ray.media import encode_media_ref, rasterize_synth
    from doctr_ray.zoo import ocr_predictor

    page = rasterize_synth(encode_media_ref("alpha beta", 480, 360))[0].image
    tower = small_lwdetr(score_thresh=0.99)  # random weights: keep none
    ex = ocr_predictor(detect_layout=True, layout_arch=tower).forward_pages([page])[0]
    assert ex["layout"] == []  # slot ran (key present), nothing above threshold
    words = {w["value"] for b in ex["blocks"] for l in b["lines"] for w in l["words"]}
    assert {"alpha", "beta"} <= words
