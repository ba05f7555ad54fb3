"""Tests for per-class NMS, numpy NMS mirror, WBF, label maps, mAP metric."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.ops import nms, nms_np, postprocess, wbf
from mladversarialobjectdetection_tpu.utils import coco_metric, label_util


def test_nms_np_matches_device_nms():
    rng = np.random.RandomState(0)
    n = 30
    centers = rng.uniform(20, 100, (n, 2))
    sizes = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    for method in ("hard", "gaussian"):
        idx_np, sc_np, _ = nms_np.nms_np(boxes, scores, method=method,
                                         score_thresh=0.2,
                                         max_output_size=10)
        dev = nms.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                             method=method, score_thresh=0.2,
                             max_output_size=10)
        k = int(dev.valid_len)
        assert list(idx_np) == list(np.asarray(dev.indices[:k])), method
        assert np.allclose(sc_np, np.asarray(dev.scores[:k]), atol=1e-5)


def test_per_class_nms_np():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    classes = np.array([0, 0, 1])
    bx, sc, cl = nms_np.per_class_nms(boxes, scores, classes, method="hard",
                                      iou_thresh=0.5, score_thresh=0.1)
    # class 0: second box suppressed; class 1: identical box survives
    assert len(sc) == 2
    assert set(cl.tolist()) == {0, 1}


def test_postprocess_per_class_class_isolation():
    """Same-coordinate boxes of different classes must NOT suppress each
    other in per-class mode, but do in global mode."""
    params = {
        "num_classes": 3, "min_level": 3, "max_level": 3, "num_scales": 1,
        "aspect_ratios": [1.0], "anchor_scale": 4.0, "image_size": 64,
        "nms_configs": {"method": "hard", "iou_thresh": 0.5,
                        "score_thresh": 0.01, "sigma": None,
                        "max_output_size": 8, "pre_nms_topk": 64},
    }
    # one level, 8x8 grid, 1 anchor, 3 classes
    cls_out = jnp.full((1, 8, 8, 3), -9.0)
    # two neighboring cells with high logits for different classes: their
    # decoded boxes (32x32 anchors at stride 8) overlap heavily
    cls_out = cls_out.at[0, 3, 3, 0].set(4.0)
    cls_out = cls_out.at[0, 3, 4, 1].set(3.0)
    box_out = jnp.zeros((1, 8, 8, 4))
    det_pc = postprocess.postprocess_per_class(params, [cls_out], [box_out])
    det_gl = postprocess.postprocess_global(params, [cls_out], [box_out])
    assert int(det_pc.valid_len[0]) == 2   # different classes both survive
    assert int(det_gl.valid_len[0]) == 1   # global NMS suppresses one


def test_wbf_fuses_overlapping():
    b1 = np.array([[0, 0, 10, 10]], np.float64)
    b2 = np.array([[1, 1, 11, 11]], np.float64)
    bx, sc, cl = wbf.weighted_boxes_fusion(
        [b1, b2], [np.array([0.8]), np.array([0.6])],
        [np.array([1]), np.array([1])])
    assert bx.shape == (1, 4)
    # score-weighted average leans toward the higher-scored box
    assert 0.0 < bx[0][0] < 1.0
    assert sc[0] == pytest.approx(0.7)


def test_wbf_keeps_distinct():
    b1 = np.array([[0, 0, 10, 10]], np.float64)
    b2 = np.array([[50, 50, 60, 60]], np.float64)
    bx, sc, cl = wbf.weighted_boxes_fusion(
        [b1, b2], [np.array([0.8]), np.array([0.6])],
        [np.array([1]), np.array([1])])
    assert bx.shape == (2, 4)
    # single-model clusters get down-weighted by the vote fraction
    assert sc[0] == pytest.approx(0.4)


def test_label_map():
    assert label_util.get_label_map("coco")[1] == "person"
    assert label_util.get_label_map(None)[1] == "person"
    assert label_util.get_label_map("voc")[15] == "person"
    assert label_util.get_label_map({1: "x"})[1] == "x"


def test_coco_metric_perfect_detection():
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]])
    ev.add_image(gt, [0.9, 0.8], [1, 1], gt, [1, 1])
    res = ev.result()
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_coco_metric_misses_and_fps():
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]])
    # one correct detection, one far-off false positive, one gt missed
    det = np.array([[0, 0, 10, 10], [100, 100, 120, 120]])
    ev.add_image(det, [0.9, 0.8], [1, 1], gt, [1, 1])
    res = ev.result()
    assert 0.0 < res["AP"] < 1.0
    # AP50: precision .5 at recall .5 -> ~0.5 with 101-pt interpolation
    assert res["AP50"] == pytest.approx(0.5, abs=0.02)


def test_coco_metric_localization_quality():
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0, 0, 10, 10]])
    det = np.array([[0, 0, 10, 8]])  # IoU 0.8: counts at .5-.75, not .8+
    ev.add_image(det, [0.9], [1], gt, [1])
    res = ev.result()
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)
    assert res["AP"] < 1.0
    # IoU .8 matches thresholds .5 .55 .6 .65 .7 .75 (6 of 10) exactly
    assert res["AP"] == pytest.approx(0.6)
    assert res["ARmax100"] == pytest.approx(0.6)


def test_coco_metric_full_suite_hand_computed():
    """Hand-computed pycocotools COCOeval outcome (exact IoU matches so
    every threshold behaves identically):

    img0: gt large (100x100), TP det @.9 + FP det @.85 (large, far off).
    img1: gt small (20x20), TP det @.8 + FP det @.7 (10x10, small).

    all-area: score order .9 TP, .85 FP, .8 TP, .7 FP over n_gt 2:
      rc=[.5,.5,1,1], pr=[1,.5,2/3,.5] -> envelope [1,2/3,2/3,2/3];
      101-pt AP = (51 + 50*2/3)/101.
    small: only img1 counts (img0's gt/dets out of range -> ignored):
      .8 TP then .7 FP over n_gt 1 -> AP 1.
    large: only img0's TP survives (img1's dets ignored; the .85 FP is
      large and in-range -> FP after recall 1 -> shadowed) ->
      rc=[1,1] pr=[1,.5] -> AP 1.
    """
    ev = coco_metric.COCOEvaluator()
    ev.add_image(np.array([[0., 0., 100., 100.], [150., 150., 250., 250.]]),
                 [0.9, 0.85], [1, 1],
                 np.array([[0., 0., 100., 100.]]), [1])
    ev.add_image(np.array([[0., 0., 20., 20.], [50., 50., 60., 60.]]),
                 [0.8, 0.7], [1, 1],
                 np.array([[0., 0., 20., 20.]]), [1])
    res = ev.result()
    expected_ap = (51 + 50 * (2.0 / 3.0)) / 101
    assert res["AP"] == pytest.approx(expected_ap, abs=1e-9)
    assert res["AP50"] == pytest.approx(expected_ap, abs=1e-9)
    assert res["AP75"] == pytest.approx(expected_ap, abs=1e-9)
    assert res["APs"] == pytest.approx(1.0)
    assert res["APl"] == pytest.approx(1.0)
    assert res["APm"] == -1.0  # no medium gt anywhere: pycocotools -1
    assert res["ARmax1"] == pytest.approx(1.0)   # top-1 per image is the TP
    assert res["ARmax100"] == pytest.approx(1.0)
    assert res["ARs"] == pytest.approx(1.0)
    assert res["ARl"] == pytest.approx(1.0)
    assert res["ARm"] == -1.0


def test_coco_metric_maxdets_and_per_class():
    """maxDet=1 drops the second-best det per image; per-class output."""
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0., 0., 50., 50.], [100., 100., 150., 150.]])
    # both gts detected, but the better-scored det is on gt0
    ev.add_image(gt, [0.9, 0.8], [1, 1], gt, [1, 1])
    # second class, undetected
    ev.add_image(np.zeros((0, 4)), [], [],
                 np.array([[0., 0., 40., 40.]]), [2])
    res = ev.result(per_class=True)
    # class 1: AR@1 = .5 (only gt0 matched under maxDet 1); class 2: 0
    assert res["ARmax1"] == pytest.approx(0.25)
    assert res["ARmax100"] == pytest.approx(0.5)
    assert res["AP_/1"] == pytest.approx(1.0)
    assert res["AP_/2"] == pytest.approx(0.0)


def test_coco_metric_crowd_ignore():
    """A detection matching only a crowd region is ignored, not a false
    positive (COCOeval gtIg semantics; crowd IoU = intersection over det
    area), and crowd gts don't count toward recall denominators."""
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0., 0., 10., 10.], [50., 50., 150., 150.]])
    # det B sits fully inside the crowd region (crowd IoU 1.0, standard
    # IoU only .04) and outscores the TP: treated as a normal gt it
    # would be a leading FP over n_gt=2 -> AP ~.25; as a crowd it is
    # ignored and the remaining TP covers the single real gt -> AP 1.
    det = np.array([[0., 0., 10., 10.], [60., 60., 80., 80.]])
    ev.add_image(det, [0.8, 0.9], [1, 1], gt, [1, 1],
                 gt_is_crowd=[False, True])
    res = ev.result()
    assert res["AP"] == pytest.approx(1.0)
    assert res["ARmax100"] == pytest.approx(1.0)


def test_coco_metric_crowd_multi_match():
    """One crowd region absorbs (ignores) MULTIPLE detections — crowds
    are never consumed by a match (COCOeval: gtm set but crowds stay
    matchable)."""
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0., 0., 10., 10.], [50., 50., 150., 150.]])
    det = np.array([[0., 0., 10., 10.], [60., 60., 80., 80.],
                    [90., 90., 120., 120.]])
    ev.add_image(det, [0.7, 0.9, 0.8], [1, 1, 1], gt, [1, 1],
                 gt_is_crowd=[0, 1])
    res = ev.result()
    assert res["AP"] == pytest.approx(1.0)


def test_coco_metric_area_bounds_inclusive():
    """A 32x32 gt (area exactly 32^2) belongs to BOTH 'small' and
    'medium' — pycocotools aRng bounds are inclusive on both ends."""
    ev = coco_metric.COCOEvaluator()
    gt = np.array([[0., 0., 32., 32.]])
    ev.add_image(gt, [0.9], [1], gt, [1])
    res = ev.result()
    assert res["APs"] == pytest.approx(1.0)
    assert res["APm"] == pytest.approx(1.0)
    assert res["APl"] == -1.0


def test_coco_metric_matches_pycocotools_if_available():
    """Randomized cross-check against pycocotools (skipped where the
    package is unavailable; runs in richer environments)."""
    cocoeval_mod = pytest.importorskip("pycocotools.cocoeval")
    coco_mod = pytest.importorskip("pycocotools.coco")
    rng = np.random.RandomState(0)
    images, anns, dets = [], [], []
    ann_id = 1
    ev = coco_metric.COCOEvaluator()
    for img_id in range(1, 5):
        images.append({"id": img_id, "height": 300, "width": 300})
        n_gt = rng.randint(1, 5)
        g_yx = rng.uniform(0, 200, (n_gt, 2))
        g_wh = rng.uniform(10, 100, (n_gt, 2))
        g_boxes = np.concatenate([g_yx, g_yx + g_wh], 1)
        g_cls = rng.randint(1, 3, n_gt)
        g_crowd = rng.rand(n_gt) < 0.25
        for b, c, cr in zip(g_boxes, g_cls, g_crowd):
            anns.append({"id": ann_id, "image_id": img_id,
                         "category_id": int(c), "iscrowd": int(cr),
                         "bbox": [b[1], b[0], b[3] - b[1], b[2] - b[0]],
                         "area": float((b[2] - b[0]) * (b[3] - b[1]))})
            ann_id += 1
        n_dt = rng.randint(1, 6)
        pick = rng.randint(0, n_gt, n_dt)
        d_boxes = g_boxes[pick] + rng.uniform(-15, 15, (n_dt, 4))
        d_cls = g_cls[pick]
        d_scores = rng.uniform(0.1, 1.0, n_dt)
        for b, c, s in zip(d_boxes, d_cls, d_scores):
            dets.append({"image_id": img_id, "category_id": int(c),
                         "bbox": [b[1], b[0], b[3] - b[1], b[2] - b[0]],
                         "score": float(s)})
        ev.add_image(d_boxes, d_scores, d_cls, g_boxes, g_cls,
                     gt_is_crowd=g_crowd)

    gt_coco = coco_mod.COCO()
    gt_coco.dataset = {"images": images, "annotations": anns,
                       "categories": [{"id": 1}, {"id": 2}]}
    gt_coco.createIndex()
    ce = cocoeval_mod.COCOeval(gt_coco, gt_coco.loadRes(dets), "bbox")
    ce.evaluate(); ce.accumulate(); ce.summarize()
    ours = ev.result()
    keys = ["AP", "AP50", "AP75", "APs", "APm", "APl",
            "ARmax1", "ARmax10", "ARmax100", "ARs", "ARm", "ARl"]
    for i, k in enumerate(keys):
        assert ours[k] == pytest.approx(float(ce.stats[i]), abs=1e-6), k


def test_approx_topk_candidate_selection():
    """`nms_configs.pre_nms_approx_topk` swaps exact lax.top_k for
    lax.approx_max_k in every postprocess mode. On CPU the approx op
    lowers to an exact sort, so detections must be identical to the
    exact path; on TPU only the candidate tail may differ (recall-target
    semantics). Covers bool and float-recall forms of the knob."""
    rng = np.random.RandomState(0)
    params = {
        "num_classes": 4, "min_level": 3, "max_level": 4, "num_scales": 2,
        "aspect_ratios": [1.0, 2.0], "anchor_scale": 4.0, "image_size": 64,
        "nms_configs": {"method": "hard", "iou_thresh": 0.5,
                        "score_thresh": 0.0, "sigma": None,
                        "max_output_size": 16, "pre_nms_topk": 32},
    }
    cls_outs = [jnp.asarray(rng.randn(2, 8, 8, 4 * 4), jnp.float32),
                jnp.asarray(rng.randn(2, 4, 4, 4 * 4), jnp.float32)]
    box_outs = [jnp.asarray(rng.randn(2, 8, 8, 4 * 4) * 0.1, jnp.float32),
                jnp.asarray(rng.randn(2, 4, 4, 4 * 4) * 0.1, jnp.float32)]

    for mode in (postprocess.postprocess_global,
                 postprocess.postprocess_per_class,
                 postprocess.postprocess_combined):
        exact = mode(params, cls_outs, box_outs)
        for knob in (True, 0.9):
            p2 = dict(params)
            p2["nms_configs"] = dict(params["nms_configs"],
                                     pre_nms_approx_topk=knob)
            approx = mode(p2, cls_outs, box_outs)
            np.testing.assert_allclose(np.asarray(exact.boxes),
                                       np.asarray(approx.boxes), atol=1e-5)
            np.testing.assert_allclose(np.asarray(exact.scores),
                                       np.asarray(approx.scores), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(exact.classes),
                                          np.asarray(approx.classes))


def test_decode_after_select_matches_decode_all():
    """Decode-after-select parity (reference tf2/postprocess.py:88-116
    max_nms_inputs ordering): the shipped candidate selection decodes only
    the top-k anchors' regressions; it must be EXACTLY the decode-all
    (`pre_nms` / `pre_nms_multiclass`) path followed by gather — box decode
    is per-anchor elementwise, so the reorder is identity. Pinned here for
    max_reduce selection, the combined (anchor, class) flat selection, and
    the TFLite fast-NMS path."""
    from mladversarialobjectdetection_tpu.ops.anchors import (
        Anchors, decode_box_outputs)
    rng = np.random.RandomState(7)
    params = {
        "num_classes": 5, "min_level": 3, "max_level": 4, "num_scales": 2,
        "aspect_ratios": [1.0, 2.0], "anchor_scale": 4.0, "image_size": 64,
        "nms_configs": {"method": "hard", "iou_thresh": 0.5,
                        "score_thresh": 0.0, "sigma": None,
                        "max_output_size": 16, "pre_nms_topk": 48},
    }
    c = params["num_classes"]
    cls_outs = [jnp.asarray(rng.randn(2, 8, 8, 4 * c) * 3, jnp.float32),
                jnp.asarray(rng.randn(2, 4, 4, 4 * c) * 3, jnp.float32)]
    box_outs = [jnp.asarray(rng.randn(2, 8, 8, 4 * 4) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(2, 4, 4, 4 * 4) * 0.3, jnp.float32)]

    # 1) max_reduce selection (postprocess_global / per_class candidate set)
    sel_boxes, sel_scores, sel_classes = postprocess._pre_nms_select(
        params, cls_outs, box_outs)
    boxes, scores, classes = postprocess.pre_nms(params, cls_outs, box_outs)
    top_scores, top_idx = jax.lax.top_k(scores, 48)
    np.testing.assert_array_equal(np.asarray(sel_scores),
                                  np.asarray(top_scores))
    np.testing.assert_array_equal(
        np.asarray(sel_classes),
        np.asarray(jnp.take_along_axis(classes, top_idx, axis=1)))
    np.testing.assert_allclose(
        np.asarray(sel_boxes),
        np.asarray(jnp.take_along_axis(boxes, top_idx[..., None], axis=1)),
        rtol=0, atol=0)

    # 2) combined mode: flat (anchor, class) top-k, then decode K — must
    # equal the decode-all recreation end to end
    det = postprocess.postprocess_combined(params, cls_outs, box_outs)
    all_boxes, all_scores = postprocess.pre_nms_multiclass(
        params, cls_outs, box_outs)
    b, a, _ = all_scores.shape
    flat = all_scores.reshape(b, a * c)
    r_scores, r_flat_idx = jax.lax.top_k(flat, 48)
    r_anchor = r_flat_idx // c
    r_classes = (r_flat_idx % c).astype(jnp.int32)
    r_boxes = jnp.take_along_axis(all_boxes, r_anchor[..., None], axis=1)
    from mladversarialobjectdetection_tpu.ops import nms as nms_ops
    offset = (jnp.max(r_boxes) - jnp.min(r_boxes) + 1.0)
    shifted = r_boxes + r_classes[..., None].astype(r_boxes.dtype) * offset
    res = nms_ops.batched_nms_auto(shifted, r_scores, method="hard",
                                   iou_thresh=0.5, score_thresh=None,
                                   max_output_size=16)
    rsel = jnp.take_along_axis(r_classes, res.indices, axis=1)
    rref = res.boxes - (rsel[..., None].astype(res.boxes.dtype)
                        * offset) * res.valid[..., None]
    rref = postprocess.clip_boxes(rref * res.valid[..., None], 64)
    np.testing.assert_allclose(np.asarray(det.boxes), np.asarray(rref),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(det.scores),
                                  np.asarray(res.scores))
    np.testing.assert_array_equal(
        np.asarray(det.classes),
        np.asarray(((rsel + 1) * res.valid).astype(jnp.float32)))

    # 3) TFLite fast-NMS path vs its decode-all recreation
    det_tfl = postprocess.postprocess_tflite(params, cls_outs, box_outs)
    box_enc, tscores, danchors = postprocess.tflite_pre_nms(
        params, cls_outs, box_outs)
    cls_ids = jnp.argmax(tscores, axis=-1).astype(jnp.int32)
    max_scores = jnp.max(tscores, axis=-1)
    ya, xa, ha, wa = (danchors[..., 0], danchors[..., 1],
                      danchors[..., 2], danchors[..., 3])
    ty, tx, th, tw = (box_enc[..., 0], box_enc[..., 1],
                      box_enc[..., 2], box_enc[..., 3])
    yc, xc = ty * ha + ya, tx * wa + xa
    hh, ww = jnp.exp(th) * ha, jnp.exp(tw) * wa
    dec = jnp.stack([yc - hh / 2, xc - ww / 2, yc + hh / 2, xc + ww / 2], -1)
    t_scores, t_idx = jax.lax.top_k(max_scores, 48)
    t_boxes = jnp.take_along_axis(dec, t_idx[..., None], axis=1)
    tres = nms_ops.batched_nms_auto(t_boxes, t_scores, method="hard",
                                    iou_thresh=0.5, score_thresh=None,
                                    max_output_size=100)
    np.testing.assert_allclose(np.asarray(det_tfl.boxes),
                               np.asarray(tres.boxes), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(det_tfl.scores),
                                  np.asarray(tres.scores))
