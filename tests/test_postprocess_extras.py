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
