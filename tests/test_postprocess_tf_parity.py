"""Post-mode parity vs the reference TF postprocess functions.

Random head outputs in -> identical detections out, for the two modes the
round-1 build lacked exact semantics for:

  * `combined` vs tf.image.combined_non_max_suppression via the reference
    postprocess_combined (postprocess.py:208-245) — multi-class-per-box.
  * `tflite` input layout vs the reference tflite_pre_nms
    (postprocess.py:291-331), plus a consistency check of our runnable
    fast-NMS equivalent of the TFLite custom op.

Slow tier (imports TF).
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference/automl/efficientdet"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not available"),
]


@pytest.fixture(scope="module")
def tf_env():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    tf = pytest.importorskip("tensorflow")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return tf


def _rand_outputs(cfg, batch=2, seed=0):
    """Random per-level head outputs for a 64px config."""
    rng = np.random.RandomState(seed)
    a = cfg.num_scales * len(cfg.aspect_ratios)
    c = cfg.num_classes
    sizes = [64 // 2 ** lvl for lvl in range(cfg.min_level, cfg.max_level + 1)]
    sizes = [max(s, 1) for s in sizes]
    cls_outs = [rng.normal(-2, 2, (batch, s, s, a * c)).astype(np.float32)
                for s in sizes]
    box_outs = [rng.normal(0, 0.4, (batch, s, s, a * 4)).astype(np.float32)
                for s in sizes]
    return cls_outs, box_outs


@pytest.fixture(scope="module")
def small_cfg():
    import mladversarialobjectdetection_tpu as mad
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    cfg.num_classes = 4
    cfg.nms_configs.update({"score_thresh": 0.3, "max_output_size": 10,
                            # >= anchors*classes so the TPU-native static
                            # top-k equals the reference's full dynamic set
                            "pre_nms_topk": 4096})
    return cfg


def test_combined_parity(tf_env, small_cfg):
    """postprocess_combined == tf combined_non_max_suppression end to end,
    including the multi-class-per-box candidates max_reduce would drop."""
    import jax
    from tf2 import postprocess as ref_post
    from mladversarialobjectdetection_tpu.ops import postprocess as our_post

    tf = tf_env
    params = small_cfg.as_dict()
    cls_outs, box_outs = _rand_outputs(small_cfg)

    rb, rs, rc, rv = ref_post.postprocess_combined(
        params, [tf.constant(x) for x in cls_outs],
        [tf.constant(x) for x in box_outs])
    ours = jax.jit(lambda c, b: our_post.postprocess_combined(params, c, b))(
        cls_outs, box_outs)

    rb, rs, rc, rv = (np.asarray(rb), np.asarray(rs), np.asarray(rc),
                      np.asarray(rv))
    assert (np.asarray(ours.valid_len) == rv).all()
    for i in range(rb.shape[0]):
        k = int(rv[i])
        assert np.abs(np.asarray(ours.scores)[i][:k] - rs[i][:k]).max() < 1e-5
        assert np.abs(np.asarray(ours.boxes)[i][:k] - rb[i][:k]).max() < 1e-3
        assert (np.asarray(ours.classes)[i][:k] == rc[i][:k]).all()


def test_per_class_parity(tf_env, small_cfg):
    """postprocess_per_class == the reference per-class NMS (dynamic
    per-class loop + concat + top_k, postprocess.py:409-491) through our
    class-banded single-pass formulation — including the reference's
    no-clipping convention (per_class never clips; only global does)."""
    import jax
    from tf2 import postprocess as ref_post
    from mladversarialobjectdetection_tpu.ops import postprocess as our_post

    tf = tf_env
    params = small_cfg.as_dict()
    cls_outs, box_outs = _rand_outputs(small_cfg, seed=3)

    rb, rs, rc, rv = ref_post.postprocess_per_class(
        params, [tf.constant(x) for x in cls_outs],
        [tf.constant(x) for x in box_outs])
    ours = jax.jit(lambda c, b: our_post.postprocess_per_class(params, c, b))(
        cls_outs, box_outs)

    rb, rs, rc, rv = (np.asarray(rb), np.asarray(rs), np.asarray(rc),
                      np.asarray(rv))
    assert (np.asarray(ours.valid_len) == rv).all()
    for i in range(rb.shape[0]):
        k = int(rv[i])
        assert k > 0
        assert np.abs(np.asarray(ours.scores)[i][:k] - rs[i][:k]).max() < 1e-5
        assert np.abs(np.asarray(ours.boxes)[i][:k] - rb[i][:k]).max() < 1e-3
        assert (np.asarray(ours.classes)[i][:k] == rc[i][:k]).all()


def test_combined_emits_multiclass_per_box(small_cfg):
    """A single dominant anchor with two strong classes must yield TWO
    detections on the same box — the semantics max_reduce loses."""
    import jax
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.ops import postprocess as our_post

    cfg = small_cfg
    params = cfg.as_dict()
    cls_outs, box_outs = _rand_outputs(cfg, batch=1, seed=1)
    cls_outs = [np.full_like(x, -12.0) for x in cls_outs]
    box_outs = [np.zeros_like(x) for x in box_outs]
    # anchor 0 of level 0: classes 1 and 2 both confident
    cls_outs[0][0, 4, 4, 0 * cfg.num_classes + 1] = 4.0
    cls_outs[0][0, 4, 4, 0 * cfg.num_classes + 2] = 3.0

    det = jax.jit(lambda c, b: our_post.postprocess_combined(params, c, b))(
        cls_outs, box_outs)
    k = int(det.valid_len[0])
    assert k == 2
    # same box, two classes (CLASS_OFFSET applied)
    np.testing.assert_allclose(det.boxes[0][0], det.boxes[0][1], atol=1e-5)
    assert sorted(np.asarray(det.classes[0][:2]).tolist()) == [2.0, 3.0]


def test_tflite_pre_nms_parity(tf_env, small_cfg):
    """Our tflite_pre_nms emits the exact TFLite custom-op input layout the
    reference produces (raw encodings, sigmoid scores, center-size
    normalized anchors)."""
    from tf2 import postprocess as ref_post
    from mladversarialobjectdetection_tpu.ops import postprocess as our_post

    tf = tf_env
    params = small_cfg.as_dict()
    cls_outs, box_outs = _rand_outputs(small_cfg, batch=1, seed=2)

    r_box, r_scores, r_anchors = ref_post.tflite_pre_nms(
        params, [tf.constant(x) for x in cls_outs],
        [tf.constant(x) for x in box_outs])
    o_box, o_scores, o_anchors = our_post.tflite_pre_nms(
        params, cls_outs, box_outs)

    assert np.abs(np.asarray(r_box) - np.asarray(o_box)).max() < 1e-6
    assert np.abs(np.asarray(r_scores) - np.asarray(o_scores)).max() < 1e-6
    assert np.abs(np.asarray(r_anchors) - np.asarray(o_anchors)).max() < 1e-6


def test_tflite_postprocess_matches_global(small_cfg):
    """The runnable TFLite fast-NMS path is 'mathematically same as
    postprocess_global' (reference postprocess.py:337-339): same survivors
    and scores, boxes normalized instead of pixel/clipped, classes 0-based."""
    import jax
    from mladversarialobjectdetection_tpu.ops import postprocess as our_post

    cfg = small_cfg
    cfg.nms_configs.update({"method": "hard", "iou_thresh": 0.5})
    params = cfg.as_dict()
    cls_outs, box_outs = _rand_outputs(cfg, batch=2, seed=3)

    g = jax.jit(lambda c, b: our_post.postprocess_global(params, c, b))(
        cls_outs, box_outs)
    t = jax.jit(lambda c, b: our_post.postprocess_tflite(params, c, b))(
        cls_outs, box_outs)

    max_det = int(params["tflite_max_detections"])
    assert t.boxes.shape[1] == max_det
    k = int(min(np.asarray(g.valid_len).min(), np.asarray(t.valid_len).min(),
                params["nms_configs"]["max_output_size"]))
    assert k > 0
    np.testing.assert_allclose(np.asarray(t.scores)[:, :k],
                               np.asarray(g.scores)[:, :k], atol=1e-5)
    # classes: tflite 0-based, global offset by 1
    assert (np.asarray(t.classes)[:, :k] + 1
            == np.asarray(g.classes)[:, :k]).all()
    # boxes: tflite normalized + unclipped; compare after scale + clip
    h, w = 64, 64
    scaled = np.asarray(t.boxes)[:, :k] * np.asarray([h, w, h, w],
                                                     np.float32)
    clipped = np.clip(scaled, 0, np.asarray([h, w, h, w], np.float32))
    np.testing.assert_allclose(clipped, np.asarray(g.boxes)[:, :k],
                               atol=1e-3)
