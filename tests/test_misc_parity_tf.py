"""Golden parity vs the reference for the remaining deterministic surfaces:

- BrightnessMatcher / HistogramMatcher (brightness_matcher.py:14-162) vs
  ops/color.py — deterministic given (patch, scene), so directly
  comparable. Tolerance notes: tf.image.yuv_to_rgb's published kernel is
  a ~3-decimal approximation of the true RGB->YUV inverse while ours uses
  the exact inverse; histogram specification has tie-breaking freedom
  where a source-CDF value coincides exactly with a flat run of the
  target CDF (both CDFs are multiples of 1/(N-1)).
- InverseDIOULoss (regression_loss.py:16-142, unused-but-kept in the
  reference) vs ops/iou_loss.inverse_diou_loss — exact semantics
  including the reference's corner-distance quirk.
- The CPU inference mirror AdversarialPatch (adv_patch.py:16-201) vs
  inference/adv_patch.py — bit-exact under a shared numpy seed (both
  draw sensor noise through the same np.random.uniform call sequence).

Skipped automatically when the reference tree or TF is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not available"),
]

# shared reference-import shim (registers the ref_env fixture here)
from test_defense_parity_tf import ref_env  # noqa: E402,F401


def _rand_img(shape, seed, lo=-1.0, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, shape).astype(
        np.float32)


# ---------------------------------------------------------------------------
# brightness / histogram matching
# ---------------------------------------------------------------------------

def test_brightness_match_golden(ref_env):
    """Mean Y-shift matcher agrees with the reference BrightnessMatcher
    (the transform inside every EOT composite, attacker.py:384-387)."""
    import brightness_matcher
    from mladversarialobjectdetection_tpu.ops import color
    tf = ref_env
    src = _rand_img((64, 64, 3), 21)
    tgt = _rand_img((96, 96, 3), 22)
    m = brightness_matcher.BrightnessMatcher(name="bm")
    ref = np.asarray(m((tf.constant(src), tf.constant(tgt))))
    ours = np.asarray(color.brightness_match(src, tgt))
    # dominated by tf's approximate yuv_to_rgb kernel vs our exact inverse
    assert np.abs(ref - ours).max() < 5e-3
    assert np.abs(ref - ours).mean() < 1e-3


def test_histogram_match_golden(ref_env):
    """Full histogram specification agrees with the reference
    HistogramMatcher (the use_histogram_match option,
    brightness_matcher.py:76-162)."""
    import brightness_matcher
    from mladversarialobjectdetection_tpu.ops import color
    tf = ref_env
    # uniform-random images keep the Y histogram dense (few empty bins ->
    # few flat CDF runs -> tie-breaking freedom stays rare)
    src = _rand_img((64, 64, 3), 23)
    tgt = _rand_img((64, 64, 3), 24)
    m = brightness_matcher.HistogramMatcher(name="hm")
    ref = np.asarray(m((tf.constant(src), tf.constant(tgt))))
    ours = np.asarray(color.histogram_match(src, tgt))
    d = np.abs(ref - ours)
    assert d.max() < 0.02      # isolated CDF-tie pixels
    assert d.mean() < 1.5e-3   # bulk agreement


# ---------------------------------------------------------------------------
# inverse-DIoU loss
# ---------------------------------------------------------------------------

def test_inverse_diou_loss_golden(ref_env):
    """Batch loss equals the reference InverseDIOULoss on ragged inputs,
    including an image with no predictions (epsilon-only contribution,
    regression_loss.py:58-59)."""
    import regression_loss
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.ops import iou_loss
    tf = ref_env
    rng = np.random.default_rng(25)

    def rand_boxes(n):
        ymin = rng.uniform(0, 80, n)
        xmin = rng.uniform(0, 80, n)
        h = rng.uniform(5, 40, n)
        w = rng.uniform(5, 40, n)
        return np.stack([ymin, xmin, ymin + h, xmin + w], -1).astype(
            np.float32)

    pred_list = [rand_boxes(3), np.zeros((0, 4), np.float32), rand_boxes(2)]
    gt_list = [rand_boxes(2), rand_boxes(1), rand_boxes(4)]

    ref_loss = regression_loss.InverseDIOULoss()(
        tf.ragged.constant([p.tolist() for p in pred_list], ragged_rank=1,
                           inner_shape=(4,), dtype=tf.float32),
        tf.ragged.constant([g.tolist() for g in gt_list], ragged_rank=1,
                           inner_shape=(4,), dtype=tf.float32))
    ref_loss = float(ref_loss)

    maxp = max(len(p) for p in pred_list)
    maxg = max(len(g) for g in gt_list)
    b = len(pred_list)
    pred = np.zeros((b, maxp, 4), np.float32)
    pv = np.zeros((b, maxp), bool)
    gt = np.zeros((b, maxg, 4), np.float32)
    gv = np.zeros((b, maxg), bool)
    for i, (p, g) in enumerate(zip(pred_list, gt_list)):
        pred[i, :len(p)] = p
        pv[i, :len(p)] = True
        gt[i, :len(g)] = g
        gv[i, :len(g)] = True
    ours = float(iou_loss.inverse_diou_loss(
        jnp.asarray(pred), jnp.asarray(pv), jnp.asarray(gt),
        jnp.asarray(gv)))
    assert abs(ours - ref_loss) < 1e-5 * max(1.0, abs(ref_loss)), (
        f"{ours} vs {ref_loss}")


# ---------------------------------------------------------------------------
# numpy NMS family (the nms_configs.pyfunc path)
# ---------------------------------------------------------------------------

def _rand_dets(n, seed, size=100.0):
    rng = np.random.default_rng(seed)
    y0 = rng.uniform(0, size * 0.7, n)
    x0 = rng.uniform(0, size * 0.7, n)
    h = rng.uniform(5, size * 0.3, n)
    w = rng.uniform(5, size * 0.3, n)
    boxes = np.stack([y0, x0, y0 + h, x0 + w], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_nms_np_golden(ref_env):
    """hard / diou / gaussian / linear numpy NMS match the reference
    nms_np.py exactly under its legacy +1 pixel-inclusive convention."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REFERENCE, "automl/efficientdet"))
    import nms_np as ref_nms
    from mladversarialobjectdetection_tpu.ops import nms_np as our_nms

    boxes, scores = _rand_dets(60, seed=27)
    # reference format: [x1, y1, x2, y2, score]
    dets = np.concatenate([boxes[:, [1, 0, 3, 2]], scores[:, None]],
                          -1).astype(np.float64)

    cases = [
        ("hard", dict(iou_thresh=0.5),
         lambda: ref_nms.hard_nms(dets.copy(), 0.5)),
        ("diou", dict(iou_thresh=0.4),
         lambda: ref_nms.diou_nms(dets.copy(), 0.4)),
        ("gaussian", dict(sigma=0.5, score_thresh=0.1),
         lambda: ref_nms.soft_nms(dets.copy(), {
             "method": "gaussian", "sigma": 0.5, "iou_thresh": None,
             "score_thresh": 0.1})),
        ("linear", dict(iou_thresh=0.3, score_thresh=0.1),
         lambda: ref_nms.soft_nms(dets.copy(), {
             "method": "linear", "sigma": None, "iou_thresh": 0.3,
             "score_thresh": 0.1})),
    ]
    for method, kw, ref_fn in cases:
        ref_out = np.asarray(ref_fn())
        idx, sc, bx = our_nms.nms_np(boxes, scores, method=method,
                                     max_output_size=1000, plus_one=True,
                                     **kw)
        assert len(sc) == len(ref_out), (
            f"{method}: {len(sc)} vs {len(ref_out)} picks")
        assert np.abs(sc - ref_out[:, 4]).max() < 1e-6, method
        # ref rows are [x1, y1, x2, y2, score]
        assert np.abs(bx[:, [1, 0, 3, 2]] - ref_out[:, :4]).max() < 1e-5, (
            method)


# ---------------------------------------------------------------------------
# Weighted Boxes Fusion
# ---------------------------------------------------------------------------

def test_wbf_golden(ref_env):
    """weighted_boxes_fusion matches the reference ensemble_detections
    (tf2/wbf.py): score-weighted cluster coordinates, mean-score *
    vote-fraction rescale, score-sorted output. Clusters are
    well-separated so the reference's argmax-cluster matching and our
    first-above-threshold matching coincide."""
    tf = ref_env
    from tf2 import wbf as ref_wbf
    from mladversarialobjectdetection_tpu.ops import wbf as our_wbf

    rng = np.random.default_rng(28)
    n_models, n_clusters = 3, 5
    centers = np.stack([np.arange(n_clusters) * 60.0 + 20,
                        np.arange(n_clusters) * 60.0 + 20], -1)
    boxes_list, scores_list, classes_list = [], [], []
    rows = []
    for m in range(n_models):
        bs, ss, cs = [], [], []
        for k in range(n_clusters):
            if m == 2 and k == 0:
                continue  # one cluster missing a model's vote
            cy, cx = centers[k] + rng.uniform(-2, 2, 2)
            h, w = 30 + rng.uniform(-3, 3), 26 + rng.uniform(-3, 3)
            box = [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2]
            score = float(rng.uniform(0.3, 0.95))
            cls = k % 2
            bs.append(box)
            ss.append(score)
            cs.append(cls)
            # reference row: [image_id, x1, y1, x2, y2, score, class]
            rows.append([0.0, box[1], box[0], box[3], box[2], score,
                         float(cls)])
        boxes_list.append(np.asarray(bs, np.float32))
        scores_list.append(np.asarray(ss, np.float32))
        classes_list.append(np.asarray(cs))

    params = {"num_classes": 2}
    ref_out = np.asarray(ref_wbf.ensemble_detections(
        params, tf.constant(np.asarray(rows, np.float32)), n_models))

    fb, fs, fc = our_wbf.weighted_boxes_fusion(boxes_list, scores_list,
                                               classes_list,
                                               iou_thresh=0.55)
    assert len(fs) == ref_out.shape[0] == n_clusters
    order_ref = ref_out[np.argsort(-ref_out[:, 5])]
    assert np.abs(fs - order_ref[:, 5]).max() < 1e-6
    assert (fc == order_ref[:, 6]).all()
    assert np.abs(fb[:, [1, 0, 3, 2]] - order_ref[:, 1:5]).max() < 1e-4


# ---------------------------------------------------------------------------
# CPU inference mirror
# ---------------------------------------------------------------------------

def test_adv_patch_cpu_mirror_bit_parity(tmp_path):
    """Our demo-time AdversarialPatch reproduces the reference CPU mirror
    bit-for-bit under a shared numpy seed (adv_patch.py:189-201)."""
    pytest.importorskip("cv2")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import adv_patch as ref_ap
    from PIL import Image
    from mladversarialobjectdetection_tpu.inference.adv_patch import (
        AdversarialPatch)

    rng = np.random.default_rng(26)
    patch_img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pf = str(tmp_path / "patch.png")
    Image.fromarray(patch_img).save(pf)

    img = rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
    bboxes = [(20, 30, 120, 90), (80, 40, 190, 150)]

    ref = ref_ap.AdversarialPatch(scale=0.4, h=128, w=128, patch_file=pf)
    ours = AdversarialPatch(scale=0.4, h=128, w=128, patch_file=pf)
    assert np.array_equal(ref._patch_img, ours._patch_img)

    np.random.seed(42)
    out_ref = ref.add_adv_to_img(img, bboxes)
    np.random.seed(42)
    out_ours = ours.add_adv_to_img(img, bboxes)
    assert np.array_equal(out_ref, out_ours)
    assert not np.array_equal(out_ref, img)  # something was pasted
