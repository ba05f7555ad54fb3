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
