"""Golden parity for the supervised-training stack vs reference train_lib.

Pins the pieces that previously had only hand-computed/invariant tests:
  - FocalLoss (train_lib.py:357-406) incl. the label-smoothing order
    quirk (multipliers computed BEFORE smoothing)
  - BoxLoss huber (train_lib.py:409-437) incl. its num_positives*4
    normalizer and elementwise target!=0 mask
  - BoxIouLoss (train_lib.py:440-464): decode-then-mask against anchors
  - the assembled per-level detection loss (train_lib.py:500-603
    semantics: -2 ignore masking, num_positives_sum = sum + 1)
  - AnchorLabeler (tf2/anchors.py:171-250 over the object_detection
    target assigner): per-anchor class ids, encoded box targets,
    num_positives
  - LR schedules (train_lib.py:51-173): stepwise / cosine (raw-step
    quirk) / polynomial with linear warmup

Skipped automatically when the reference tree or TF is unavailable.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not available"),
]

from test_defense_parity_tf import ref_env  # noqa: E402,F401


@pytest.fixture(scope="module")
def ref_train_lib(ref_env):
    """Import tf2.train_lib with stubs for deps absent here (nsl, hub,
    and the TF1 `inference` module train_lib only touches in callbacks)."""
    for name in ("neural_structured_learning", "tensorflow_hub",
                 "inference"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    from tf2 import train_lib
    return train_lib


def test_focal_loss_golden(ref_train_lib, ref_env):
    """Focal loss values match, with and without label smoothing — the
    reference computes p_t/alpha_factor from UNSMOOTHED labels."""
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.train import losses
    tf = ref_env
    rng = np.random.default_rng(50)
    logits = rng.normal(0, 2, (2, 8, 8, 27)).astype(np.float32)
    y = (rng.uniform(0, 1, logits.shape) < 0.1).astype(np.float32)
    norm = 7.0
    for ls in (0.0, 0.1):
        ref = ref_train_lib.FocalLoss(0.25, 1.5, label_smoothing=ls,
                                      reduction=tf.keras.losses.Reduction.NONE)
        ref_val = np.asarray(ref([tf.constant(norm), tf.constant(y)],
                                 tf.constant(logits)))
        ours = np.asarray(losses.focal_loss(jnp.asarray(logits),
                                            jnp.asarray(y), 0.25, 1.5, norm,
                                            label_smoothing=ls))
        assert np.abs(ours - ref_val).max() < 1e-6, f"ls={ls}"


def test_box_loss_golden(ref_train_lib, ref_env):
    """Huber box loss: sum(huber * (target != 0)) / (num_positives * 4)."""
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.train import losses
    tf = ref_env
    rng = np.random.default_rng(51)
    pred = rng.normal(0, 0.3, (2, 8, 8, 36)).astype(np.float32)
    tgt = rng.normal(0, 0.3, pred.shape).astype(np.float32)
    # negatives carry all-zero targets (the labeler's convention)
    tgt[rng.uniform(0, 1, pred.shape[:3]) < 0.7] = 0.0
    num_pos = 11.0

    ref = ref_train_lib.BoxLoss(delta=0.1)
    ref_val = float(ref([tf.constant(num_pos), tf.constant(tgt)],
                        tf.constant(pred)))

    h = np.asarray(losses.huber_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                     0.1))
    ours = float((h * (tgt != 0.0)).sum() / (num_pos * 4.0))
    assert abs(ours - ref_val) < 1e-6 * max(1.0, abs(ref_val))


def test_box_iou_loss_golden(ref_train_lib, ref_env):
    """BoxIouLoss: decode pred+target against anchors, elementwise
    target!=0 mask, iou-family loss / (num_positives * 4)."""
    import jax.numpy as jnp
    from tf2 import anchors as ref_anchors
    from mladversarialobjectdetection_tpu.ops import anchors as our_anchors
    from mladversarialobjectdetection_tpu.ops import iou_loss as iou_lib
    tf = ref_env

    ref_anch = ref_anchors.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 64)
    anchor_boxes = np.asarray(ref_anch.boxes)
    a = anchor_boxes.shape[0]
    rng = np.random.default_rng(52)
    pred = rng.normal(0, 0.2, (a, 4)).astype(np.float32)
    tgt = rng.normal(0, 0.2, (a, 4)).astype(np.float32)
    tgt[rng.uniform(0, 1, a) < 0.8] = 0.0
    num_pos = 9.0

    for loss_type in ("diou", "giou", "ciou", "iou"):
        ref = ref_train_lib.BoxIouLoss(loss_type, 3, 7, 3, [1.0, 2.0, 0.5],
                                       4.0, 64)
        ref_val = float(ref([tf.constant(num_pos), tf.constant(tgt)],
                            tf.constant(pred)))
        mask = (tgt != 0.0).astype(np.float32)
        dp = np.asarray(our_anchors.decode_box_outputs(
            jnp.asarray(pred), jnp.asarray(anchor_boxes))) * mask
        dt = np.asarray(our_anchors.decode_box_outputs(
            jnp.asarray(tgt), jnp.asarray(anchor_boxes))) * mask
        ours = float(np.asarray(iou_lib.iou_loss(
            jnp.asarray(dp), jnp.asarray(dt), loss_type)).sum()
            / (num_pos * 4.0))
        assert abs(ours - ref_val) < 2e-4 * max(1.0, abs(ref_val)), (
            f"{loss_type}: {ours} vs {ref_val}")


def test_anchor_labeler_golden(ref_env):
    """AnchorLabeler: class ids, encoded box targets, num_positives agree
    with the reference target assigner (incl. force-matching)."""
    import jax.numpy as jnp
    from tf2 import anchors as ref_anchors
    from mladversarialobjectdetection_tpu.ops import anchors as our_anchors_mod
    from mladversarialobjectdetection_tpu.train import labeler
    tf = ref_env

    ref_anch = ref_anchors.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 64)
    ref_labeler = ref_anchors.AnchorLabeler(ref_anch, num_classes=90,
                                            match_threshold=0.5)
    anchor_boxes = np.asarray(ref_anch.boxes)

    rng = np.random.default_rng(53)
    n = 5
    ymin = rng.uniform(0, 40, n)
    xmin = rng.uniform(0, 40, n)
    h = rng.uniform(6, 24, n)
    w = rng.uniform(6, 24, n)
    gt = np.stack([ymin, xmin, ymin + h, xmin + w], -1).astype(np.float32)
    cls0 = rng.integers(0, 90, n).astype(np.int32)  # 0-based model ids

    cls_d, box_d, np_ref = ref_labeler.label_anchors(
        tf.constant(gt),
        tf.constant((cls0 + 1)[:, None].astype(np.float32)))  # ref is 1-based
    # (float labels: the reference target assigner concats them with float
    # fill values, object_detection/matcher.py:190)
    ref_cls = np.concatenate([np.asarray(v).reshape(-1)
                              for v in cls_d.values()])
    ref_box = np.concatenate([np.asarray(v).reshape(-1, 4)
                              for v in box_d.values()])

    ours = labeler.label_anchors(jnp.asarray(anchor_boxes), jnp.asarray(gt),
                                 jnp.asarray(cls0),
                                 jnp.ones(n, bool))
    our_cls = np.asarray(ours.cls_targets)
    our_box = np.asarray(ours.box_targets)

    assert float(np_ref) == float(ours.num_positives)
    assert (our_cls == ref_cls).mean() > 0.9999, (
        f"{(our_cls != ref_cls).sum()} anchor class mismatches")
    same = our_cls == ref_cls
    assert np.abs(our_box - ref_box)[same].max() < 1e-4
    assert (our_cls >= 0).sum() > 0  # fixture sanity: positives exist


def test_lr_schedules_golden(ref_train_lib, ref_env):
    """Stepwise / cosine / polynomial schedules with warmup reproduce the
    reference values step-for-step (incl. the cosine raw-step quirk)."""
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.train import schedules
    tf = ref_env
    peak, winit, wsteps, total = 0.08, 0.004, 100, 1000
    steps = np.arange(0, 880, 7)  # stay clear of the cosine tail clamp

    pairs = [
        (ref_train_lib.StepwiseLrSchedule(peak, winit, wsteps, 300, 600),
         schedules.stepwise_lr(peak, winit, wsteps, 300, 600)),
        (ref_train_lib.CosineLrSchedule(peak, winit, wsteps, total),
         schedules.cosine_lr(peak, winit, wsteps, total)),
        (ref_train_lib.PolynomialLrSchedule(peak, winit, wsteps, 0.9, total),
         schedules.polynomial_lr(peak, winit, wsteps, total, 0.9)),
    ]
    for ref_s, our_s in pairs:
        ref_vals = np.asarray([float(ref_s(tf.constant(s))) for s in steps])
        our_vals = np.asarray([float(our_s(jnp.asarray(float(s))))
                               for s in steps])
        assert np.abs(ref_vals - our_vals).max() < 1e-6, type(ref_s).__name__


def test_self_weighted_bce_golden(ref_env):
    """util.py:192-213 self_weightd_binary_ce: batch-self-weighted
    probability-space BCE, per-example mean summed over the batch."""
    import jax.numpy as jnp
    import util as ref_util  # reference top-level module
    from mladversarialobjectdetection_tpu.train import losses
    tf = ref_env
    rng = np.random.default_rng(55)
    y_true = (rng.uniform(0, 1, (3, 40)) < 0.2).astype(np.float32)
    y_pred = rng.uniform(0.001, 0.999, (3, 40)).astype(np.float32)
    ref_val = float(ref_util.self_weightd_binary_ce(tf.constant(y_true),
                                                    tf.constant(y_pred)))
    ours = float(losses.self_weighted_binary_ce(jnp.asarray(y_true),
                                                jnp.asarray(y_pred)))
    assert abs(ours - ref_val) < 1e-5 * max(1.0, abs(ref_val))


def test_detection_loss_assembly_golden(ref_train_lib, ref_env):
    """The assembled detection loss (per-level focal masked by !=-2 +
    weighted box + optional iou, normalizer = sum(num_positives) + 1)
    equals the same assembly done with the REFERENCE loss classes."""
    import jax.numpy as jnp
    from tf2 import anchors as ref_anchors
    from mladversarialobjectdetection_tpu.train import labeler as labeler_lib
    from mladversarialobjectdetection_tpu.train import losses
    tf = ref_env

    num_classes, apl = 11, 9
    ref_anch = ref_anchors.Anchors(3, 7, 3, [1.0, 2.0, 0.5], 4.0, 64)
    anchor_boxes = np.asarray(ref_anch.boxes)
    feat = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    a_total = sum(h * w * apl for h, w in feat)
    assert a_total == anchor_boxes.shape[0]

    rng = np.random.default_rng(54)
    b = 2
    cls_out = [rng.normal(-2, 1, (b, h, w, apl * num_classes))
               .astype(np.float32) for h, w in feat]
    box_out = [rng.normal(0, 0.2, (b, h, w, apl * 4)).astype(np.float32)
               for h, w in feat]
    # labels with positives, negatives, and an ignored anchor
    cls_t = np.full((b, a_total), -1, np.int32)
    box_t = np.zeros((b, a_total, 4), np.float32)
    for i in range(b):
        pos = rng.choice(a_total, 17, replace=False)
        cls_t[i, pos] = rng.integers(0, num_classes, 17)
        box_t[i, pos] = rng.normal(0, 0.3, (17, 4))
        cls_t[i, rng.integers(0, a_total)] = -2
    num_pos = np.array([(cls_t[i] >= 0).sum() for i in range(b)], np.float32)
    labels = labeler_lib.AnchorLabels(jnp.asarray(cls_t), jnp.asarray(box_t),
                                      jnp.asarray(num_pos))

    total_ours, parts = losses.detection_loss(
        [jnp.asarray(c) for c in cls_out], [jnp.asarray(x) for x in box_out],
        labels, num_classes=num_classes, num_anchors=apl,
        alpha=0.25, gamma=1.5, delta=0.1, box_loss_weight=50.0,
        anchor_boxes=jnp.asarray(anchor_boxes), iou_loss_type="diou",
        iou_loss_weight=2.0)

    # reference assembly (train_lib.py:500-603)
    norm = float(num_pos.sum()) + 1.0
    focal = ref_train_lib.FocalLoss(
        0.25, 1.5, reduction=tf.keras.losses.Reduction.NONE)
    box_l = ref_train_lib.BoxLoss(delta=0.1)
    iou_l = ref_train_lib.BoxIouLoss("diou", 3, 7, 3, [1.0, 2.0, 0.5],
                                     4.0, 64)
    cls_ref = 0.0
    box_ref = 0.0
    off = 0
    for lvl, (h, w) in enumerate(feat):
        steps = h * w * apl
        ct = cls_t[:, off:off + steps]
        bt = box_t[:, off:off + steps]
        off += steps
        one_hot = tf.one_hot(np.maximum(ct, 0), num_classes) * \
            tf.cast(ct >= 0, tf.float32)[..., None]
        one_hot = tf.reshape(one_hot, (b, h, w, apl * num_classes))
        cl = focal([tf.constant(norm), one_hot], tf.constant(cls_out[lvl]))
        cl = tf.reshape(cl, (b, h, w, apl, num_classes))
        keep = tf.reshape(tf.cast(ct != -2, tf.float32), (b, h, w, apl))
        cls_ref += float(tf.reduce_sum(cl * keep[..., None]))
        box_ref += float(box_l(
            [tf.constant(norm),
             tf.constant(bt.reshape(b, h, w, apl * 4))],
            tf.constant(box_out[lvl])))
    # per-image calls: the loss is linear in the sum, and per-image rows
    # align 1:1 with the anchor table (the reference's own batch>1
    # level-major concat misaligns its tiled anchors — a latent reference
    # bug sidestepped here)
    iou_ref = 0.0
    for i in range(b):
        pred_rows = np.concatenate(
            [box_out[l][i].reshape(-1, 4) for l in range(len(feat))], 0)
        iou_ref += float(iou_l([tf.constant(norm), tf.constant(box_t[i])],
                               tf.constant(pred_rows)))
    total_ref = cls_ref + 50.0 * box_ref + 2.0 * iou_ref

    assert abs(float(parts["cls_loss"]) - cls_ref) < 1e-4 * max(1, cls_ref)
    assert abs(float(parts["box_loss"]) - box_ref) < 1e-5 * max(1, box_ref)
    assert abs(float(parts["box_iou_loss"]) - iou_ref) < 2e-4 * max(1, iou_ref)
    assert abs(float(total_ours) - total_ref) < 2e-4 * max(1.0, abs(total_ref))
