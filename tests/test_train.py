"""Supervised detector trainer tests (automl train_lib parity patterns,
tf2/train_lib_test.py:57-198)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.ops import iou_loss
from mladversarialobjectdetection_tpu.ops.anchors import decode_box_outputs
from mladversarialobjectdetection_tpu.train import (labeler, losses,
                                                    schedules, trainer)


def test_encode_decode_roundtrip():
    anchors = jnp.array([[0, 0, 32, 32], [16, 16, 64, 80]], jnp.float32)
    boxes = jnp.array([[2, 3, 30, 29], [20, 20, 60, 70]], jnp.float32)
    enc = labeler.encode_boxes(boxes, anchors)
    dec = decode_box_outputs(enc, anchors)
    assert np.allclose(dec, boxes, atol=1e-3)


def test_label_anchors_matching():
    anchors = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                        jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [21, 21, 29, 29], [0, 0, 0, 0]],
                   jnp.float32)
    cls = jnp.array([4, 7, 0], jnp.int32)
    valid = jnp.array([True, True, False])
    out = labeler.label_anchors(anchors, gt, cls, valid)
    assert int(out.cls_targets[0]) == 4          # IoU 1.0
    assert int(out.cls_targets[1]) == 7          # IoU .64
    assert int(out.cls_targets[2]) == -1         # background
    assert float(out.num_positives) == 2.0


def test_force_match():
    # gt overlaps no anchor above threshold; force-match assigns its argmax
    anchors = jnp.array([[0, 0, 10, 10], [40, 40, 50, 50]], jnp.float32)
    gt = jnp.array([[8, 8, 20, 20]], jnp.float32)
    out = labeler.label_anchors(anchors, gt, jnp.array([3], jnp.int32),
                                jnp.array([True]))
    assert int(out.cls_targets[0]) == 3
    assert float(out.num_positives) == 1.0


def test_focal_loss_values():
    logits = jnp.zeros((1, 2))
    y = jnp.array([[1.0, 0.0]])
    out = losses.focal_loss(logits, y, alpha=0.25, gamma=0.0, normalizer=1.0)
    ce = np.log(2.0)
    assert np.allclose(out, [[0.25 * ce, 0.75 * ce]], atol=1e-5)


def test_huber_loss():
    out = losses.huber_loss(jnp.array([0.0, 0.0]), jnp.array([0.05, 1.0]),
                            delta=0.1)
    assert np.allclose(out, [0.5 * 0.05 ** 2, 0.5 * 0.01 + 0.1 * 0.9],
                       atol=1e-6)


def test_iou_losses():
    b = jnp.array([[0, 0, 10, 10]], jnp.float32)
    assert float(iou_loss.iou_loss(b, b, "iou")[0]) == pytest.approx(0, abs=1e-5)
    assert float(iou_loss.iou_loss(b, b, "giou")[0]) == pytest.approx(0, abs=1e-5)
    assert float(iou_loss.iou_loss(b, b, "ciou")[0]) == pytest.approx(0, abs=1e-5)
    far = jnp.array([[100, 100, 110, 110]], jnp.float32)
    assert float(iou_loss.diou(b, far)[0]) < 0  # center-distance penalty
    pad = jnp.zeros((1, 4))
    assert float(iou_loss.iou_loss(b, pad, "diou")[0]) == 0.0


def test_inverse_diou_pushes_away():
    pred_near = jnp.array([[[1, 1, 11, 11]]], jnp.float32)
    pred_far = jnp.array([[[200, 200, 210, 210]]], jnp.float32)
    gt = jnp.array([[[0, 0, 10, 10]]], jnp.float32)
    v = jnp.array([[True]])
    near = float(iou_loss.inverse_diou_loss(pred_near, v, gt, v))
    far = float(iou_loss.inverse_diou_loss(pred_far, v, gt, v))
    assert far < near


def test_schedules():
    import mladversarialobjectdetection_tpu as mad
    cfg = mad.get_efficientdet_config("efficientdet-d0")
    sched = schedules.from_config(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(cfg.lr_warmup_init)
    assert float(sched(10)) == pytest.approx(cfg.learning_rate, rel=1e-3)
    total = cfg.num_epochs * 10
    assert float(sched(total)) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_trainer_step(tiny_cfg):
    t = trainer.DetectorTrainer(tiny_cfg, steps_per_epoch=10)
    state = t.init_state(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                                minval=-1, maxval=1)
    gt_boxes = jnp.array([[[8, 8, 40, 40]], [[10, 10, 30, 30]]], jnp.float32)
    gt_classes = jnp.zeros((2, 1), jnp.int32)
    gt_valid = jnp.ones((2, 1), bool)
    step = jax.jit(t.train_step)
    st2, metrics = step(state, images, gt_boxes, gt_classes, gt_valid)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["cls_loss"]) > 0
    # params changed, EMA moved slightly toward new params
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(st2.params)[0]
    assert not np.allclose(p0, p1)
    st3, m2 = step(st2, images, gt_boxes, gt_classes, gt_valid)
    assert np.isfinite(float(m2["loss"]))


def test_class_weighted_bce():
    logits = jnp.array([0.0, 0.0])
    labels = jnp.array([1.0, 0.0])
    out = losses.class_weighted_bce(logits, labels, pos_weight=2.0,
                                    neg_weight=0.5)
    ce = np.log(2.0)
    assert np.allclose(out, [2.0 * ce, 0.5 * ce], atol=1e-6)
