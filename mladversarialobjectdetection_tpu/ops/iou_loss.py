"""IoU-family losses: iou / giou / diou / ciou + the inverse-DIoU
"push boxes away" loss.

Behavioral parity with reference iou_utils.py:27-191 (`iou_loss` used by
automl BoxIouLoss) and regression_loss.py:16-142 (`InverseDIOULoss` — kept
unused in the reference "for reuse"; here it is a first-class vectorized op
instead of nested GPU loops).

Boxes are (ymin, xmin, ymax, xmax).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _areas(b):
    return jnp.maximum(0.0, b[..., 2] - b[..., 0]) * jnp.maximum(
        0.0, b[..., 3] - b[..., 1])


def _pairwise_parts(pred, target):
    inter_ymin = jnp.maximum(pred[..., 0], target[..., 0])
    inter_xmin = jnp.maximum(pred[..., 1], target[..., 1])
    inter_ymax = jnp.minimum(pred[..., 2], target[..., 2])
    inter_xmax = jnp.minimum(pred[..., 3], target[..., 3])
    inter = (jnp.maximum(0.0, inter_ymax - inter_ymin)
             * jnp.maximum(0.0, inter_xmax - inter_xmin))
    union = _areas(pred) + _areas(target) - inter
    iou = inter / (union + _EPS)

    hull_ymin = jnp.minimum(pred[..., 0], target[..., 0])
    hull_xmin = jnp.minimum(pred[..., 1], target[..., 1])
    hull_ymax = jnp.maximum(pred[..., 2], target[..., 2])
    hull_xmax = jnp.maximum(pred[..., 3], target[..., 3])
    return iou, union, (hull_ymin, hull_xmin, hull_ymax, hull_xmax)


def iou(pred, target):
    return _pairwise_parts(pred, target)[0]


def giou(pred, target):
    v, union, hull = _pairwise_parts(pred, target)
    hull_area = (hull[2] - hull[0]) * (hull[3] - hull[1])
    return v - (hull_area - union) / (hull_area + _EPS)


def _diou_terms(pred, target):
    v, _, hull = _pairwise_parts(pred, target)
    pc_y = (pred[..., 0] + pred[..., 2]) / 2
    pc_x = (pred[..., 1] + pred[..., 3]) / 2
    tc_y = (target[..., 0] + target[..., 2]) / 2
    tc_x = (target[..., 1] + target[..., 3]) / 2
    center_dist = (pc_y - tc_y) ** 2 + (pc_x - tc_x) ** 2
    diag = (hull[2] - hull[0]) ** 2 + (hull[3] - hull[1]) ** 2
    return v, center_dist / (diag + _EPS)


def diou(pred, target):
    v, penalty = _diou_terms(pred, target)
    return v - penalty


def ciou(pred, target):
    v, penalty = _diou_terms(pred, target)
    ph = jnp.maximum(pred[..., 2] - pred[..., 0], _EPS)
    pw = jnp.maximum(pred[..., 3] - pred[..., 1], _EPS)
    th = jnp.maximum(target[..., 2] - target[..., 0], _EPS)
    tw = jnp.maximum(target[..., 3] - target[..., 1], _EPS)
    ar = (4.0 / jnp.pi ** 2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = ar / (1.0 - v + ar + _EPS)
    return v - penalty - alpha * ar


def iou_loss(pred, target, loss_type: str = "iou"):
    """1 - iou_variant, zero where the target box is all-zero padding
    (iou_utils.py parity)."""
    fn = {"iou": iou, "giou": giou, "diou": diou, "ciou": ciou}[loss_type]
    val = fn(pred, target)
    is_pad = jnp.all(target == 0.0, axis=-1)
    return jnp.where(is_pad, 0.0, 1.0 - val)


def _ref_quirk_diou(gt, pred):
    """Pairwise DIoU with the reference's exact quirks
    (regression_loss.py:101-142 `diou_loss`, returned as diou = 1 - loss):

    - the "centre" is computed as (ymin + height, xmin + width) — i.e. the
      bottom-right CORNER, not the centre (regression_loss.py:130-131);
      kept bit-for-bit since parity is the point of this op
    - gt height/width/area are NOT clamped to >= 0 (regression_loss.py:45-47)
      while pred's are (regression_loss.py:115-116)
    - divide_no_nan guards (exact-zero denominators yield 0)
    """
    gt_h = gt[..., 2] - gt[..., 0]
    gt_w = gt[..., 3] - gt[..., 1]
    gt_area = gt_h * gt_w
    pr_h = jnp.maximum(0.0, pred[..., 2] - pred[..., 0])
    pr_w = jnp.maximum(0.0, pred[..., 3] - pred[..., 1])
    pr_area = pr_h * pr_w

    inter_h = jnp.maximum(0.0, jnp.minimum(gt[..., 2], pred[..., 2])
                          - jnp.maximum(gt[..., 0], pred[..., 0]))
    inter_w = jnp.maximum(0.0, jnp.minimum(gt[..., 3], pred[..., 3])
                          - jnp.maximum(gt[..., 1], pred[..., 1]))
    inter = inter_h * inter_w
    union = gt_area + pr_area - inter
    v = jnp.where(union == 0.0, 0.0, inter / jnp.where(union == 0.0, 1.0,
                                                       union))

    corner_dist = ((gt[..., 0] + gt_h - pred[..., 0] - pr_h) ** 2
                   + (gt[..., 1] + gt_w - pred[..., 1] - pr_w) ** 2)
    enc_h = jnp.maximum(0.0, jnp.maximum(gt[..., 2], pred[..., 2])
                        - jnp.minimum(gt[..., 0], pred[..., 0]))
    enc_w = jnp.maximum(0.0, jnp.maximum(gt[..., 3], pred[..., 3])
                        - jnp.minimum(gt[..., 1], pred[..., 1]))
    diag = enc_h ** 2 + enc_w ** 2
    pen = jnp.where(diag == 0.0, 0.0,
                    corner_dist / jnp.where(diag == 0.0, 1.0, diag))
    return v - pen


def inverse_diou_loss(pred_boxes, pred_valid, gt_boxes, gt_valid):
    """Reward predictions that move AWAY from ground-truth persons.

    Exact parity with regression_loss.py:16-142 (InverseDIOULoss): per
    image, sum over ground-truth boxes of the MAX diou over predicted
    boxes (each pred scored by `1 - diou_loss`, regression_loss.py:84),
    plus keras epsilon per image; summed over the batch. Images with no
    valid predictions contribute only the epsilon (regression_loss.py:58-59).
    The reference's nested dynamic GPU loops become one masked [B, P, G]
    broadcast + max.

    Args:
      pred_boxes: [B, P, 4]; pred_valid: [B, P] bool.
      gt_boxes: [B, G, 4]; gt_valid: [B, G] bool.
    Returns the scalar batch loss.
    """
    keras_eps = 1e-7
    p = pred_boxes[:, :, None, :]
    g = gt_boxes[:, None, :, :]
    d = _ref_quirk_diou(jnp.broadcast_arrays(g, p)[0],
                        jnp.broadcast_arrays(g, p)[1])     # [B, P, G]
    d = jnp.where(pred_valid[:, :, None], d, -jnp.inf)
    has_pred = jnp.any(pred_valid, axis=1)                  # [B]
    per_gt = jnp.max(d, axis=1)                             # [B, G]
    per_gt = jnp.where(gt_valid & has_pred[:, None], per_gt, 0.0)
    per_image = jnp.sum(per_gt, axis=1) + keras_eps
    return jnp.sum(per_image)
