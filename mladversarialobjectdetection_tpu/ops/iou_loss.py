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


def inverse_diou_loss(pred_boxes, pred_valid, gt_boxes, gt_valid):
    """Reward predictions that move AWAY from ground-truth persons.

    Parity with regression_loss.py:16-142 (InverseDIOULoss): for every
    (pred, gt) pair, loss = 1 + diou (so minimizing pushes diou -> -1,
    i.e. far boxes). The reference's nested dynamic loops become one
    masked [B, P, G] broadcast.

    Args:
      pred_boxes: [B, P, 4]; pred_valid: [B, P] bool.
      gt_boxes: [B, G, 4]; gt_valid: [B, G] bool.
    Returns scalar mean loss over valid pairs.
    """
    p = pred_boxes[:, :, None, :]
    g = gt_boxes[:, None, :, :]
    d = diou(jnp.broadcast_arrays(p, g)[0], jnp.broadcast_arrays(p, g)[1])
    mask = pred_valid[:, :, None] & gt_valid[:, None, :]
    loss = (1.0 + d) * mask
    return jnp.sum(loss) / (jnp.sum(mask) + _EPS)
