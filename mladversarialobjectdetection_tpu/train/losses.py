"""Detection losses: focal classification + huber box regression.

Behavioral parity with reference tf2/train_lib.py:357-464 (`FocalLoss`
alpha/gamma with label smoothing, `BoxLoss` huber delta .1 scaled x4,
`BoxIouLoss`) normalized by the positive-anchor count.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from . import labeler as labeler_lib
from ..ops import iou_loss as iou_lib


def focal_loss(logits: jnp.ndarray, targets_one_hot: jnp.ndarray,
               alpha: float, gamma: float, normalizer,
               label_smoothing: float = 0.0) -> jnp.ndarray:
    """Per-element focal loss / normalizer (train_lib.py:357-406).

    The focal multipliers (p_t, alpha_factor) are computed from the
    UNSMOOTHED targets; label smoothing applies only inside the
    cross-entropy — "compute focal loss multipliers before label
    smoothing, such that it will not blow up the loss"
    (train_lib.py:394-403)."""
    y = targets_one_hot
    pred_prob = jax.nn.sigmoid(logits)
    p_t = y * pred_prob + (1 - y) * (1 - pred_prob)
    alpha_factor = y * alpha + (1 - y) * (1 - alpha)
    modulating = (1.0 - p_t) ** gamma
    if label_smoothing:
        y = y * (1 - label_smoothing) + 0.5 * label_smoothing
    ce = (jnp.maximum(logits, 0) - logits * y
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return alpha_factor * modulating * ce / normalizer


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray,
               delta: float) -> jnp.ndarray:
    err = target - pred
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad ** 2 + delta * (abs_err - quad)


def detection_loss(cls_outputs: Sequence[jnp.ndarray],
                   box_outputs: Sequence[jnp.ndarray],
                   labels: labeler_lib.AnchorLabels,
                   *, num_classes: int, num_anchors: int,
                   alpha: float = 0.25, gamma: float = 1.5,
                   delta: float = 0.1, box_loss_weight: float = 50.0,
                   label_smoothing: float = 0.0,
                   anchor_boxes: jnp.ndarray | None = None,
                   iou_loss_type: str | None = None,
                   iou_loss_weight: float = 1.0
                   ) -> Tuple[jnp.ndarray, dict]:
    """Total per-batch detection loss (EfficientDetNetTrain semantics,
    train_lib.py:530-729).

    cls_outputs/box_outputs: per-level [B, H, W, A*C] / [B, H, W, A*4];
    labels: batched AnchorLabels ([B, A] / [B, A, 4] / [B]).
    """
    b = cls_outputs[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_outputs], axis=1)
    box_flat = jnp.concatenate(
        [x.reshape(b, -1, 4) for x in box_outputs], axis=1)

    cls_t = labels.cls_targets                     # [B, A]
    positives = cls_t >= 0
    ignored = cls_t == -2
    one_hot = jax.nn.one_hot(jnp.maximum(cls_t, 0), num_classes)
    one_hot = one_hot * positives[..., None]

    normalizer = jnp.sum(labels.num_positives) + 1.0
    cls_l = focal_loss(cls_flat, one_hot, alpha, gamma, normalizer,
                       label_smoothing)
    cls_l = jnp.where(ignored[..., None], 0.0, cls_l)
    cls_loss = jnp.sum(cls_l)

    box_l = huber_loss(box_flat, labels.box_targets, delta)
    box_l = box_l * positives[..., None]
    # BoxLoss normalizer is num_positives_sum * 4 (train_lib.py:441-447:
    # `normalizer = num_positives * 4.0`, then sum/normalizer — the mean
    # over the 4 box coordinates)
    box_loss = jnp.sum(box_l) / (normalizer * 4.0)

    total = cls_loss + box_loss_weight * box_loss
    parts = {"cls_loss": cls_loss, "box_loss": box_loss}

    if iou_loss_type:
        # BoxIouLoss (train_lib.py:450-464): decode predictions AND targets
        # against the anchors, zero both elementwise where the target
        # coordinate is 0 (the reference's mask convention), iou-family
        # loss summed / (num_positives_sum * 4)
        if anchor_boxes is None:
            raise ValueError("iou_loss_type requires anchor_boxes")
        from ..ops import anchors as anchors_lib
        mask4 = (labels.box_targets != 0.0).astype(box_flat.dtype)
        dec_pred = anchors_lib.decode_box_outputs(
            box_flat, anchor_boxes[None]) * mask4
        dec_tgt = anchors_lib.decode_box_outputs(
            labels.box_targets, anchor_boxes[None]) * mask4
        iou_l = iou_lib.iou_loss(dec_pred, dec_tgt, iou_loss_type)
        box_iou_loss = jnp.sum(iou_l) / (normalizer * 4.0)
        total = total + iou_loss_weight * box_iou_loss
        parts["box_iou_loss"] = box_iou_loss

    return total, parts


def class_weighted_bce(logits: jnp.ndarray, labels: jnp.ndarray,
                       pos_weight: float = 1.0,
                       neg_weight: float = 1.0) -> jnp.ndarray:
    """Generic class-weighted binary cross-entropy (logit space): per-
    element BCE where positives/negatives carry explicit weights. For the
    reference's exact batch-self-weighted variant see
    `self_weighted_binary_ce`.
    """
    ce = (jnp.maximum(logits, 0) - logits * labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    weights = labels * pos_weight + (1.0 - labels) * neg_weight
    return weights * ce


def self_weighted_binary_ce(y_true: jnp.ndarray,
                            y_pred: jnp.ndarray) -> jnp.ndarray:
    """Exact parity with reference util.py:192-213 `self_weightd_binary_ce`
    (kept unused there "for reuse"): probability-space BCE where the
    positive weight is 1 - mean(positive fraction) computed FROM the batch
    itself; per-example mean over axis 1, summed over the batch.

    Args: y_true [B, N] in {0, 1}; y_pred [B, N] probabilities.
    """
    eps = 1e-7  # keras epsilon
    false_targets = jnp.where(y_true != 0.0, 1.0, 0.0)
    alpha_factor = 1.0 - jnp.mean(false_targets)
    y_pred = jnp.clip(y_pred, eps, 1.0 - eps)
    p_t = jnp.where(y_true == 1.0, y_pred, 1.0 - y_pred)
    alpha_t = jnp.where(y_true == 1.0, alpha_factor, 1.0 - alpha_factor)
    loss = alpha_t * (-jnp.log(p_t))
    return jnp.sum(jnp.mean(loss, axis=1))


def l2_regularization(params, weight_decay: float) -> jnp.ndarray:
    """Weight decay over conv/dense kernels only (train_lib.py:617-623
    filters BN/bias by name). tf.nn.l2_loss is sum(w**2)/2 — the /2 is
    kept for exact parity with the reference's effective decay."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("kernel",):
            total = total + 0.5 * jnp.sum(leaf.astype(jnp.float32) ** 2)
    return weight_decay * total
