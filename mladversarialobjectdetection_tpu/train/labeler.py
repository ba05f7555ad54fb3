"""Anchor labeling: assign ground-truth boxes to anchors for supervised
detector training.

Behavioral parity with reference tf2/anchors.py:171-250 (`AnchorLabeler`)
+ object_detection/argmax_matcher.py: per-anchor argmax IoU matching with
match/unmatched threshold 0.5, force-match for every ground-truth row, and
Faster-RCNN box encoding (the inverse of ops/anchors.decode_box_outputs).

TPU-first: fully vectorized over a static [G] gt-slot layout with validity
masks; no dynamic shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..ops import nms as nms_ops


class AnchorLabels(NamedTuple):
    cls_targets: jnp.ndarray    # [A] int32 class id, -1 negative, -2 ignored
    box_targets: jnp.ndarray    # [A, 4] encoded regression targets
    num_positives: jnp.ndarray  # [] float


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Box corners -> (ty, tx, th, tw) against anchors (inverse of
    decode_box_outputs; faster_rcnn_box_coder parity)."""
    anchors = anchors.astype(boxes.dtype)
    ycenter_a = (anchors[..., 0] + anchors[..., 2]) / 2
    xcenter_a = (anchors[..., 1] + anchors[..., 3]) / 2
    ha = anchors[..., 2] - anchors[..., 0]
    wa = anchors[..., 3] - anchors[..., 1]
    ycenter = (boxes[..., 0] + boxes[..., 2]) / 2
    xcenter = (boxes[..., 1] + boxes[..., 3]) / 2
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    eps = 1e-8
    ty = (ycenter - ycenter_a) / (ha + eps)
    tx = (xcenter - xcenter_a) / (wa + eps)
    th = jnp.log(jnp.maximum(h, eps) / (ha + eps))
    tw = jnp.log(jnp.maximum(w, eps) / (wa + eps))
    return jnp.stack([ty, tx, th, tw], axis=-1)


def label_anchors(anchor_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_classes: jnp.ndarray, gt_valid: jnp.ndarray, *,
                  match_threshold: float = 0.5,
                  unmatched_threshold: float = 0.5) -> AnchorLabels:
    """Label one image's anchors.

    Args:
      anchor_boxes: [A, 4].
      gt_boxes: [G, 4] padded; gt_classes: [G] int32; gt_valid: [G] bool.
    """
    a = anchor_boxes.shape[0]
    iou = nms_ops.iou(anchor_boxes, gt_boxes)            # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)                     # [A]
    best_iou = jnp.max(iou, axis=1)                       # [A]

    # force-match: every valid gt claims its best anchor
    best_anchor_per_gt = jnp.argmax(iou, axis=0)          # [G]
    forced = jnp.zeros((a,), bool)
    forced_gt = jnp.zeros((a,), jnp.int32)
    g = gt_boxes.shape[0]
    gt_ids = jnp.arange(g)
    forced = forced.at[best_anchor_per_gt].set(
        gt_valid, mode="drop")
    forced_gt = forced_gt.at[best_anchor_per_gt].set(
        jnp.where(gt_valid, gt_ids, 0), mode="drop")

    matched = (best_iou >= match_threshold) | forced
    assigned_gt = jnp.where(forced, forced_gt, best_gt)

    cls_targets = jnp.where(matched, gt_classes[assigned_gt], -1)
    # anchors in [unmatched_threshold, match_threshold) would be ignored
    # (-2); with both thresholds at .5 (the automl default) none exist.
    ignored = (~matched) & (best_iou >= unmatched_threshold)
    cls_targets = jnp.where(ignored, -2, cls_targets)

    box_targets = encode_boxes(gt_boxes[assigned_gt], anchor_boxes)
    box_targets = jnp.where(matched[:, None], box_targets, 0.0)
    num_positives = jnp.sum(matched.astype(jnp.float32))
    return AnchorLabels(cls_targets.astype(jnp.int32), box_targets,
                        num_positives)
