"""Anchor decode + NMS postprocessing pipeline.

Behavioral parity with reference tf2/postprocess.py:
  - `merge_class_box_level_outputs` (postprocess.py:67-81): concat per-level
    head outputs into [B, A, C] / [B, A, 4]
  - `max_reduce` candidate selection (postprocess.py:104-116): keep every
    anchor with its max-class score
  - `pre_nms` (postprocess.py:119-156): decode boxes, sigmoid scores
  - `postprocess_global` (postprocess.py:375-406): per-image NMS + clip +
    rescale to original image coordinates
  - CLASS_OFFSET = 1 (postprocess.py:26)

TPU-first deltas: a static `pre_nms_topk` selects the NMS candidate set
(replacing the reference's dynamic all-anchor NMS input) and every output is
a fixed-shape padded tensor with a validity mask instead of ragged/dynamic.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import nms as nms_ops
from .anchors import Anchors, decode_box_outputs
from ..utils.image import parse_image_size

CLASS_OFFSET = 1


class Detections(NamedTuple):
    """Padded per-image detections (all [B, M, ...] / [B, M] / [B])."""
    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    valid_len: jnp.ndarray


def merge_class_box_level_outputs(
        params, cls_outputs: Sequence[jnp.ndarray],
        box_outputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concat all levels into [B, A, num_classes] and [B, A, 4]."""
    num_classes = params["num_classes"]
    cls_all: List[jnp.ndarray] = []
    box_all: List[jnp.ndarray] = []
    batch = cls_outputs[0].shape[0]
    for level in range(0, params["max_level"] - params["min_level"] + 1):
        cls_all.append(cls_outputs[level].reshape(batch, -1, num_classes))
        box_all.append(box_outputs[level].reshape(batch, -1, 4))
    return jnp.concatenate(cls_all, axis=1), jnp.concatenate(box_all, axis=1)


def pre_nms(params, cls_outputs: Sequence[jnp.ndarray],
            box_outputs: Sequence[jnp.ndarray]
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode all anchors; per-anchor max class (max_reduce mode).

    Returns (boxes [B,A,4], scores [B,A] sigmoid, classes [B,A] int32) with
    classes NOT yet offset (person == 0), matching the reference's use in
    attacker.py:106 / attack_detection.py:116.
    """
    anchors = Anchors(params["min_level"], params["max_level"],
                      params["num_scales"], tuple(params["aspect_ratios"]),
                      params["anchor_scale"], params["image_size"])
    cls_merged, box_merged = merge_class_box_level_outputs(
        params, cls_outputs, box_outputs)
    classes = jnp.argmax(cls_merged, axis=-1).astype(jnp.int32)  # [B, A]
    logits = jnp.max(cls_merged, axis=-1)                         # [B, A]
    anchor_boxes = jnp.asarray(anchors.boxes)                     # [A, 4]
    boxes = decode_box_outputs(box_merged, anchor_boxes[None])    # [B, A, 4]
    scores = jax.nn.sigmoid(logits)
    return boxes, scores, classes


def clip_boxes(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip boxes into the image (reference postprocess.py:61-64)."""
    h, w = parse_image_size(image_size)
    lo = jnp.zeros((4,), boxes.dtype)
    hi = jnp.asarray([h, w, h, w], boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def _select_topk(scores, topk: int, nms_cfg):
    """Pre-NMS candidate selection: exact `lax.top_k`, or the TPU-native
    approximate variant when `nms_configs.pre_nms_approx_topk` is set.

    `lax.approx_max_k` maps onto the TPU's fused PartialReduce unit and is
    measured ~5% end-to-end on the 1536px giants (d7x b8 serve: exact top-k
    over ~590k anchors costs ~11 ms of a 219 ms step; the approx variant
    ~2.6 ms — BENCH_NOTES "approximate pre-NMS top-k"). Default OFF: exact
    parity with the reference candidate set. `True` uses recall target 0.95;
    a float value is used as the recall target directly. With the default
    `aggregate_to_topk=True` the output is exactly sorted descending, so
    downstream NMS semantics are unchanged — only which tail candidates
    enter the pool differs. On CPU the op lowers to an exact sort.
    """
    get = nms_cfg.get if hasattr(nms_cfg, "get") else nms_cfg.__getitem__
    try:
        approx = get("pre_nms_approx_topk")
    except KeyError:
        approx = None
    if not approx:
        return jax.lax.top_k(scores, topk)
    recall = 0.95 if approx is True else float(approx)
    return jax.lax.approx_max_k(scores, topk, recall_target=recall)


def _pre_nms_select(params, cls_outputs: Sequence[jnp.ndarray],
                    box_outputs: Sequence[jnp.ndarray]
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k candidate selection BEFORE box decode.

    Ordering parity with the reference's `max_nms_inputs` mode
    (tf2/postprocess.py:88-116), which top-ks raw per-anchor scores and only
    then decodes. Box decode is per-anchor elementwise, so selecting first
    and decoding only the K winners is EXACTLY identical to the
    decode-everything path (`pre_nms` + take_along_axis) — while skipping
    the [B, A, 4] exp/mul decode and its fp32 HBM round-trip, which
    dominates postprocess on the ~590k-anchor 1536px giants. Top-k runs on
    the sigmoid scores (not raw logits) so saturated-score tie-breaking is
    bit-identical to the previous decode-all path.

    Returns (top_boxes [B,K,4] decoded, top_scores [B,K] sigmoid,
    top_classes [B,K] int32, NOT class-offset).
    """
    anchors = Anchors(params["min_level"], params["max_level"],
                      params["num_scales"], tuple(params["aspect_ratios"]),
                      params["anchor_scale"], params["image_size"])
    cls_merged, box_merged = merge_class_box_level_outputs(
        params, cls_outputs, box_outputs)
    classes = jnp.argmax(cls_merged, axis=-1).astype(jnp.int32)   # [B, A]
    scores = jax.nn.sigmoid(jnp.max(cls_merged, axis=-1))          # [B, A]

    nms_cfg = params["nms_configs"]
    get = nms_cfg.get if hasattr(nms_cfg, "get") else nms_cfg.__getitem__
    topk = min(int(get("pre_nms_topk") or 1024), scores.shape[1])

    top_scores, top_idx = _select_topk(scores, topk, nms_cfg)     # [B, K]
    top_enc = jnp.take_along_axis(box_merged, top_idx[..., None], axis=1)
    anchor_boxes = jnp.asarray(anchors.boxes)                      # [A, 4]
    top_boxes = decode_box_outputs(top_enc, anchor_boxes[top_idx])
    top_classes = jnp.take_along_axis(classes, top_idx, axis=1)
    return top_boxes, top_scores, top_classes


def nms_kwargs_from_config(nms_configs) -> dict:
    """Translate a config nms_configs block into nms_padded kwargs."""
    get = nms_configs.get if hasattr(nms_configs, "get") else nms_configs.__getitem__
    return dict(
        method=get("method") or "hard",
        iou_thresh=get("iou_thresh"),
        score_thresh=get("score_thresh"),
        sigma=get("sigma"),
        max_output_size=int(get("max_output_size") or 100),
    )


def postprocess_global(params, cls_outputs, box_outputs,
                       image_scales=None) -> Detections:
    """Global (class-agnostic) NMS postprocessing, fixed shapes.

    Parity with reference postprocess.py:375-406, with a static top-k
    candidate pre-selection (`nms_configs.pre_nms_topk`).
    """
    top_boxes, top_scores, top_classes = _pre_nms_select(
        params, list(cls_outputs), list(box_outputs))
    nms_cfg = params["nms_configs"]
    kw = nms_kwargs_from_config(nms_cfg)
    res = nms_ops.batched_nms_auto(top_boxes, top_scores, **kw)
    out_boxes = clip_boxes(res.boxes, params["image_size"])
    out_classes = (jnp.take_along_axis(top_classes, res.indices, axis=1)
                   + CLASS_OFFSET) * res.valid
    if image_scales is not None:
        scales = jnp.asarray(image_scales).reshape(-1, 1, 1)
        out_boxes = out_boxes * scales.astype(out_boxes.dtype)
    return Detections(out_boxes, res.scores, out_classes.astype(jnp.float32),
                      res.valid, res.valid_len)


def postprocess_per_class(params, cls_outputs, box_outputs,
                          image_scales=None) -> Detections:
    """Per-class NMS postprocessing, fixed shapes.

    Parity with reference postprocess.py:333-372 / nms_np per-class
    semantics: suppression only happens between boxes of the SAME class.
    TPU-native formulation: instead of a dynamic per-class loop, boxes are
    shifted by class_id * image_diagonal before one global NMS pass
    (cross-class IoU becomes 0), then shifted back — a single fixed-shape
    suppression loop regardless of how many classes are present.
    """
    top_boxes, top_scores, top_classes = _pre_nms_select(
        params, list(cls_outputs), list(box_outputs))
    nms_cfg = params["nms_configs"]

    # class bands must not overlap even for pathological unclipped decoded
    # boxes, so the shift is derived from the actual candidate extent
    # (ADVICE r1: a fixed 2*max(h,w) offset can be exceeded by exp-decoded
    # boxes). NMS itself sees raw (unclipped) boxes like the reference's
    # per_class_nms (postprocess.py:409-462); clipping happens after.
    offset = (jnp.max(top_boxes) - jnp.min(top_boxes) + 1.0).astype(
        top_boxes.dtype)
    shifted = top_boxes + (top_classes[..., None].astype(top_boxes.dtype)
                           * offset)
    kw = nms_kwargs_from_config(nms_cfg)
    res = nms_ops.batched_nms_auto(shifted, top_scores, **kw)
    sel_classes = jnp.take_along_axis(top_classes, res.indices, axis=1)
    out_boxes = res.boxes - (sel_classes[..., None].astype(res.boxes.dtype)
                             * offset) * res.valid[..., None]
    # NO clipping: the reference's per_class path never clips — only its
    # global path does (postprocess.py:409-466 vs 375-406) — mirrored
    # exactly; invalid rows are zeroed like the reference's zero padding
    out_boxes = out_boxes * res.valid[..., None]
    out_classes = (sel_classes + CLASS_OFFSET) * res.valid
    if image_scales is not None:
        scales = jnp.asarray(image_scales).reshape(-1, 1, 1)
        out_boxes = out_boxes * scales.astype(out_boxes.dtype)
    return Detections(out_boxes, res.scores, out_classes.astype(jnp.float32),
                      res.valid, res.valid_len)


def pre_nms_multiclass(params, cls_outputs, box_outputs
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode all anchors keeping the FULL per-class score matrix.

    Parity with reference pre_nms(topk=False) (postprocess.py:119-160 as
    called by postprocess_combined at 227): boxes [B, A, 4] decoded,
    scores [B, A, C] sigmoid (no candidate reduction)."""
    anchors = Anchors(params["min_level"], params["max_level"],
                      params["num_scales"], tuple(params["aspect_ratios"]),
                      params["anchor_scale"], params["image_size"])
    cls_merged, box_merged = merge_class_box_level_outputs(
        params, cls_outputs, box_outputs)
    anchor_boxes = jnp.asarray(anchors.boxes)
    boxes = decode_box_outputs(box_merged, anchor_boxes[None])
    scores = jax.nn.sigmoid(cls_merged)
    return boxes, scores


def postprocess_combined(params, cls_outputs, box_outputs,
                         image_scales=None) -> Detections:
    """Combined-NMS postprocessing (reference postprocess.py:208-245).

    tf.image.combined_non_max_suppression with q=1 runs HARD per-class NMS
    (iou 0.5) over boxes SHARED across classes — one anchor can be emitted
    once per class — then merges all classes' survivors by score. The
    TPU-native fixed-shape equivalent: flatten the [B, A, C] score matrix,
    top-k over (anchor, class) pairs (so multi-class-per-box candidates
    survive, unlike max_reduce), then one class-shifted NMS pass whose
    greedy global-score order reproduces the merge+sort. The config's
    method/sigma/iou are deliberately ignored, matching the reference's
    call (score_threshold only, iou fixed at the combined-NMS default .5).
    """
    # decode-after-select (see _pre_nms_select): top-k over the flattened
    # (anchor, class) score matrix first, then decode only the K winning
    # anchors' regressions — identical by construction, skips the
    # [B, A, 4] all-anchor decode
    anchors = Anchors(params["min_level"], params["max_level"],
                      params["num_scales"], tuple(params["aspect_ratios"]),
                      params["anchor_scale"], params["image_size"])
    cls_merged, box_merged = merge_class_box_level_outputs(
        params, list(cls_outputs), list(box_outputs))
    b, a, c = cls_merged.shape
    nms_cfg = params["nms_configs"]
    get = nms_cfg.get if hasattr(nms_cfg, "get") else nms_cfg.__getitem__
    topk = min(int(get("pre_nms_topk") or 1024), a * c)
    max_out = int(get("max_output_size") or 100)
    score_thresh = get("score_thresh") or None  # None -> hard default -inf

    flat = jax.nn.sigmoid(cls_merged).reshape(b, a * c)
    top_scores, top_flat_idx = _select_topk(flat, topk, nms_cfg)  # [B, K]
    top_anchor = top_flat_idx // c
    top_classes = (top_flat_idx % c).astype(jnp.int32)
    top_enc = jnp.take_along_axis(box_merged, top_anchor[..., None], axis=1)
    anchor_boxes = jnp.asarray(anchors.boxes)
    top_boxes = decode_box_outputs(top_enc, anchor_boxes[top_anchor])

    offset = (jnp.max(top_boxes) - jnp.min(top_boxes) + 1.0).astype(
        top_boxes.dtype)
    shifted = top_boxes + (top_classes[..., None].astype(top_boxes.dtype)
                           * offset)
    res = nms_ops.batched_nms_auto(shifted, top_scores, method="hard",
                              iou_thresh=0.5, score_thresh=score_thresh,
                              max_output_size=max_out)
    sel_classes = jnp.take_along_axis(top_classes, res.indices, axis=1)
    out_boxes = res.boxes - (sel_classes[..., None].astype(res.boxes.dtype)
                             * offset) * res.valid[..., None]
    out_boxes = clip_boxes(out_boxes * res.valid[..., None],
                           params["image_size"])
    out_classes = (sel_classes + CLASS_OFFSET) * res.valid
    if image_scales is not None:
        scales = jnp.asarray(image_scales).reshape(-1, 1, 1)
        out_boxes = out_boxes * scales.astype(out_boxes.dtype)
    return Detections(out_boxes, res.scores, out_classes.astype(jnp.float32),
                      res.valid, res.valid_len)


# ---------------------------------------------------------------------------
# TFLite post mode (reference postprocess.py:248-373)
# ---------------------------------------------------------------------------

def decode_anchors_to_centersize(anchor_boxes: jnp.ndarray) -> jnp.ndarray:
    """Corner anchors -> {y_center, x_center, h, w} (reference
    tf2/anchors.py:61-80, used by TFLite's custom NMS op)."""
    ycenter = (anchor_boxes[..., 0] + anchor_boxes[..., 2]) / 2
    xcenter = (anchor_boxes[..., 1] + anchor_boxes[..., 3]) / 2
    h = anchor_boxes[..., 2] - anchor_boxes[..., 0]
    w = anchor_boxes[..., 3] - anchor_boxes[..., 1]
    return jnp.stack([ycenter, xcenter, h, w], axis=-1)


def tflite_pre_nms(params, cls_outputs, box_outputs):
    """The TFLite custom-NMS op's input layout (postprocess.py:291-331):

    Returns (box_outputs [B, A, 4] raw regression encodings,
    scores [B, A, C] sigmoid, anchors [A, 4] normalized center-size).
    """
    anchors = Anchors(params["min_level"], params["max_level"],
                      params["num_scales"], tuple(params["aspect_ratios"]),
                      params["anchor_scale"], params["image_size"])
    cls_merged, box_merged = merge_class_box_level_outputs(
        params, cls_outputs, box_outputs)
    h, w = parse_image_size(params["image_size"])
    norm = jnp.asarray([h, w, h, w], jnp.float32)
    normalized_anchors = jnp.asarray(anchors.boxes) / norm
    decoded_anchors = decode_anchors_to_centersize(normalized_anchors)
    scores = jax.nn.sigmoid(cls_merged)
    return box_merged, scores, decoded_anchors


def postprocess_tflite(params, cls_outputs, box_outputs) -> Detections:
    """Runnable equivalent of TFLite's custom detection-postprocess op.

    The reference's postprocess_tflite (postprocess.py:333-373) emits a
    dummy `tf.function` that the MLIR converter legalizes into
    TFLite_Detection_PostProcess with use_regular_nms=false and
    max_classes_per_detection=1 (the attrs in
    tflite_nms_implements_signature, postprocess.py:248-288). That op's
    fast path is: per anchor, take the max class; hard-NMS with the
    config's iou/score thresholds; decode survivors against center-size
    anchors with unit scale factors. This function executes those same
    semantics on TPU so the tflite output layout is servable here too.

    Returns Detections with boxes in NORMALIZED [0, 1] corner coordinates
    and 0-based classes — the TFLite op's output contract (no CLASS_OFFSET,
    no pixel scale-back), sized `tflite_max_detections`.
    """
    box_enc, scores, decoded_anchors = tflite_pre_nms(
        params, list(cls_outputs), list(box_outputs))
    return tflite_detections_from_pre(params, box_enc, scores,
                                      decoded_anchors)


def tflite_detections_from_pre(params, box_enc, scores,
                               decoded_anchors) -> Detections:
    """TFLite custom-NMS-op semantics on the pre-NMS triple.

    Split out so int8 TFLite artifacts — which, like the reference INT8
    export, contain only the quantized network up to the NMS op's inputs
    (infer_lib.py:534-539 keeps the NMS itself a float builtin) — can be
    re-served: the TfliteDriver dequantizes the triple and finishes with
    this function.
    """
    nms_cfg = params["nms_configs"]
    get = nms_cfg.get if hasattr(nms_cfg, "get") else nms_cfg.__getitem__
    iou_thresh = get("iou_thresh") or 0.5
    score_thresh = get("score_thresh") or None
    max_det = int(params.get("tflite_max_detections") or 100)

    # fast-NMS path: per-anchor max class (detection_postprocess.cc)
    cls_ids = jnp.argmax(scores, axis=-1).astype(jnp.int32)   # [B, A]
    max_scores = jnp.max(scores, axis=-1)                     # [B, A]

    # decode-after-select (see _pre_nms_select): top-k first, then decode
    # only the K winning anchors' encodings against their center-size
    # anchor rows (scale factors 1.0) — per-anchor elementwise, so exactly
    # identical to decoding all anchors first
    topk = min(int(get("pre_nms_topk") or 1024), max_scores.shape[1])
    top_scores, top_idx = _select_topk(max_scores, topk, nms_cfg)
    top_enc = jnp.take_along_axis(box_enc, top_idx[..., None], axis=1)
    top_anc = jnp.asarray(decoded_anchors)[top_idx]           # [B, K, 4]
    ya, xa, ha, wa = (top_anc[..., 0], top_anc[..., 1],
                      top_anc[..., 2], top_anc[..., 3])
    ty, tx, th, tw = (top_enc[..., 0], top_enc[..., 1],
                      top_enc[..., 2], top_enc[..., 3])
    ycenter = ty * ha + ya
    xcenter = tx * wa + xa
    hh = jnp.exp(th) * ha
    ww = jnp.exp(tw) * wa
    top_boxes = jnp.stack([ycenter - hh / 2, xcenter - ww / 2,
                           ycenter + hh / 2, xcenter + ww / 2], axis=-1)
    top_classes = jnp.take_along_axis(cls_ids, top_idx, axis=1)

    res = nms_ops.batched_nms_auto(top_boxes, top_scores, method="hard",
                              iou_thresh=iou_thresh,
                              score_thresh=score_thresh,
                              max_output_size=max_det)
    out_classes = (jnp.take_along_axis(top_classes, res.indices, axis=1)
                   * res.valid)
    return Detections(res.boxes, res.scores, out_classes.astype(jnp.float32),
                      res.valid, res.valid_len)
