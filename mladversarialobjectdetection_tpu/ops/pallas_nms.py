"""Pallas TPU kernel for the greedy (soft-)NMS suppression loop.

ops/nms.py runs the greedy selection as a `lax.fori_loop` of ~100 small
XLA ops (argmax, row gather, masked update) — each iteration is serially
dependent, so the step pays per-op overhead ~100x. This kernel runs the
ENTIRE loop on-chip in one pallas program per image: the IoU matrix
([N, N], N = pre-NMS candidates, fits VMEM for N <= ~1024) is computed
once from broadcasted box coordinates, then the M-iteration greedy loop
is lane-parallel VPU work with scalar argmax/extract per step.

Selection semantics are IDENTICAL to ops/nms.nms_padded (same hard /
gaussian rules, same thresholds defaulting) — asserted by tests. Not
differentiable (the production attack step consumes NMS outputs under
stop_gradient; parity with the reference, attacker.py:91-116).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .nms import NEG_INF, NMSResult

_INTERPRET = False  # flipped by tests on CPU


def _nms_kernel(boxes_ref, boxest_ref, scores_ref, idx_ref, score_ref,
                valid_ref, iou_ref, *, m: int, sigma_v: float,
                iou_t: float, score_t: float):
    n = boxes_ref.shape[0]
    # IoU matrix from column [N,1] x row [1,N] broadcasts
    y0c = boxes_ref[:, 0:1]
    x0c = boxes_ref[:, 1:2]
    y1c = boxes_ref[:, 2:3]
    x1c = boxes_ref[:, 3:4]
    y0r = boxest_ref[0:1, :]
    x0r = boxest_ref[1:2, :]
    y1r = boxest_ref[2:3, :]
    x1r = boxest_ref[3:4, :]
    ih = jnp.maximum(0.0, jnp.minimum(y1c, y1r) - jnp.maximum(y0c, y0r))
    iw = jnp.maximum(0.0, jnp.minimum(x1c, x1r) - jnp.maximum(x0c, x0r))
    inter = ih * iw
    areac = jnp.maximum(0.0, y1c - y0c) * jnp.maximum(0.0, x1c - x0c)
    arear = jnp.maximum(0.0, y1r - y0r) * jnp.maximum(0.0, x1r - x0r)
    union = areac + arear - inter
    # the IoU matrix lives in a VMEM scratch ref so the loop can row-index
    # it dynamically (Mosaic lowers dynamic slices on refs, not on values)
    iou_ref[:, :] = jnp.where(union > 0, inter / union, 0.0)  # [N, N]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, live):
        best_score = jnp.max(live)
        best = jnp.argmax(live[0, :]).astype(jnp.int32)
        # selection-identical to ops/nms.py: a NEG_INF winner (suppressed,
        # masked, or exhausted pool) is never valid
        ok = (best_score >= score_t) & (best_score > 0.5 * NEG_INF)

        idx_ref[pl.ds(i, 1), :] = jnp.where(ok, best, 0).reshape(1, 1)
        score_ref[pl.ds(i, 1), :] = jnp.where(ok, best_score,
                                              0.0).reshape(1, 1)
        valid_ref[pl.ds(i, 1), :] = ok.astype(jnp.int32).reshape(1, 1)

        row = iou_ref[pl.ds(best, 1), :]                  # [1, N]
        live = jnp.where(lanes == best, NEG_INF, live)    # kill the winner
        if sigma_v > 0.0:
            decay = jnp.exp(-(row * row) / sigma_v)
            live = jnp.where(ok, live * decay, live)
        else:
            live = jnp.where(ok & (row > iou_t), NEG_INF, live)
        return live

    jax.lax.fori_loop(0, m, body, scores_ref[0:1, :].astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("method", "max_output_size", "iou_thresh",
                     "score_thresh", "sigma"))
def batched_nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, *,
                       method: str = "gaussian",
                       iou_thresh: float | None = None,
                       score_thresh: float | None = None,
                       sigma: float | None = None,
                       max_output_size: int = 100) -> NMSResult:
    """Drop-in for ops/nms.batched_nms (boxes [B,N,4], scores [B,N]);
    the whole greedy loop is one kernel instance per image."""
    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas tpu backend unavailable")
    # threshold defaulting identical to ops/nms.nms_padded
    if method == "hard":
        sigma_v = 0.0
        iou_t = iou_thresh if iou_thresh is not None else 0.5
        score_t = score_thresh if score_thresh is not None else NEG_INF
    elif method == "gaussian":
        sigma_v = sigma if sigma is not None else 0.5
        iou_t = 1.0
        score_t = score_thresh if score_thresh is not None else 0.001
    else:
        raise ValueError(f"invalid nms method {method}")
    if not score_t:
        score_t = NEG_INF if method == "hard" else 0.001
    if method == "hard" and not iou_t:
        iou_t = 0.5

    b, n, _ = boxes.shape
    m = max_output_size
    boxes = boxes.astype(jnp.float32)
    boxest = jnp.swapaxes(boxes, 1, 2)                    # [B, 4, N]
    scores2 = scores.astype(jnp.float32)[:, None, :]      # [B, 1, N]

    kernel = functools.partial(_nms_kernel, m=m, sigma_v=float(sigma_v),
                               iou_t=float(iou_t), score_t=float(score_t))
    idx, out_scores, valid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 4, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, m, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, m, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, m, 1), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=_INTERPRET,
    )(boxes, boxest, scores2)

    idx = idx[..., 0]
    out_scores = out_scores[..., 0]
    valid_b = valid[..., 0].astype(bool)
    out_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    out_boxes = out_boxes * valid_b[..., None].astype(out_boxes.dtype)
    return NMSResult(out_boxes, out_scores, idx, valid_b,
                     jnp.sum(valid_b.astype(jnp.int32), axis=1))
