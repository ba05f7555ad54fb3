"""Adversarial-patch attack training core, TPU-native.

Behavioral parity with reference attacker.py (PatchAttacker, 24-341):
  - two-pass scheme: a clean detector pass finds person boxes (no gradient,
    attacker.py:91-116), the patched pass runs under the gradient
    (attacker.py:118-141,182-193)
  - exactly two trainable tensors: a PxPx3 patch clipped to [-1,1] and a
    scale scalar clipped to [0,1] (attacker.py:51-54)
  - loss = sum(max_score^2 + (max_score - scale)^2) + 1e-5 * TV(patch)
    (attacker.py:190-193)
  - box validity filter: box fits image, area > 100 px, (first pass only)
    score >= nms score_thresh (attacker.py:70-89)
  - ASR metric from NMS'd clean vs patched detections (attacker.py:238-263)

TPU-first design: everything below `train_step` is one jitted SPMD program
over a data-parallel mesh — static [B, K] box slots instead of ragged
tensors, the EOT compositor from ops/eot.py instead of scatter loops, optax
instead of Keras, explicit PRNG keys instead of stateful RNG. Gradients are
reduced across the mesh by XLA-inserted collectives (batch sharding).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.efficientdet import DetSpec, EfficientDetNet, spec_from_config
from ..ops import eot
from ..ops import nms as nms_ops
from ..ops import postprocess

NEG_INF = nms_ops.NEG_INF


class AttackState(NamedTuple):
    patch: jnp.ndarray       # [P, P, 3] in [-1, 1]
    scale: jnp.ndarray       # [] in [0, 1]
    opt_state: Any
    step: jnp.ndarray        # [] int32
    key: jax.Array


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    scale: jnp.ndarray
    scale_loss: jnp.ndarray
    tv_loss: jnp.ndarray
    mean_max_score: jnp.ndarray
    std_max_score: jnp.ndarray
    asr: jnp.ndarray
    asr_to_scale: jnp.ndarray
    # fraction of live patch slots whose rotation region exceeds the static
    # EOT window and is clamped tighter than the reference's image-width
    # clamp would (ops/eot.py geometry vs attacker.py:472). Sustained > 0
    # means the composite deviates from reference semantics at the current
    # scale — raise `window`. See tests/test_eot_parity_tf.py clamp bound.
    eot_clamp_frac: jnp.ndarray


def filter_valid_boxes(scores: jnp.ndarray, boxes: jnp.ndarray,
                       classes: jnp.ndarray, image_hw: Tuple[int, int],
                       score_thresh: float | None) -> jnp.ndarray:
    """Person + validity mask over anchors (attacker.py:70-89 + person
    filter at 106-113). Returns bool [B, A]."""
    h, w = float(image_hw[0]), float(image_hw[1])
    bh = boxes[..., 2] - boxes[..., 0]
    bw = boxes[..., 3] - boxes[..., 1]
    area = bh * bw
    cond = (classes == 0)  # person (pre-CLASS_OFFSET)
    cond &= (bw / w <= 1.0) & (bh / h <= 1.0)
    cond &= area > 100.0
    if score_thresh is not None:
        cond &= scores >= score_thresh
    return cond


class PatchAttacker:
    """Builds the jitted attack train/eval step for a frozen victim model.

    Unlike the reference's Keras subclass, this is a thin factory around
    pure functions: `init_state` + `train_step(state, images)` /
    `eval_step(state, images)`.
    """

    def __init__(self, config, det_variables, *, patch_size: int = 640,
                 learning_rate: float = 1e-2, tolerance: float = 0.2,
                 bn_axis_name: str | None = None,
                 use_histogram_match: bool = False,
                 window: int | None = None,
                 eot_overrides: Dict[str, Any] | None = None,
                 grad_accum: int = 1,
                 freeze_scale: bool = False,
                 packed_entry: int = 0):
        self.config = config
        self.spec: DetSpec = spec_from_config(config)
        # packed_entry > 0: victim entry stages in the space-to-depth
        # lane-packed layout (models/efficientnet_packed.py) — same
        # variables, less HBM traffic; the victim is frozen so BN running
        # stats are used and sync-BN never applies
        self.net = EfficientDetNet(self.spec, bn_axis_name=bn_axis_name,
                                   packed_entry=packed_entry)
        self.det_variables = det_variables
        self.patch_size = patch_size
        self.image_hw = self.spec.image_size
        self.max_boxes = int(config.get("max_boxes_per_image", 16) or 16)
        # inject_hyperparams makes learning_rate part of opt_state so the
        # host-side ReduceLROnPlateau controller can adjust it
        # (attacker_train.py:70's callback equivalent)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate)
        nms_cfg = config.nms_configs
        self.nms_kwargs = postprocess.nms_kwargs_from_config(nms_cfg)
        self.pre_nms_topk = int(nms_cfg.get("pre_nms_topk") or 1024)
        self.score_thresh = float(nms_cfg.get("score_thresh") or 0.0)
        self.tolerance = tolerance
        # full histogram specification instead of mean matching
        # (brightness_matcher.py HistogramMatcher option)
        self.use_histogram_match = use_histogram_match
        # static EOT composite window (None -> ops/eot.default_window);
        # patches whose rotation region exceeds it are clamped — see
        # ops/eot.py geometry notes
        self.window = window
        # extra kwargs merged into every eot.apply_patches call — the
        # randomness-pinning hook the reference-parity tests use (same
        # pattern as defense.masker.apply_masker's eot_kwargs)
        self.eot_overrides = dict(eot_overrides or {})
        # grad_accum > 1: train_step splits its batch into that many
        # sequential microbatches (lax.scan) — clean pass, EOT compositor
        # and patched fwd+bwd all run at microbatch size, then ONE adam
        # update applies the SUMMED gradients. The attack loss is a sum
        # over images, so summed micro-gradients ARE the full-batch
        # gradient; the batch-independent TV term is weighted 1/k per
        # microbatch so it enters the sum exactly once. The memory lever
        # for attacking the 1024-1536px victims at reference batch sizes.
        self.grad_accum = int(grad_accum)
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        # freeze_scale: diagnostic mode for ASR-vs-scale frontier probes —
        # the (max_score - scale)^2 coupling term is dropped from the loss
        # (the patch purely minimizes sum(max_score^2)) and the scale
        # scalar receives zero gradient, so it stays pinned at its init.
        self.freeze_scale = bool(freeze_scale)
        self._params_dict = config.as_dict()

    # -- state -------------------------------------------------------------
    def init_state(self, key: jax.Array, initial_patch=None,
                   initial_scale: float = 0.4) -> AttackState:
        kp, ks = jax.random.split(key)
        if initial_patch is None:
            patch = jax.random.uniform(
                kp, (self.patch_size, self.patch_size, 3),
                minval=-1.0, maxval=1.0)
        else:
            patch = jnp.asarray(initial_patch, jnp.float32)
        scale = jnp.asarray(initial_scale, jnp.float32)
        opt_state = self.tx.init((scale, patch))
        return AttackState(patch, scale, opt_state,
                           jnp.asarray(0, jnp.int32), ks)

    # -- model passes --------------------------------------------------------
    # `det_variables` threads the frozen victim weights through as a traced
    # argument. When None they are closure-captured from self — which this
    # JAX version lowers as embedded HLO *constants*: ~60 MB of weights
    # serialized into every compiled program (slow compiles, duplicated HBM,
    # and oversized remote-compile payloads). Drivers pass them explicitly;
    # the None fallback keeps ad-hoc/test call sites simple.
    def _forward(self, images: jnp.ndarray, det_variables=None):
        dv = self.det_variables if det_variables is None else det_variables
        cls_out, box_out = self.net.apply(dv, images, False)
        return postprocess.pre_nms(self._params_dict, cls_out, box_out)

    def _nms(self, boxes: jnp.ndarray, masked_scores: jnp.ndarray):
        """Top-k candidate select + padded NMS (attacker.py:143-170)."""
        k = min(self.pre_nms_topk, masked_scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(masked_scores, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        res = nms_ops.batched_nms_auto(top_boxes, top_scores,
                                       **self.nms_kwargs)
        clipped = postprocess.clip_boxes(res.boxes, self.image_hw)
        return clipped, res.scores, res.valid

    def first_pass(self, images: jnp.ndarray, det_variables=None):
        """Clean pass -> NMS'd person boxes, padded (attacker.py:91-116)."""
        boxes, scores, classes = self._forward(images, det_variables)
        cond = filter_valid_boxes(scores, boxes, classes, self.image_hw,
                                  self.score_thresh)
        masked = jnp.where(cond, scores, NEG_INF)
        return self._nms(boxes, masked)

    def second_pass_scores(self, images: jnp.ndarray, det_variables=None):
        """Patched pass -> masked person anchor scores [B, A]
        (attacker.py:118-141; thresh filter off)."""
        boxes, scores, classes = self._forward(images, det_variables)
        cond = filter_valid_boxes(scores, boxes, classes, self.image_hw,
                                  score_thresh=None)
        masked = jnp.where(cond, scores, NEG_INF)
        return boxes, masked

    # -- ASR (attacker.py:238-263) ------------------------------------------
    @staticmethod
    def calc_asr(clean_scores, clean_valid, adv_scores, adv_valid,
                 score_thresh: float = 0.5) -> jnp.ndarray:
        n_clean = jnp.sum((clean_scores >= score_thresh) & clean_valid)
        n_adv = jnp.sum((adv_scores >= score_thresh) & adv_valid)
        return 1.0 - n_adv.astype(jnp.float32) / (
            n_clean.astype(jnp.float32) + 1e-7)

    def _clamp_frac(self, boxes, boxes_valid, scale):
        """Fraction of live slots where the static window clamps the
        rotation region TIGHTER than the reference would: the reference
        clamps diag = sqrt(2)*size to the image width (attacker.py:472),
        ours additionally to `window` (ops/eot.py). Returns sum-pair
        (n_clamped, n_valid) as floats so callers can aggregate."""
        img_w = float(self.image_hw[1])
        win = float(min(self.window or eot.default_window(self.image_hw),
                        img_w))
        longer = jnp.maximum(boxes[..., 2] - boxes[..., 0],
                             boxes[..., 3] - boxes[..., 1])
        size = jnp.floor(longer * jax.lax.stop_gradient(scale))
        diag_ref = jnp.minimum(jnp.sqrt(2.0) * size, img_w)
        clamped = (diag_ref > win) & boxes_valid
        return (jnp.sum(clamped).astype(jnp.float32),
                jnp.sum(boxes_valid).astype(jnp.float32))

    # -- loss ------------------------------------------------------------
    def _loss_from_images(self, patch, scale, images, boxes, boxes_valid, key,
                          det_variables=None, tv_weight: float = 1e-5):
        patched, _ = eot.apply_patches(
            key, images, boxes, boxes_valid, patch, scale,
            tolerance=self.tolerance, window=self.window,
            use_histogram_match=self.use_histogram_match,
            **self.eot_overrides)
        adv_boxes, adv_masked = self.second_pass_scores(patched, det_variables)
        max_scores = jnp.maximum(jnp.max(adv_masked, axis=1), 0.0)  # [B]
        scale_losses = (max_scores - scale) ** 2
        tv = eot.total_variation(patch)
        if self.freeze_scale:
            # frontier-probe objective: pure attack strength at a pinned
            # scale; no gradient flows to `scale` (adam then leaves it
            # exactly unchanged: zero grad -> zero moments -> zero update)
            loss = jnp.sum(max_scores ** 2) + tv_weight * tv
        else:
            loss = jnp.sum(max_scores ** 2 + scale_losses) + tv_weight * tv
        aux = dict(max_scores=max_scores, scale_losses=scale_losses,
                   tv=tv, adv_boxes=adv_boxes, adv_masked=adv_masked)
        return loss, aux

    # -- steps -------------------------------------------------------------
    def train_step(self, state: AttackState, images: jnp.ndarray,
                   with_asr: bool = True,
                   boxes_override: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
                   det_variables=None
                   ) -> Tuple[AttackState, StepMetrics]:
        """One SPMD attack step. jit/pjit me (with_asr static).

        with_asr=False skips the metrics-only NMS pass over the patched
        detections (~16 ms/step on v5e at lite4@640 b24) and reports
        asr/asr_to_scale as NaN; the optimization itself is identical.
        Drivers run the ASR variant only on logged steps — the reference
        computes ASR in-graph every step (attacker.py:238-263) but only
        ever *reads* it at visualize/log cadence.

        boxes_override: optional ([B, K, 4] boxes, [B, K] valid) replacing
        the first-pass detections as the EOT placement targets — a
        bench/diagnostic hook for pinning the live-slot workload
        independently of what the victim detects (bench.py's
        representative regime). The clean pass still executes — its
        output is threaded through an exactly-zero data-dependent term —
        so the step cost stays that of the full two-pass program."""
        key, k_eot, k_next = jax.random.split(state.key, 3)
        del key
        if self.grad_accum > 1:
            return self._train_step_accum(state, images, k_eot, k_next,
                                          with_asr, boxes_override,
                                          det_variables)
        boxes, clean_scores, clean_valid = self.first_pass(images,
                                                           det_variables)
        if boxes_override is not None:
            ob, ov = boxes_override
            # exactly-zero (min(|x| summed, 0)) yet data-dependent on the
            # detected boxes: XLA cannot prove it zero, so the clean pass
            # is never dead-code-eliminated from the compiled step
            keep = jnp.minimum(jnp.sum(jnp.abs(boxes)), 0.0)
            boxes = ob[:, :self.max_boxes] + keep
            boxes_valid = ov[:, :self.max_boxes]
            boxes = jax.lax.stop_gradient(boxes)
        else:
            boxes = jax.lax.stop_gradient(boxes[:, :self.max_boxes])
            boxes_valid = clean_valid[:, :self.max_boxes]

        def loss_fn(trainables):
            scale, patch = trainables
            return self._loss_from_images(patch, scale, images, boxes,
                                          boxes_valid, k_eot, det_variables)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.scale, state.patch))
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            (state.scale, state.patch))
        scale, patch = optax.apply_updates((state.scale, state.patch), updates)
        # variable constraints (attacker.py:51-54)
        patch = jnp.clip(patch, -1.0, 1.0)
        scale = jnp.clip(scale, 0.0, 1.0)

        metrics = self._metrics(loss, scale, aux, clean_scores, clean_valid,
                                with_asr=with_asr,
                                clamp=self._clamp_frac(boxes, boxes_valid,
                                                       state.scale))
        new_state = AttackState(patch, scale, opt_state, state.step + 1,
                                k_next)
        return new_state, metrics

    def _train_step_accum(self, state: AttackState, images, k_eot, k_next,
                          with_asr: bool, boxes_override, det_variables
                          ) -> Tuple[AttackState, StepMetrics]:
        """Gradient-accumulation train step (mirrors the k=1 body of
        `train_step`): lax.scan over `grad_accum` microbatches, each with
        its own fold_in'd EOT key, gradients SUMMED (the attack loss is a
        sum over images; the TV term enters each microbatch at weight
        1e-5/k so the summed loss/gradient equals the full batch's), one
        adam update. ASR and score statistics accumulate as count/sum
        pairs so the reported metrics match the full batch."""
        k = self.grad_accum
        b = images.shape[0]
        if b % k != 0:
            raise ValueError(f"batch {b} not divisible by grad_accum={k}")
        mb = b // k
        micro = images.reshape(k, mb, *images.shape[1:])
        if boxes_override is not None:
            ob, ov = boxes_override
            ob = ob[:, :self.max_boxes]
            ov = ov[:, :self.max_boxes]
            ob = ob.reshape(k, mb, *ob.shape[1:])
            ov = ov.reshape(k, mb, *ov.shape[1:])
            xs = (jnp.arange(k), micro, ob, ov)
        else:
            xs = (jnp.arange(k), micro)
        asr_thresh = 0.5  # calc_asr's default (attacker.py:238-263)

        def body(carry, x):
            (gsum, lsum, sl_sum, s_sum, s_sq, n_clean, n_adv,
             c_sum, v_sum) = carry
            i, imgs = x[0], x[1]
            ke = jax.random.fold_in(k_eot, i)
            boxes, clean_scores, clean_valid = self.first_pass(imgs,
                                                               det_variables)
            if boxes_override is not None:
                # same never-DCE'd clean-pass threading as the k=1 body
                keep = jnp.minimum(jnp.sum(jnp.abs(boxes)), 0.0)
                bx = jax.lax.stop_gradient(x[2] + keep)
                bv = x[3]
            else:
                bx = jax.lax.stop_gradient(boxes[:, :self.max_boxes])
                bv = clean_valid[:, :self.max_boxes]

            def loss_fn(trainables):
                scale, patch = trainables
                return self._loss_from_images(patch, scale, imgs, bx, bv, ke,
                                              det_variables,
                                              tv_weight=1e-5 / k)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                (state.scale, state.patch))
            gsum = jax.tree.map(jnp.add, gsum, grads)
            lsum = lsum + loss
            sl_sum = sl_sum + jnp.sum(aux["scale_losses"])
            s_sum = s_sum + jnp.sum(aux["max_scores"])
            s_sq = s_sq + jnp.sum(aux["max_scores"] ** 2)
            nc, nv = self._clamp_frac(bx, bv, state.scale)
            c_sum = c_sum + nc
            v_sum = v_sum + nv
            if with_asr:
                _, adv_s, adv_v = self._nms(aux["adv_boxes"],
                                            aux["adv_masked"])
                n_clean = n_clean + jnp.sum(
                    (clean_scores >= asr_thresh) & clean_valid
                ).astype(jnp.float32)
                n_adv = n_adv + jnp.sum(
                    (adv_s >= asr_thresh) & adv_v).astype(jnp.float32)
            return (gsum, lsum, sl_sum, s_sum, s_sq, n_clean, n_adv,
                    c_sum, v_sum), None

        zero = jnp.zeros((), jnp.float32)
        zeros_g = jax.tree.map(jnp.zeros_like, (state.scale, state.patch))
        ((gsum, loss, sl_sum, s_sum, s_sq, n_clean, n_adv, c_sum, v_sum),
         _) = jax.lax.scan(
            body, (zeros_g, zero, zero, zero, zero, zero, zero, zero, zero),
            xs)

        updates, opt_state = self.tx.update(gsum, state.opt_state,
                                            (state.scale, state.patch))
        scale, patch = optax.apply_updates((state.scale, state.patch),
                                           updates)
        patch = jnp.clip(patch, -1.0, 1.0)
        scale = jnp.clip(scale, 0.0, 1.0)

        mean = s_sum / b
        std = jnp.sqrt(jnp.maximum(s_sq / b - mean ** 2, 0.0))
        asr = (1.0 - n_adv / (n_clean + 1e-7) if with_asr
               else jnp.asarray(jnp.nan))
        metrics = StepMetrics(
            loss=loss, scale=scale, scale_loss=sl_sum,
            tv_loss=eot.total_variation(state.patch),
            mean_max_score=mean, std_max_score=std, asr=asr,
            asr_to_scale=asr / (scale + 1e-7),
            eot_clamp_frac=c_sum / jnp.maximum(v_sum, 1.0))
        return AttackState(patch, scale, opt_state, state.step + 1,
                           k_next), metrics

    def eval_step(self, state: AttackState, images: jnp.ndarray,
                  batch_idx: jnp.ndarray | int = 0,
                  det_variables=None) -> StepMetrics:
        """One validation batch. `batch_idx` decorrelates EOT randomness
        across the val batches of an epoch (the state key is not advanced
        during eval)."""
        k_eot = jax.random.fold_in(state.key, batch_idx)
        boxes, clean_scores, clean_valid = self.first_pass(images,
                                                           det_variables)
        boxes = boxes[:, :self.max_boxes]
        boxes_valid = clean_valid[:, :self.max_boxes]
        loss, aux = self._loss_from_images(state.patch, state.scale, images,
                                           boxes, boxes_valid, k_eot,
                                           det_variables)
        return self._metrics(loss, state.scale, aux, clean_scores,
                             clean_valid,
                             clamp=self._clamp_frac(boxes, boxes_valid,
                                                    state.scale))

    def _metrics(self, loss, scale, aux, clean_scores, clean_valid,
                 with_asr: bool = True, clamp=None) -> StepMetrics:
        if with_asr:
            _, adv_nms_scores, adv_nms_valid = self._nms(aux["adv_boxes"],
                                                         aux["adv_masked"])
            asr = self.calc_asr(clean_scores, clean_valid, adv_nms_scores,
                                adv_nms_valid)
        else:
            asr = jnp.asarray(jnp.nan)
        if clamp is None:
            clamp_frac = jnp.asarray(jnp.nan)
        else:
            clamp_frac = clamp[0] / jnp.maximum(clamp[1], 1.0)
        return StepMetrics(
            loss=loss,
            scale=scale,
            scale_loss=jnp.sum(aux["scale_losses"]),
            tv_loss=aux["tv"],
            mean_max_score=jnp.mean(aux["max_scores"]),
            std_max_score=jnp.std(aux["max_scores"]),
            asr=asr,
            asr_to_scale=asr / (scale + 1e-7),
            eot_clamp_frac=clamp_frac,
        )

    def asr_curve(self, state: AttackState, images: jnp.ndarray,
                  thresholds, batch_idx: jnp.ndarray | int = 0,
                  det_variables=None) -> jnp.ndarray:
        """ASR at a vector of score thresholds (attacker.py:66-67,277-283);
        run rarely, host-side plotting consumes the result."""
        k_eot = jax.random.fold_in(state.key, batch_idx)
        boxes, clean_scores, clean_valid = self.first_pass(images,
                                                           det_variables)
        patched, _ = eot.apply_patches(
            k_eot, images, boxes[:, :self.max_boxes],
            clean_valid[:, :self.max_boxes], state.patch, state.scale,
            tolerance=self.tolerance, window=self.window,
            use_histogram_match=self.use_histogram_match,
            **self.eot_overrides)
        adv_boxes, adv_masked = self.second_pass_scores(patched, det_variables)
        _, adv_scores, adv_valid = self._nms(adv_boxes, adv_masked)

        def one(t):
            return self.calc_asr(clean_scores, clean_valid, adv_scores,
                                 adv_valid, t)
        return jax.vmap(one)(jnp.asarray(thresholds))
