"""Self-supervised patch-attack defender training core.

Behavioral parity with reference attack_detection.py:30-318
(`PatchAttackDefender`):
  - clean pass through the FROZEN protege detector -> person boxes
    (attack_detection.py:94-127; layers frozen at 46-47)
  - Masker plants patches and emits targets (429-430)
  - updates = 2 * antipatch(images); loss = sum_b mean((targets - updates)^2)
    (attack_detection.py:190-193)
  - eval mode: the real adversarial patch is planted, and a second detector
    pass at score_thresh 0 measures deterioration (186-187)

TPU-first: one jitted train step; the U-Net's params/batch-stats are the
only trainables; the detector graph is shared with the attack module.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.efficientdet import EfficientDetNet, spec_from_config
from ..models.unet import PatchNeutralizer
from ..ops import nms as nms_ops
from ..ops import postprocess
from . import masker as masker_lib
from ..attack.attacker import filter_valid_boxes, NEG_INF


class DefenderState(NamedTuple):
    params: Any          # U-Net params
    batch_stats: Any     # U-Net BN stats
    opt_state: Any
    step: jnp.ndarray
    key: jax.Array


class DefenderMetrics(NamedTuple):
    loss: jnp.ndarray
    # mean clean/adv/recovered detection scores for observability
    mean_clean_score: jnp.ndarray
    mean_adv_score: jnp.ndarray
    # eval-only north-star metrics (NaN on train steps):
    # recovery_psnr: PSNR (dB) of recover(patched) vs the clean image over
    #   the patched region — quantifies background reconstruction (the
    #   reference's whole defense story, demo.py:137-199, demo_v2.py:151-169)
    # adr: attack-detection rate — fraction of patched images whose mean
    #   person score RECOVERS by > 10 points after defender action, the
    #   reference demo's detection rule (demo_v2.py:115-148, demo.py:157)
    recovery_psnr: jnp.ndarray
    adr: jnp.ndarray


class PatchAttackDefender:
    """Factory for jitted defender train/eval steps."""

    def __init__(self, config, det_variables, *, eval_patch=None,
                 eval_scale: float = 0.4, learning_rate: float = 1e-2,
                 n_filters: int = 8, grad_accum: int = 1,
                 packed: bool = False, packed_entry: int = 0):
        self.config = config
        self.spec = spec_from_config(config)
        # packed_entry: frozen-protege entry stages in the space-to-depth
        # packed layout (models/efficientnet_packed.py)
        self.net = EfficientDetNet(self.spec, packed_entry=packed_entry)
        self.det_variables = det_variables
        unet_dtype = (jnp.bfloat16 if config.get("mixed_precision")
                      else None)
        # packed: same U-Net, space-to-depth lane-packed layout for the
        # high-resolution stages (models/unet_packed.py) — identical
        # variable pytree, so checkpoints interop with the unpacked
        # module. True -> packing depth 1 (the 640px stages); 2 or 3
        # pack the 320px / 160px stages too (see PackedPatchNeutralizer).
        if packed:
            from ..models.unet_packed import PackedPatchNeutralizer
            levels = 1 if packed is True else int(packed)
            self.unet = PackedPatchNeutralizer(n_filters=n_filters,
                                               dtype=unet_dtype,
                                               packed_levels=levels)
        else:
            self.unet = PatchNeutralizer(n_filters=n_filters,
                                         dtype=unet_dtype)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate)
        self.max_boxes = int(config.get("max_boxes_per_image", 16) or 16)
        self.image_hw = self.spec.image_size
        nms_cfg = config.nms_configs
        self.nms_kwargs = postprocess.nms_kwargs_from_config(nms_cfg)
        self.pre_nms_topk = int(nms_cfg.get("pre_nms_topk") or 1024)
        self.score_thresh = float(nms_cfg.get("score_thresh") or 0.0)
        self._params_dict = config.as_dict()
        self.eval_patch = (jnp.asarray(eval_patch, jnp.float32)
                           if eval_patch is not None else None)
        self.eval_scale = eval_scale
        # grad_accum > 1: train_step splits its batch into that many
        # sequential microbatches (lax.scan) — detector pass, Masker and
        # U-Net fwd+bwd all run at microbatch size, then ONE adam update
        # applies the SUMMED gradients (the loss is a sum over images, so
        # summed micro-gradients ARE the full-batch gradient up to the
        # U-Net's per-microbatch BN statistics). The memory lever for
        # training the 640px U-Net at large effective batch.
        self.grad_accum = int(grad_accum)
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def init_state(self, key: jax.Array) -> DefenderState:
        k_init, k_state = jax.random.split(key)
        dummy = jnp.zeros((1, *self.image_hw, 3), jnp.float32)
        variables = self.unet.init({"params": k_init}, dummy, False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return DefenderState(params, batch_stats, self.tx.init(params),
                             jnp.asarray(0, jnp.int32), k_state)

    # -- detector pass (attack_detection.py:94-127) -----------------------
    # `det_variables` threads the frozen protege weights as a traced
    # argument; when None they are closure-captured and embed as HLO
    # constants in the compiled program (see attack/attacker.py note).
    # Drivers pass them explicitly.
    def odet_boxes(self, images: jnp.ndarray, score_thresh=None,
                   det_variables=None):
        """Person boxes after NMS; returns ([B,M,4], scores [B,M], valid)."""
        dv = self.det_variables if det_variables is None else det_variables
        cls_out, box_out = self.net.apply(dv, images, False)
        boxes, scores, classes = postprocess.pre_nms(self._params_dict,
                                                     cls_out, box_out)
        person = classes == 0
        masked = jnp.where(person, scores, NEG_INF)
        k = min(self.pre_nms_topk, masked.shape[1])
        top_scores, top_idx = jax.lax.top_k(masked, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        kw = dict(self.nms_kwargs)
        if score_thresh is not None:
            kw["score_thresh"] = score_thresh
        res = nms_ops.batched_nms_auto(top_boxes, top_scores, **kw)
        nms_boxes = postprocess.clip_boxes(res.boxes, self.image_hw)
        # post-NMS validity filter (attack_detection.py:123-127)
        cond = filter_valid_boxes(
            res.scores, nms_boxes, jnp.zeros_like(res.scores, jnp.int32),
            self.image_hw,
            self.score_thresh if score_thresh is None else score_thresh)
        valid = res.valid & cond
        return nms_boxes, res.scores, valid

    # -- loss --------------------------------------------------------------
    def _unet_apply(self, params, batch_stats, images, training: bool,
                    dropout_key=None):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": dropout_key} if dropout_key is not None else None
        if training:
            out, mutated = self.unet.apply(
                variables, images, True, rngs=rngs, mutable=["batch_stats"])
            return out, mutated["batch_stats"]
        return self.unet.apply(variables, images, False), batch_stats

    def train_step(self, state: DefenderState, images: jnp.ndarray,
                   with_adv_scores: bool = False, det_variables=None
                   ) -> Tuple[DefenderState, DefenderMetrics]:
        """One train step. `with_adv_scores` (static) additionally runs the
        detector over the masker-patched images at score_thresh 0 so the
        training-time score-distribution logging has real adv scores
        (attack_detection.py:208-237 logs these every visualize freq);
        off by default — it costs a full extra detector pass."""
        k_mask, k_drop, k_next = jax.random.split(state.key, 3)
        if self.grad_accum > 1:
            return self._train_step_accum(state, images, k_mask, k_drop,
                                          k_next, with_adv_scores,
                                          det_variables)
        boxes, clean_scores, clean_valid = self.odet_boxes(
            images, det_variables=det_variables)
        boxes = boxes[:, :self.max_boxes]
        boxes_valid = clean_valid[:, :self.max_boxes]

        patched, targets = masker_lib.apply_masker(
            k_mask, images, boxes, boxes_valid, training=True)
        b = images.shape[0]
        flat_targets = targets.reshape(b, -1)

        def loss_fn(params):
            updates, new_stats = self._unet_apply(
                params, state.batch_stats, patched, True, k_drop)
            flat_updates = (2.0 * updates).reshape(b, -1)
            loss = jnp.sum(jnp.mean((flat_targets - flat_updates) ** 2, axis=1))
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        mean_clean = _masked_mean(clean_scores, clean_valid)
        if with_adv_scores:
            _, adv_scores, adv_valid = self.odet_boxes(
                patched, score_thresh=0.0, det_variables=det_variables)
            mean_adv = _masked_mean(adv_scores, adv_valid)
        else:
            mean_adv = jnp.asarray(0.0)
        metrics = DefenderMetrics(loss, mean_clean, mean_adv,
                                  jnp.asarray(jnp.nan), jnp.asarray(jnp.nan))
        return DefenderState(params, new_stats, opt_state, state.step + 1,
                             k_next), metrics

    def _train_step_accum(self, state: DefenderState, images, k_mask, k_drop,
                          k_next, with_adv_scores: bool, det_variables):
        """Gradient-accumulation train step (mirrors the k=1 body above):
        lax.scan over `grad_accum` microbatches, each with its own
        fold_in'd Masker/dropout keys, gradients SUMMED (the loss is a sum
        over images), one adam update. Score means accumulate as
        numerator/denominator pairs so the metric matches the full batch."""
        k = self.grad_accum
        b = images.shape[0]
        if b % k != 0:
            raise ValueError(f"batch {b} not divisible by grad_accum={k}")
        micro = images.reshape(k, b // k, *images.shape[1:])

        def body(carry, xs):
            stats, gsum, lsum, num_c, den_c, num_a, den_a = carry
            i, imgs = xs
            km = jax.random.fold_in(k_mask, i)
            kd = jax.random.fold_in(k_drop, i)
            boxes, clean_scores, clean_valid = self.odet_boxes(
                imgs, det_variables=det_variables)
            boxes_m = boxes[:, :self.max_boxes]
            boxes_valid = clean_valid[:, :self.max_boxes]
            patched, targets = masker_lib.apply_masker(
                km, imgs, boxes_m, boxes_valid, training=True)
            mb = imgs.shape[0]
            flat_targets = targets.reshape(mb, -1)

            def loss_fn(params):
                updates, new_stats = self._unet_apply(
                    params, stats, patched, True, kd)
                flat_updates = (2.0 * updates).reshape(mb, -1)
                loss = jnp.sum(
                    jnp.mean((flat_targets - flat_updates) ** 2, axis=1))
                return loss, new_stats

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            cm = clean_valid.astype(clean_scores.dtype)
            num_c = num_c + jnp.sum(clean_scores * cm)
            den_c = den_c + jnp.sum(cm)
            if with_adv_scores:
                _, adv_scores, adv_valid = self.odet_boxes(
                    patched, score_thresh=0.0, det_variables=det_variables)
                am = adv_valid.astype(adv_scores.dtype)
                num_a = num_a + jnp.sum(adv_scores * am)
                den_a = den_a + jnp.sum(am)
            return (stats, gsum, lsum + loss, num_c, den_c,
                    num_a, den_a), None

        zero = jnp.zeros((), jnp.float32)
        zeros_g = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, gsum, loss, num_c, den_c, num_a, den_a), _ = jax.lax.scan(
            body,
            (state.batch_stats, zeros_g, zero, zero, zero, zero, zero),
            (jnp.arange(k), micro))

        updates, opt_state = self.tx.update(gsum, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        mean_clean = num_c / (den_c + 1e-7)
        mean_adv = (num_a / (den_a + 1e-7) if with_adv_scores
                    else jnp.asarray(0.0))
        metrics = DefenderMetrics(loss, mean_clean, mean_adv,
                                  jnp.asarray(jnp.nan), jnp.asarray(jnp.nan))
        return DefenderState(params, new_stats, opt_state, state.step + 1,
                             k_next), metrics

    def eval_step(self, state: DefenderState, images: jnp.ndarray,
                  batch_idx: jnp.ndarray | int = 0,
                  det_variables=None) -> DefenderMetrics:
        """Eval: plant the real adversarial patch, measure recovery loss
        (attack_detection.py:168-206, training=False branch). `batch_idx`
        decorrelates masker randomness across an epoch's val batches."""
        assert self.eval_patch is not None
        k_mask = jax.random.fold_in(state.key, batch_idx)
        boxes, clean_scores, valid = self.odet_boxes(
            images, det_variables=det_variables)
        boxes = boxes[:, :self.max_boxes]
        boxes_valid = valid[:, :self.max_boxes]
        patched, targets, region = masker_lib.apply_masker(
            k_mask, images, boxes, boxes_valid, training=False,
            adv_patch=self.eval_patch, adv_scale=self.eval_scale,
            return_region=True)
        # second detector pass at score_thresh 0 (attack_detection.py:186-187)
        _, adv_scores, adv_valid = self.odet_boxes(
            patched, score_thresh=0.0, det_variables=det_variables)

        updates, _ = self._unet_apply(state.params, state.batch_stats,
                                      patched, False)
        b = images.shape[0]
        flat_targets = targets.reshape(b, -1)
        flat_updates = (2.0 * updates).reshape(b, -1)
        loss = jnp.sum(jnp.mean((flat_targets - flat_updates) ** 2, axis=1))

        # -- north-star metrics over the recovered images -----------------
        # recover() = clip(patched + 2*updates) (demo_v2.py:151-169)
        recovered = jnp.clip(patched + 2.0 * updates, -1.0, 1.0)
        _, rec_scores, rec_valid = self.odet_boxes(
            recovered, score_thresh=0.0, det_variables=det_variables)

        # PSNR of the recovered background inside the patched region vs
        # the clean image. Images live in [-1,1] (range 2.0), so
        # 10*log10(range^2/mse) equals PSNR computed on 0-255 pixels.
        reg = region.astype(jnp.float32)[..., None]            # [B,H,W,1]
        se = jnp.sum(((recovered - images) ** 2) * reg, axis=(1, 2, 3))
        n_px = jnp.sum(reg, axis=(1, 2, 3)) * 3.0              # [B]
        has_region = n_px > 0
        mse = se / jnp.maximum(n_px, 1.0)
        psnr_i = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))
        n_reg = jnp.sum(has_region)
        recovery_psnr = jnp.where(
            n_reg > 0,
            jnp.sum(jnp.where(has_region, psnr_i, 0.0)) /
            jnp.maximum(n_reg, 1),
            jnp.nan)

        # attack-detection rate — the demo's exact rule (demo_v2.py:28,
        # 48-55, 136-141): per-image score = MAX detection score after a
        # .55 threshold filter (0 if none); an attack counts as detected
        # when the clean image was confidently detected (clean > .55) and
        # defender action recovers the score by > 10 points.
        def max_above(scores, valid, thresh=0.55):
            s = jnp.where(valid & (scores >= thresh), scores, 0.0)
            return jnp.max(s, axis=1)                          # [B]

        clean_i = max_above(clean_scores, valid)
        adv_i = max_above(adv_scores, adv_valid)
        rec_i = max_above(rec_scores, rec_valid)
        eligible = (clean_i > 0.55) & has_region
        detected = (rec_i - adv_i) > 0.10
        n_elig = jnp.sum(eligible)
        adr = jnp.where(
            n_elig > 0,
            jnp.sum(jnp.where(eligible, detected.astype(jnp.float32), 0.0))
            / jnp.maximum(n_elig, 1),
            jnp.nan)

        return DefenderMetrics(
            loss,
            _masked_mean(clean_scores, valid),
            _masked_mean(adv_scores, adv_valid),
            recovery_psnr,
            adr)

    def recover(self, state: DefenderState, images: jnp.ndarray) -> jnp.ndarray:
        """Neutralize patches: clip(image + 2*unet(image)) (demo_v2.py:151-169,
        attack_detection vis at 262)."""
        updates, _ = self._unet_apply(state.params, state.batch_stats,
                                      images, False)
        return jnp.clip(images + 2.0 * updates, -1.0, 1.0)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + 1e-7)
