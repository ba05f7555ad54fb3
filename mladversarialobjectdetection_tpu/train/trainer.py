"""Supervised EfficientDet trainer (the vendored automl trainer's role).

Behavioral parity with reference tf2/train_lib.py:467-729
(`EfficientDetNetTrain`): focal + huber losses over anchor labels, l2
weight decay on kernels, gradient clipping, parameter EMA
(moving_average_decay .9998), BN statistics updates, data-parallel over
the mesh (the TPUStrategy replacement, tf2/train.py:174-200).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.efficientdet import EfficientDetNet, spec_from_config
from ..ops.anchors import Anchors
from . import labeler as labeler_lib
from . import losses as losses_lib
from . import schedules


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


class DetectorTrainer:
    """Factory for the jitted supervised train step."""

    def __init__(self, config, *, steps_per_epoch: int = 1000,
                 bn_axis_name: str | None = None, grad_accum: int = 1):
        self.config = config
        self.spec = spec_from_config(config)
        self.net = EfficientDetNet(self.spec, bn_axis_name=bn_axis_name)
        self.anchors = Anchors.from_config(config)
        self.tx = schedules.make_optimizer(config, steps_per_epoch)
        self.ema_decay = float(config.get("moving_average_decay", 0.9998) or 0)
        self.num_classes = config.num_classes
        self.num_anchors = self.spec.num_anchors
        # grad_accum > 1 splits each train_step batch into that many
        # sequential microbatches (lax.scan) and applies ONE optimizer
        # update with the mean of the microbatch gradients: activation
        # memory scales with batch/grad_accum, enabling large effective
        # batches for the 1024-1536px variants on few chips. BN batch
        # statistics are computed per microbatch (ghost batch norm) and
        # the running stats advance once per microbatch.
        self.grad_accum = int(grad_accum)
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def init_state(self, key: jax.Array) -> TrainState:
        x = jnp.zeros((1, *self.spec.image_size, 3))
        variables = self.net.init({"params": key}, x, True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # distinct buffers for the EMA copy: aliasing `params` here makes
        # the donated train-step state contain the same buffer twice, which
        # XLA rejects ("attempt to donate the same buffer twice")
        ema = jax.tree.map(jnp.copy, params)
        return TrainState(params, batch_stats, ema,
                          self.tx.init(params), jnp.asarray(0, jnp.int32))

    def _labels(self, gt_boxes, gt_classes, gt_valid):
        anchor_boxes = jnp.asarray(self.anchors.boxes)
        return jax.vmap(
            lambda b, c, v: labeler_lib.label_anchors(anchor_boxes, b, c, v)
        )(gt_boxes, gt_classes, gt_valid)

    def train_step(self, state: TrainState, images, gt_boxes, gt_classes,
                   gt_valid) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One SPMD supervised step.

        images [B,H,W,3]; gt_boxes [B,G,4]; gt_classes [B,G] int32 (0-based
        model classes); gt_valid [B,G] bool.
        """
        labels = self._labels(gt_boxes, gt_classes, gt_valid)

        def loss_fn(params, batch_stats, imgs, lbls):
            variables = {"params": params, "batch_stats": batch_stats}
            (cls_out, box_out), mutated = self.net.apply(
                variables, imgs, True, mutable=["batch_stats"])
            det_loss, parts = losses_lib.detection_loss(
                cls_out, box_out, lbls,
                num_classes=self.num_classes, num_anchors=self.num_anchors,
                alpha=self.config.alpha, gamma=self.config.gamma,
                delta=self.config.delta,
                box_loss_weight=self.config.box_loss_weight,
                label_smoothing=self.config.label_smoothing,
                anchor_boxes=jnp.asarray(self.anchors.boxes),
                iou_loss_type=self.config.get("iou_loss_type"),
                iou_loss_weight=float(
                    self.config.get("iou_loss_weight") or 1.0))
            reg = losses_lib.l2_regularization(params,
                                               self.config.weight_decay)
            return det_loss + reg, (parts, mutated["batch_stats"], reg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if self.grad_accum > 1:
            # sequential microbatches under lax.scan: one loss+grad graph
            # compiled once, activation memory = one microbatch; grads are
            # averaged (each microbatch loss is normalized by its own
            # positives — ghost-batch semantics), ONE optimizer/EMA update
            k = self.grad_accum
            b = images.shape[0]
            if b % k != 0:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum={k}")

            def resh(x):
                return x.reshape(k, b // k, *x.shape[1:])

            micro = jax.tree.map(resh, (images, labels))

            def body(carry, xs):
                stats, gsum, lsum, rsum, psum = carry
                imgs, lbls = xs
                (l, (parts, stats, reg)), g = grad_fn(
                    state.params, stats, imgs, lbls)
                gsum = jax.tree.map(jnp.add, gsum, g)
                psum = jax.tree.map(jnp.add, psum, parts)
                return (stats, gsum, lsum + l, rsum + reg, psum), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            # abstract trace of one microbatch yields the parts structure
            first = jax.tree.map(lambda x: x[0], micro)
            _, (parts_shape, _, _) = jax.eval_shape(
                loss_fn, state.params, state.batch_stats, *first)
            zeros_p = jax.tree.map(
                lambda a: jnp.zeros(a.shape, a.dtype), parts_shape)
            zero = jnp.zeros((), jnp.float32)
            (new_stats, gsum, lsum, rsum, psum), _ = jax.lax.scan(
                body, (state.batch_stats, zeros_g, zero, zero, zeros_p),
                micro)
            inv = 1.0 / k
            grads = jax.tree.map(lambda g: g * inv, gsum)
            loss, reg = lsum * inv, rsum * inv
            parts = jax.tree.map(lambda p: p * inv, psum)
        else:
            (loss, (parts, new_stats, reg)), grads = grad_fn(
                state.params, state.batch_stats, images, labels)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        if self.ema_decay:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                               state.ema_params, params)
        else:
            ema = params
        metrics = {"loss": loss, "det_loss": loss - reg, "reg_loss": reg,
                   **parts}
        return TrainState(params, new_stats, ema, opt_state,
                          state.step + 1), metrics

    def eval_variables(self, state: TrainState, use_ema: bool = True):
        """Inference variables (EMA by default, matching restore_ckpt w/
        moving_average_decay)."""
        params = state.ema_params if use_ema else state.params
        return {"params": params, "batch_stats": state.batch_stats}
