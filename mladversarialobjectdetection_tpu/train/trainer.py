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
                 bn_axis_name: str | None = None):
        self.config = config
        self.spec = spec_from_config(config)
        self.net = EfficientDetNet(self.spec, bn_axis_name=bn_axis_name)
        self.anchors = Anchors.from_config(config)
        self.tx = schedules.make_optimizer(config, steps_per_epoch)
        self.ema_decay = float(config.get("moving_average_decay", 0.9998) or 0)
        self.num_classes = config.num_classes
        self.num_anchors = self.spec.num_anchors

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

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (cls_out, box_out), mutated = self.net.apply(
                variables, images, True, mutable=["batch_stats"])
            det_loss, parts = losses_lib.detection_loss(
                cls_out, box_out, labels,
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

        (loss, (parts, new_stats, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
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
