"""Semantic-segmentation training (reference tf2/segmentation.py analog).

The reference ships a demo script that trains the EfficientDet
SegmentationHead on oxford_iiit_pet via tfds (tf2/segmentation.py:60-97:
``config.heads = ['segmentation']``, SparseCategoricalCrossentropy from
logits, accuracy metric, adam, masks resized to the head's output
resolution). This module is the TPU-first equivalent: a jitted SPMD train
step over the data mesh, and — since this environment has no tfds/network
— a deterministic synthetic dataset with pet-style 3-class masks
(background / object / object-border) whose labels are a pure function of
the image, so the task is learnable end to end.

Masks are consumed at the head's native output resolution (half the
min_level stride: 512 input -> 128×128, exactly the reference demo's
``tf.image.resize(mask, (128, 128))`` at tf2/segmentation.py:39).
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Iterator, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as config_lib
from ..ckpt import io as ckpt_io
from ..data import pipeline
from ..models.efficientdet import EfficientDetNet, spec_from_config
from ..parallel import (is_main_process, local_batch_size,
                        make_mesh_for_batch, replicate, shard_batch_auto)
from ..utils.log import get_logger
from ..utils.train_loop import MetricLogger, Throughput

logger = get_logger(__name__)


def output_size(image_size: int, min_level: int) -> int:
    """Segmentation-logit resolution for a square input.

    The pyramid follows the (s-1)//2+1 chain (automl utils.py:509-526) down
    to min_level, and the head's final stride-2 transpose doubles it
    (efficientdet_keras.py:682-697).
    """
    s = image_size
    for _ in range(min_level):
        s = (s - 1) // 2 + 1
    return s * 2


def synthetic_seg_batches(batch_size: int, image_size: int, mask_size: int,
                          *, seed: int = 0,
                          num_objects: int = 3) -> Iterator[Dict[str, Any]]:
    """Deterministic (image, mask) stream with 3 classes.

    Class 0 = background, 1 = object interior, 2 = object border — the
    oxford_iiit_pet label structure the reference demo trains on. Objects
    are axis-aligned bright rectangles over a dark textured background, so
    the mask is exactly recoverable from local image evidence.
    """
    rng = np.random.default_rng(seed)
    border = max(2, image_size // 32)
    while True:
        imgs = rng.normal(-0.8, 0.08,
                          (batch_size, image_size, image_size, 3))
        masks = np.zeros((batch_size, image_size, image_size), np.int32)
        for b in range(batch_size):
            for _ in range(int(rng.integers(1, num_objects + 1))):
                h = int(rng.integers(image_size // 4, image_size // 2))
                w = int(rng.integers(image_size // 4, image_size // 2))
                y = int(rng.integers(0, image_size - h))
                x = int(rng.integers(0, image_size - w))
                color = rng.uniform(0.4, 0.9, (3,))
                imgs[b, y:y + h, x:x + w] = color + rng.normal(
                    0, 0.05, (h, w, 3))
                masks[b, y:y + h, x:x + w] = 2  # border ring...
                yi, xi = y + border, x + border
                masks[b, yi:y + h - border, xi:x + w - border] = 1  # interior
        # nearest-neighbor downsample to the logits grid (the reference
        # resizes masks with tf.image.resize default bilinear then trains
        # sparse CE on the float-rounded ids; nearest keeps ids exact)
        idx = (np.arange(mask_size) * (image_size / mask_size)).astype(int)
        masks = masks[:, idx][:, :, idx]
        yield {"images": np.clip(imgs, -1, 1).astype(np.float32),
               "masks": masks}


class SegTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class SegmentationTrainer:
    """Jitted train/eval steps for a segmentation-headed EfficientDet."""

    def __init__(self, config, *, learning_rate: float = 1e-3,
                 bn_axis_name: str | None = None):
        config = config_lib.Config(config.as_dict()) if hasattr(
            config, "as_dict") else config
        config.heads = ["segmentation"]
        self.config = config
        self.spec = spec_from_config(config)
        self.net = EfficientDetNet(self.spec, bn_axis_name=bn_axis_name)
        # reference compiles with optimizer='adam' (tf2/segmentation.py:79),
        # i.e. keras Adam at its 1e-3 default
        self.tx = optax.adam(learning_rate)
        self.num_classes = self.spec.seg_num_classes

    def init_state(self, key: jax.Array) -> SegTrainState:
        x = jnp.zeros((1, *self.spec.image_size, 3))
        variables = self.net.init({"params": key}, x, True)
        return SegTrainState(variables["params"],
                             variables.get("batch_stats", {}),
                             self.tx.init(variables["params"]),
                             jnp.asarray(0, jnp.int32))

    def _loss(self, logits, masks):
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, masks)
        acc = (jnp.argmax(logits, -1) == masks).mean()
        return ce.mean(), acc

    def train_step(self, state: SegTrainState, images, masks
                   ) -> Tuple[SegTrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (seg,), mutated = self.net.apply(variables, images, True,
                                             mutable=["batch_stats"])
            loss, acc = self._loss(seg, masks)
            return loss, (acc, mutated["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (SegTrainState(params, new_stats, opt_state, state.step + 1),
                {"loss": loss, "accuracy": acc})

    def eval_step(self, state: SegTrainState, images, masks):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        (seg,) = self.net.apply(variables, images, False)
        loss, acc = self._loss(seg, masks)
        return {"val_loss": loss, "val_accuracy": acc}

    def predict_mask(self, state: SegTrainState, images):
        """Class-id mask for a batch (reference create_mask,
        tf2/segmentation.py:25-28)."""
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        (seg,) = self.net.apply(variables, images, False)
        return jnp.argmax(seg, -1)


def train(model_name: str = "efficientdet-d0", *, image_size: int = 128,
          batch_size: int = 8, steps: int = 200, log_every: int = 50,
          learning_rate: float = 1e-3, model_dir: str | None = None,
          seed: int = 0, config_override=None):
    config = config_lib.get_efficientdet_config(model_name)
    config.image_size = image_size
    if config_override:
        config.update(config_override)

    mesh = make_mesh_for_batch(batch_size)
    trainer = SegmentationTrainer(config, learning_rate=learning_rate)
    state = replicate(mesh, trainer.init_state(jax.random.PRNGKey(seed)))
    train_step = jax.jit(trainer.train_step, donate_argnums=0)
    eval_step = jax.jit(trainer.eval_step)

    mask_size = output_size(image_size, config.min_level)
    # multi-host: per-process slice + globally-sharded assembly (see
    # parallel.shard_batch_auto); single-host this is the plain device_put
    local_bs = local_batch_size(batch_size)
    pseed = seed + 1000 * jax.process_index()
    batches = pipeline.prefetch(
        synthetic_seg_batches(local_bs, image_size, mask_size, seed=pseed),
        device_put_fn=lambda b: shard_batch_auto(mesh, b))
    val_batch = next(synthetic_seg_batches(local_bs, image_size, mask_size,
                                           seed=pseed + 1))

    mlog = MetricLogger(os.path.join(model_dir, "logs")) if model_dir else None
    thr = Throughput()
    thr.start()
    metrics = {}
    for step in range(1, steps + 1):
        batch = next(batches)
        state, metrics = train_step(state, batch["images"], batch["masks"])
        if step % log_every == 0 or step == steps:
            val = eval_step(state, val_batch["images"], val_batch["masks"])
            metrics = {k: float(v) for k, v in {**metrics, **val}.items()}
            thr.count(batch_size * log_every)
            logger.info(
                f"step {step}: loss={metrics['loss']:.4f} "
                f"acc={metrics['accuracy']:.3f} "
                f"val_acc={metrics['val_accuracy']:.3f} "
                f"({thr.rate():.1f} img/s)")
            if mlog:
                mlog.log(step, metrics, prefix="seg/")
    if model_dir and is_main_process():
        os.makedirs(model_dir, exist_ok=True)
        ckpt_io.save_pytree(
            os.path.join(model_dir, "segmentation"),
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)})
        if mlog:
            mlog.close()
    return state, metrics


def main():
    from ..utils.debug import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(
        description="segmentation training (tf2/segmentation.py analog)")
    p.add_argument("--model", default="efficientdet-d0")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--model-dir", default="seg_out")
    p.add_argument("--hparams", default=None,
                   help="config override 'k=v,...' or yaml path")
    a = p.parse_args()
    state, metrics = train(a.model, image_size=a.image_size,
                           batch_size=a.batch_size, steps=a.steps,
                           learning_rate=a.lr, model_dir=a.model_dir,
                           config_override=a.hparams)
    logger.info(f"final: {metrics}")


if __name__ == "__main__":
    main()
