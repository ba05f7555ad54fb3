"""Supervised EfficientDet training CLI.

Behavioral parity with reference tf2/train.py:151-307: TFRecord input,
strategy selection (here: the data-parallel mesh over all chips), cosine/
stepwise/polynomial LR, EMA, periodic COCO mAP evaluation (the COCOCallback
of train_lib.py:202-248) and checkpointing.

Usage:
    python -m mladversarialobjectdetection_tpu.train.train \
        --train-pattern 'data/train-*.tfrecord' --model efficientdet-d0
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from .. import config as config_lib
from ..ckpt import io as ckpt_io
from ..data import pipeline
from ..data.tfrecord import DetectionTFRecordReader
from ..parallel import (is_main_process, local_batch_size, make_train_mesh,
                        replicate, shard_batch_auto)
from ..utils.coco_metric import COCOEvaluator
from ..utils.log import get_logger
from ..utils.train_loop import MetricLogger, Throughput
from ..ops import postprocess
from .trainer import DetectorTrainer

logger = get_logger(__name__)


def evaluate_map(trainer: DetectorTrainer, state, batches, n_batches: int,
                 score_thresh: float = 0.05) -> dict:
    """COCO mAP over n_batches (COCOCallback parity)."""
    evaluator = COCOEvaluator()
    variables = trainer.eval_variables(state)
    params = trainer.config.as_dict()

    @jax.jit
    def infer(images):
        cls_out, box_out = trainer.net.apply(variables, images, False)
        return postprocess.postprocess_per_class(params, cls_out, box_out)

    for _ in range(n_batches):
        batch = next(batches)
        det = jax.tree.map(np.asarray, infer(batch["images"]))
        crowd = batch.get("is_crowd")
        for i in range(det.boxes.shape[0]):
            keep = det.valid[i] & (det.scores[i] >= score_thresh)
            gt_keep = batch["valid"][i]
            evaluator.add_image(
                det.boxes[i][keep], det.scores[i][keep],
                det.classes[i][keep].astype(int),
                batch["boxes"][i][gt_keep],
                batch["classes"][i][gt_keep] + postprocess.CLASS_OFFSET,
                gt_is_crowd=(crowd[i][gt_keep] if crowd is not None
                             else None))
    return evaluator.result()


def train(model_name: str = "efficientdet-d0", *,
          train_pattern: str | None = None, val_pattern: str | None = None,
          model_dir: str = "detector_out", batch_size: int = 8,
          num_epochs: int | None = None, steps_per_epoch: int = 1000,
          eval_batches: int = 50, map_freq: int = 5, image_size=None,
          seed: int = 0, resume: bool = False, config_override=None,
          prune_sparsity: float | None = None, prune_begin: int = 0,
          prune_end: int | None = None, spatial: int = 1,
          grad_accum: int = 1, pretrained_ckpt: str | None = None,
          finetune_mode: str = "backbone"):
    config = config_lib.get_efficientdet_config(model_name)
    if image_size is not None:
        config.image_size = image_size
    if num_epochs is not None:
        config.num_epochs = num_epochs
    if config_override:
        # --hparams equivalent (reference tf2/train.py flag): dict or
        # 'key=value,key=value' string / yaml path via Config.update
        config.update(config_override)

    # spatially-partitioned training (spatial > 1): image rows shard over
    # 'spatial' (GSPMD halo-exchange convs + cross-spatial BN collectives)
    # — the memory lever for the 1024-1536px variants, where per-chip
    # activation footprint, not batch, binds. shard_batch routes the
    # image leaves onto the row sharding automatically.
    hw = (config.image_size if isinstance(config.image_size, int)
          else config.image_size[0])
    mesh = make_train_mesh(batch_size, spatial, hw)
    trainer = DetectorTrainer(config, steps_per_epoch=steps_per_epoch,
                              bn_axis_name=None, grad_accum=grad_accum)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    start_epoch = 0
    latest = os.path.join(model_dir, "state-latest.msgpack")
    if resume and os.path.exists(latest):
        # resume-from-latest (tf2/train.py:247-252 parity)
        state = ckpt_io.load_state_bytes(latest, state)
        start_epoch = int(np.asarray(state.step)) // steps_per_epoch
        logger.info(f"resumed from {latest} at epoch {start_epoch}")
    elif pretrained_ckpt:
        # fine-tune init. NOTE a deliberate deviation: the reference
        # prefers latest_checkpoint(model_dir) UNCONDITIONALLY
        # (tf2/train.py:249-261 elif); here latest wins only with
        # --resume, so re-running into a populated model_dir without it
        # re-initializes from the pretrained ckpt — warn loudly.
        if os.path.exists(latest):
            logger.warning(
                f"{latest} exists but --resume was not given: "
                f"re-initializing from --pretrained-ckpt and OVERWRITING "
                f"the previous run's progress (the reference would resume "
                f"from latest here; pass --resume for that behavior)")
        # fine-tune modes:
        #   backbone: fresh heads (--pretrained_ckpt exclude_layers)
        #   trunk: fresh predict layers only (the TF-Hub variant analog,
        #          train_lib.py:732-766 — fine-tune to a new num_classes)
        from ..ckpt import finetune
        import jax.numpy as jnp
        variables = finetune.restore_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            pretrained_ckpt, config, trainer.spec, mode=finetune_mode)
        state = state._replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
            ema_params=jax.tree.map(jnp.copy, variables["params"]))
        logger.info(f"fine-tune init ({finetune_mode}) from "
                    f"{pretrained_ckpt}")
    elif os.path.exists(latest):
        logger.warning(
            f"{latest} exists but --resume was not given: training starts "
            f"from scratch (the reference resumes from latest_checkpoint "
            f"unconditionally, tf2/train.py:249-261; pass --resume)")
    state = replicate(mesh, state)
    train_step = jax.jit(trainer.train_step, donate_argnums=0)

    prune_fn = None
    if prune_sparsity:
        # prune-during-training (tf2/tfmot.py 'prune' method): re-mask
        # kernels by magnitude after each update, sparsity ramped by
        # tfmot's PolynomialDecay schedule
        from ..utils import sparsity as sparsity_lib
        sched = sparsity_lib.PolynomialDecaySchedule(
            final_sparsity=prune_sparsity, begin_step=prune_begin,
            end_step=(prune_end if prune_end is not None
                      else config.num_epochs * steps_per_epoch))
        pruner = sparsity_lib.MagnitudePruner(sched)

        @jax.jit
        def prune_fn(s):
            params = pruner.prune(s.params, s.step)
            # the EMA shadow follows the mask, so EMA-eval stays sparse
            ema = sparsity_lib.mask_like(params, s.ema_params)
            return s._replace(params=params, ema_params=ema)

    # multi-host input: every process loads its disjoint 1/process_count
    # slice of the data at batch_size/process_count and shard_batch_auto
    # assembles the slices into globally-sharded arrays; single-host this
    # is the plain full-batch device_put
    n_proc = jax.process_count()
    local_bs = local_batch_size(batch_size)
    shard = (jax.process_index(), n_proc) if n_proc > 1 else None
    if train_pattern:
        reader = DetectionTFRecordReader(
            train_pattern, image_size=config.image_size,
            mean_rgb=config.mean_rgb, stddev_rgb=config.stddev_rgb,
            max_instances=config.max_instances_per_image,
            seed=seed + jax.process_index(), shard=shard,
            autoaugment_policy=config.get("autoaugment_policy"))
        batches = reader.batches(local_bs)
    else:
        logger.warning("no --train-pattern: using synthetic batches")
        def synth():
            for img in pipeline.synthetic_batches(
                    local_bs, config.image_size,
                    seed=seed + 1000 * jax.process_index()):
                g = config.max_instances_per_image
                yield {"images": img,
                       "boxes": np.tile(np.array([[10, 10, 50, 50]],
                                                 np.float32),
                                        (local_bs, g, 1)),
                       "classes": np.zeros((local_bs, g), np.int32),
                       "valid": np.pad(np.ones((local_bs, 1), bool),
                                       ((0, 0), (0, g - 1)))}
        batches = synth()
    batches = pipeline.prefetch(
        batches, device_put_fn=lambda b: shard_batch_auto(mesh, b))

    os.makedirs(model_dir, exist_ok=True)
    mlog = MetricLogger(os.path.join(model_dir, "logs"))
    thr = Throughput()

    for epoch in range(start_epoch, config.num_epochs):
        thr.start()
        metrics = None
        for _ in range(steps_per_epoch):
            batch = next(batches)
            state, metrics = train_step(state, batch["images"],
                                        batch["boxes"], batch["classes"],
                                        batch["valid"])
            if prune_fn is not None:
                state = prune_fn(state)
            thr.count(batch_size)
        if prune_fn is not None:
            from ..utils.sparsity import sparsity_report
            metrics = dict(metrics)
            metrics["sparsity"] = sparsity_report(
                jax.device_get(state.params))["overall"]
        mlog.log(int(state.step),
                 {k: float(v) for k, v in metrics.items()}, prefix="train/")
        logger.info(f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
                    f"{thr.rate():.1f} img/s")
        if is_main_process():  # one writer on multi-host shared dirs
            ckpt_io.save_pytree(os.path.join(model_dir, f"ckpt-{epoch}"),
                                trainer.eval_variables(state))
            # full-state checkpoint for resume (incl. optimizer + EMA)
            ckpt_io.save_state_bytes(
                os.path.join(model_dir, "state-latest.msgpack"), state)
        if val_pattern and (epoch + 1) % map_freq == 0:
            # skip_crowd=False: crowds ride the batch as ignore regions
            # (COCOeval semantics), consistent with train/eval.py
            # multi-host: each process scores its own val shard (mAP over
            # eval_batches of the local slice; single-host = full set)
            val_reader = DetectionTFRecordReader(
                val_pattern, image_size=config.image_size,
                mean_rgb=config.mean_rgb, stddev_rgb=config.stddev_rgb,
                max_instances=config.max_instances_per_image, shuffle=False,
                skip_crowd=False, shard=shard)
            res = evaluate_map(trainer, state,
                               val_reader.batches(local_bs), eval_batches)
            mlog.log(int(state.step), res, prefix="eval/")
            logger.info(f"epoch {epoch}: {res}")
    mlog.close()
    return state


def main():
    from ..utils.debug import enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache across runs
    p = argparse.ArgumentParser(description="supervised detector training")
    p.add_argument("--model", default="efficientdet-d0")
    p.add_argument("--train-pattern", default=None)
    p.add_argument("--val-pattern", default=None)
    p.add_argument("--model-dir", default="detector_out")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from model_dir/state-latest.msgpack")
    p.add_argument("--hparams", default=None,
                   help="config override: 'k=v,k=v' string or yaml path "
                        "(reference tf2/train.py --hparams)")
    p.add_argument("--prune-sparsity", type=float, default=None,
                   help="magnitude-prune kernels during training to this "
                        "final sparsity (tf2/tfmot.py 'prune' method)")
    p.add_argument("--prune-begin", type=int, default=0)
    p.add_argument("--prune-end", type=int, default=None,
                   help="step at which the sparsity ramp ends "
                        "(default: last training step)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each image's rows over this many chips "
                        "(spatial model parallelism for the large "
                        "variants; must divide the device count and the "
                        "image height)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each step's batch into this many sequential "
                        "microbatches, one mean-gradient update per step "
                        "(activation memory ~ batch/grad_accum; BN stats "
                        "are per-microbatch ghost batches)")
    p.add_argument("--pretrained-ckpt", default=None,
                   help="fine-tune from this detector checkpoint (native "
                        "pytree, TF1 dir/prefix, or tarball; reference "
                        "tf2/train.py --pretrained_ckpt)")
    p.add_argument("--finetune-mode", default="backbone",
                   choices=("backbone", "trunk"),
                   help="backbone: fresh class/box heads (exclude_layers "
                        "parity, tf2/train.py:255-261); trunk: pretrained "
                        "head convs too, fresh predict layers only (the "
                        "TF-Hub fine-tune analog, train_lib.py:732-766)")
    a = p.parse_args()
    train(a.model, train_pattern=a.train_pattern, val_pattern=a.val_pattern,
          model_dir=a.model_dir, batch_size=a.batch_size,
          num_epochs=a.num_epochs, steps_per_epoch=a.steps_per_epoch,
          image_size=a.image_size, resume=a.resume,
          config_override=a.hparams, prune_sparsity=a.prune_sparsity,
          prune_begin=a.prune_begin, prune_end=a.prune_end,
          spatial=a.spatial, grad_accum=a.grad_accum,
          pretrained_ckpt=a.pretrained_ckpt, finetune_mode=a.finetune_mode)


if __name__ == "__main__":
    main()
