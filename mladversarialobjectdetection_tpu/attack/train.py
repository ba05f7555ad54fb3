"""Attack training driver (entry point).

Behavioral parity with reference attacker_train.py:20-76: victim =
efficientdet-lite4, NMS override iou .5 / score .5, Adam lr 1e-2, 500
epochs, batch 12, per-epoch artifacts in dirs named
`patch_{epoch}_{val_asr_to_scale:.4f}`, ReduceLROnPlateau(.5, min 1e-4,
patience 50) on val loss.

TPU-native: a data-parallel mesh (all visible chips), jitted SPMD train
step with donated state, host-side prefetch of the input pipeline.

Usage:
    python -m mladversarialobjectdetection_tpu.attack.train \
        --img-dir train_eval --epochs 500 --batch-size 12
    (falls back to synthetic data with --synthetic for smoke runs)
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from .. import config as config_lib
from ..ckpt import io as ckpt_io
from ..data import pipeline
from ..models.efficientdet import EfficientDetNet, spec_from_config
from ..parallel import (is_main_process, local_batch_size, make_train_mesh,
                        replicate, shard_batch_auto)
from ..utils.log import get_logger
from ..utils import train_loop as train_loop_lib
from ..utils.train_loop import MetricLogger, ReduceLROnPlateau, Throughput
from . import artifacts
from .attacker import PatchAttacker

logger = get_logger(__name__)


def get_victim_variables(config, ckpt_path=None, *, seed: int = 0):
    """Build (and optionally restore) the frozen victim detector variables.

    `ckpt_path` may be a native pytree checkpoint OR a reference TF1
    name-based checkpoint (dir or prefix — the downloaded GCS tarball);
    TF checkpoints are detected and converted on the fly (EMA shadows
    preferred, ckpt/convert_tf.py).

    Reference: util.get_victim_model (util.py:177-189) + restore_ckpt."""
    spec = spec_from_config(config)
    net = EfficientDetNet(spec)
    dummy = np.zeros((1, *spec.image_size, 3), np.float32)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(seed)}, dummy, training=False)
    if ckpt_path:
        from ..ckpt import convert_tf
        tf_prefix = convert_tf.find_tf_checkpoint(ckpt_path)
        if tf_prefix:
            tf_weights = convert_tf.load_tf_checkpoint(tf_prefix)
            variables = convert_tf.convert_tf_weights(
                tf_weights, config, spec, variables)
            logger.info(f"converted TF victim checkpoint {tf_prefix}")
        else:
            restored = ckpt_io.load_pytree(ckpt_path)
            variables = jax.tree.map(lambda _, r: r, variables, restored)
            logger.info(f"restored victim detector from {ckpt_path}")
    return variables


def train(model_name: str = "efficientdet-lite4", *,
          img_dir: str | None = None, label_dir: str | None = None,
          victim_ckpt: str | None = None, save_dir: str = "save_dir",
          batch_size: int = 12, epochs: int = 500, lr: float = 1e-2,
          steps_per_epoch: int | None = None, initial_patch: str | None = None,
          synthetic: bool = False, image_size=None, seed: int = 42,
          visualize_freq: int = 200, config_override=None,
          patch_size: int = 640, mixed_precision: bool = True,
          pre_nms_topk: int = 256, window: int | None = 320,
          grad_accum: int = 1, spatial: int = 1, resume: bool = False,
          packed_entry: int = 0):
    config = config_lib.get_efficientdet_config(model_name)
    # attack-time NMS override (attacker_train.py:31). pre_nms_topk 256 is
    # the benched operating point (bench.py): with score_thresh .5 there are
    # never 256 above-threshold person anchors in an image, so the smaller
    # static candidate set is lossless and meaningfully faster.
    config.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                               "pre_nms_topk": pre_nms_topk})
    # bf16 activations by default on TPU (patch + predictions stay fp32)
    config.mixed_precision = mixed_precision
    if image_size is not None:
        config.image_size = image_size
    if config_override:
        config.update(config_override)

    det_vars = get_victim_variables(config, victim_ckpt)
    # --spatial N row-shards the victim's input images over a
    # ('data','spatial') mesh (GSPMD halo-exchange convs) — the activation
    # memory lever for attacking the 1024-1536px victims
    hw = (config.image_size if isinstance(config.image_size, int)
          else config.image_size[0])
    mesh = make_train_mesh(batch_size, spatial, hw)
    n_dev = mesh.devices.size
    logger.info(f"mesh over {n_dev} device(s); global batch {batch_size}")

    # window=320 covers the learned-scale patch regime (diag <= 320 <=>
    # patch side <= 226 px; see ops/eot.py geometry notes) and is the
    # benched operating point; pass --window 0 for the full default.
    # --packed-entry N: victim entry stages in the space-to-depth packed
    # layout (models/efficientnet_packed.py) — same checkpoint variables
    attacker = PatchAttacker(config, det_vars, learning_rate=lr,
                             patch_size=patch_size, window=window or None,
                             grad_accum=grad_accum,
                             packed_entry=packed_entry)
    key = jax.random.PRNGKey(seed)
    if initial_patch:
        patch_np, scale0 = artifacts.load_patch_dir(
            initial_patch, config.mean_rgb, config.stddev_rgb)
        state = attacker.init_state(key, initial_patch=patch_np,
                                    initial_scale=scale0)
    else:
        state = attacker.init_state(key)

    plateau = ReduceLROnPlateau(factor=0.5, patience=50, min_lr=1e-4)
    best_val_loss = float("inf")
    aug_key = jax.random.PRNGKey(seed + 2)
    start_epoch = 0
    step = 0
    latest = os.path.join(save_dir, "state-latest.msgpack")
    if resume and os.path.exists(latest):
        # full-state resume: patch/scale + adam moments + PRNG chain +
        # plateau-LR counters + loop counters. --initial-patch resumes
        # only patch+scale (the reference's lossy semantics,
        # attacker.py:328-341); --resume reproduces the uninterrupted
        # trajectory step-for-step
        state, aug_key, start_epoch, step, best_val_loss = \
            train_loop_lib.load_loop_state(latest, state, aug_key, plateau)
        logger.info(f"resumed full state from {latest} "
                    f"(epoch {start_epoch}, step {step})")
    state = replicate(mesh, state)
    det_vars = replicate(mesh, det_vars)
    attacker.det_variables = det_vars

    # det_variables passed as a runtime argument (not closure-captured):
    # keeps the ~60 MB of frozen victim weights out of the compiled
    # programs' embedded constants (see attack/attacker.py note)
    train_step = jax.jit(attacker.train_step, donate_argnums=0,
                         static_argnames=("with_asr",))
    eval_step = jax.jit(attacker.eval_step)
    # hoisted: a fresh jit wrapper per visualization event would discard
    # its trace cache and re-trace/re-compile the two-pass graph each time
    asr_curve = jax.jit(attacker.asr_curve)

    # data — multi-host: each process loads a disjoint shard at
    # batch_size/process_count; shard_batch_auto assembles the slices into
    # globally-sharded arrays (single-host: plain full-batch device_put)
    n_proc = jax.process_count()
    local_bs = local_batch_size(batch_size)
    # resume fast-forward: the deterministic input streams are advanced
    # to exactly where the uninterrupted run would be. Per elapsed epoch
    # the val stream is consumed val_steps times plus once more on
    # visualization epochs (the asr_curve batch).
    def _viz_events(n_epochs, spe_):
        if not visualize_freq or n_epochs <= 0:
            return 0
        period = max(1, visualize_freq // spe_)
        return (n_epochs + period - 1) // period

    if synthetic or img_dir is None:
        logger.info("using synthetic data")
        pseed = seed + 1000 * jax.process_index()
        train_iter = pipeline.synthetic_batches(local_bs, config.image_size,
                                                seed=pseed)
        val_iter = pipeline.synthetic_batches(local_bs, config.image_size,
                                              seed=pseed + 1)
        spe = steps_per_epoch or 50
        val_steps = 5
        if start_epoch:
            pipeline.skip_batches(train_iter, start_epoch * spe)
            pipeline.skip_batches(val_iter, start_epoch * val_steps
                                  + _viz_events(start_epoch, spe))
    else:
        parts = pipeline.partition(config, img_dir, label_dir,
                                   batch_size=batch_size, filter_data=False,
                                   seed=seed + jax.process_index())
        if n_proc > 1:
            parts["train"]["source"].shard(jax.process_index(), n_proc)
            parts["val"]["source"].shard(jax.process_index(), n_proc)
        spe = steps_per_epoch or parts["train"]["length"]
        val_steps = parts["val"]["length"]
        train_iter = parts["train"]["source"].repeat_batches(
            local_bs, skip_batches=start_epoch * spe)
        val_iter = parts["val"]["source"].repeat_batches(
            local_bs, skip_batches=start_epoch * val_steps
            + _viz_events(start_epoch, spe))

    put = lambda b: shard_batch_auto(mesh, b)
    train_iter = pipeline.prefetch(train_iter, device_put_fn=put)
    val_iter = pipeline.prefetch(val_iter, device_put_fn=put)

    os.makedirs(save_dir, exist_ok=True)
    mlog = MetricLogger(os.path.join(save_dir, "logs"))
    thr = Throughput()

    for epoch in range(start_epoch, epochs):
        thr.start()
        for _ in range(spe):
            batch = next(train_iter)
            aug_key, k = jax.random.split(aug_key)
            batch = pipeline.augment_batch(k, batch)
            # ASR needs an extra metrics-only NMS pass; run it only on
            # steps whose metrics are actually logged
            logged = (step + 1) % 50 == 0
            state, metrics = train_step(state, batch, with_asr=logged,
                                        det_variables=det_vars)
            thr.count(batch_size)
            step += 1
            if logged:
                mlog.log(step, metrics._asdict(), prefix="train/")
        ips = thr.rate()

        # validation
        val_metrics = []
        for vi in range(val_steps):
            val_metrics.append(eval_step(state, next(val_iter), vi,
                                         det_variables=det_vars))
        val = {k: float(np.mean([float(getattr(m, k)) for m in val_metrics]))
               for k in val_metrics[0]._fields}
        mlog.log(step, val, prefix="val/")
        mlog.log(step, {"images_per_sec": ips, "epoch": epoch})
        logger.info(
            f"epoch {epoch}: val_loss={val['loss']:.4f} "
            f"asr={val['asr']:.3f} scale={val['scale']:.3f} "
            f"asr_to_scale={val['asr_to_scale']:.4f} {ips:.1f} img/s")
        if val.get("eot_clamp_frac", 0.0) > 0.01:
            logger.warning(
                f"epoch {epoch}: {val['eot_clamp_frac']:.1%} of patch slots "
                f"hit the EOT window clamp (window={window}) — the "
                f"composite is tighter than the reference's image-width "
                f"clamp at the current scale; raise --window (see "
                f"ops/eot.py geometry notes)")

        # ASR-vs-threshold curve every visualize_freq steps
        # (host-side replacement for the in-graph tfplot rendering,
        # attacker.py:221-236,277-283)
        if visualize_freq and epoch % max(1, visualize_freq // spe) == 0:
            try:
                from ..utils import visualize
                thresholds = np.arange(
                    float(config.nms_configs.score_thresh or 0.5), 0.805,
                    0.01, dtype=np.float32)
                curve = asr_curve(state, next(val_iter), thresholds,
                                  det_variables=det_vars)
                img = visualize.plot_asr_curve(thresholds, np.asarray(curve))
                from PIL import Image
                Image.fromarray(img).save(
                    os.path.join(save_dir, "logs", f"asr_{epoch:03d}.png"))
            except Exception as e:  # visualization must never kill training
                logger.warning(f"asr-curve viz failed: {e}")

        # artifacts: dir per epoch (attacker_train.py:49-56 format)
        dirname = os.path.join(save_dir,
                               f"patch_{epoch:02d}_{val['asr_to_scale']:.4f}")
        if val["loss"] < best_val_loss:
            best_val_loss = val["loss"]
            if is_main_process():  # one writer on multi-host shared dirs
                artifacts.save_patch_dir(dirname, np.asarray(state.patch),
                                         float(state.scale),
                                         config.mean_rgb, config.stddev_rgb)
        new_opt = plateau.update(val["loss"], state.opt_state)
        state = state._replace(opt_state=new_opt)
        if is_main_process():
            # full-state kill-and-resume checkpoint (see --resume)
            train_loop_lib.save_loop_state(
                latest, state, epoch=epoch + 1, step=step,
                best=best_val_loss, plateau=plateau, aug_key=aug_key)
    mlog.close()
    return state


def main():
    from ..utils.debug import enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache across runs
    p = argparse.ArgumentParser(description="adversarial patch attack training")
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--img-dir", default=None)
    p.add_argument("--label-dir", default=None)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--save-dir", default="save_dir")
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--initial-patch", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--fp32", action="store_true",
                   help="disable bf16 mixed precision")
    p.add_argument("--pre-nms-topk", type=int, default=256,
                   help="static NMS candidate cap (256 is lossless at "
                        "score_thresh .5 and faster)")
    p.add_argument("--hparams", default=None,
                   help="config override string 'a.b=1,c=2' or YAML path "
                        "(reference tf2/train.py --hparams)")
    p.add_argument("--window", type=int, default=320,
                   help="static EOT composite window (0 -> model default)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each step's batch into this many sequential "
                        "microbatches with one summed-gradient update "
                        "(activation memory ~ batch/grad_accum)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each image's rows over this many chips "
                        "(spatial model parallelism for the large "
                        "victims; must divide the device count and the "
                        "image height)")
    p.add_argument("--packed-entry", type=int, default=0,
                   help="victim entry blocks in the space-to-depth packed "
                        "layout (models/efficientnet_packed.py); measured "
                        "2.4x SLOWER on this toolchain "
                        "(docs/PACKED_BACKBONE.md) — measurement lever, "
                        "leave 0")
    p.add_argument("--resume", action="store_true",
                   help="resume the FULL state (patch + adam moments + "
                        "PRNG + plateau-LR + data position) from "
                        "save_dir/state-latest.msgpack")
    args = p.parse_args()
    train(args.model, img_dir=args.img_dir, label_dir=args.label_dir,
          victim_ckpt=args.victim_ckpt, save_dir=args.save_dir,
          batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
          steps_per_epoch=args.steps_per_epoch,
          initial_patch=args.initial_patch, synthetic=args.synthetic,
          image_size=args.image_size, mixed_precision=not args.fp32,
          pre_nms_topk=args.pre_nms_topk, window=args.window,
          config_override=args.hparams, grad_accum=args.grad_accum,
          spatial=args.spatial, resume=args.resume,
          packed_entry=args.packed_entry)


if __name__ == "__main__":
    main()
