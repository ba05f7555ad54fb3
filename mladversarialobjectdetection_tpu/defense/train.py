"""Defender training driver (entry point).

Behavioral parity with reference defender_train.py:20-74: protege =
efficientdet-lite4, eval patch loaded from an attack artifact dir, Adam
1e-2, 200 epochs, batch 24, data filtered by label constraints
(filter_data=True), artifacts per epoch in `patch_{epoch}_{val_loss:.4f}`.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from .. import config as config_lib
from ..attack import artifacts
from ..attack.train import get_victim_variables
from ..ckpt import io as ckpt_io
from ..data import pipeline
from ..parallel import (is_main_process, local_batch_size, make_train_mesh,
                        replicate, shard_batch_auto)
from ..utils.log import get_logger
from ..utils import train_loop as train_loop_lib
from ..utils.train_loop import MetricLogger, ReduceLROnPlateau, Throughput
from .defender import PatchAttackDefender

logger = get_logger(__name__)


def train(model_name: str = "efficientdet-lite4", *,
          img_dir: str | None = None, label_dir: str | None = None,
          victim_ckpt: str | None = None, eval_patch: str | None = None,
          save_dir: str = "save_dir_def", batch_size: int = 24,
          epochs: int = 200, lr: float = 1e-2,
          steps_per_epoch: int | None = None,
          initial_weights: str | None = None, synthetic: bool = False,
          image_size=None, seed: int = 43, config_override=None,
          bf16: bool = False, grad_accum: int = 1, spatial: int = 1,
          resume: bool = False, packed: int = 0):
    config = config_lib.get_efficientdet_config(model_name)
    config.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5})
    if image_size is not None:
        config.image_size = image_size
    if bf16:
        # bf16 activations for the frozen detector AND the U-Net compute
        # dtype (defender.py reads config.mixed_precision); fp32 params
        config.mixed_precision = True
    if config_override:
        config.update(config_override)

    det_vars = get_victim_variables(config, victim_ckpt)
    # --spatial N row-shards the images over a ('data','spatial') mesh
    # (U-Net + protege convs get GSPMD halo exchange; BN stats reduce
    # cross-spatial) — activation memory lever for large image sizes
    hw = (config.image_size if isinstance(config.image_size, int)
          else config.image_size[0])
    mesh = make_train_mesh(batch_size, spatial, hw)

    if eval_patch:
        patch_np, scale = artifacts.load_patch_dir(
            eval_patch, config.mean_rgb, config.stddev_rgb)
    else:
        logger.warning("no eval_patch given; using a random patch for eval")
        patch_np = np.random.default_rng(0).uniform(
            -1, 1, size=(640, 640, 3)).astype(np.float32)
        scale = 0.4

    defender = PatchAttackDefender(config, det_vars, eval_patch=patch_np,
                                   eval_scale=scale, learning_rate=lr,
                                   grad_accum=grad_accum, packed=packed)
    state = defender.init_state(jax.random.PRNGKey(seed))
    if initial_weights:
        # native pytree ckpt dir OR a reference antipatch.h5
        # (attack_detection.py:54-55 initial_weights h5 semantics)
        from ..ckpt.convert_defense import load_antipatch
        restored = load_antipatch(
            initial_weights, {"params": state.params,
                              "batch_stats": state.batch_stats})
        state = state._replace(params=restored["params"],
                               batch_stats=restored["batch_stats"])

    plateau = ReduceLROnPlateau(factor=0.5, patience=50, min_lr=1e-4)
    best_val = float("inf")
    aug_key = jax.random.PRNGKey(seed + 2)
    start_epoch = 0
    step = 0
    latest = os.path.join(save_dir, "state-latest.msgpack")
    if resume and os.path.exists(latest):
        # full-state resume: U-Net params/BN + adam moments + PRNG chain +
        # plateau-LR counters + loop counters (--initial-weights restores
        # weights only — the reference's lossy semantics); reproduces the
        # uninterrupted trajectory step-for-step
        state, aug_key, start_epoch, step, best_val = \
            train_loop_lib.load_loop_state(latest, state, aug_key, plateau)
        logger.info(f"resumed full state from {latest} "
                    f"(epoch {start_epoch}, step {step})")
    state = replicate(mesh, state)
    det_vars = replicate(mesh, det_vars)
    defender.det_variables = det_vars

    # det_variables passed as a runtime argument (not closure-captured):
    # keeps the frozen protege weights out of the compiled programs'
    # embedded constants (see attack/attacker.py note)
    train_step = jax.jit(defender.train_step, donate_argnums=0,
                         static_argnames=("with_adv_scores",))
    eval_step = jax.jit(defender.eval_step)

    # multi-host input: each process loads a disjoint file shard at
    # batch_size/process_count; shard_batch_auto assembles the slices into
    # globally-sharded arrays (single-host: plain full-batch device_put)
    n_proc = jax.process_count()
    local_bs = local_batch_size(batch_size)
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
            # resume fast-forward: advance the deterministic streams to
            # where the uninterrupted run would be
            pipeline.skip_batches(train_iter, start_epoch * spe)
            pipeline.skip_batches(val_iter, start_epoch * val_steps)
    else:
        parts = pipeline.partition(config, img_dir, label_dir,
                                   batch_size=batch_size, filter_data=True,
                                   seed=seed + jax.process_index())
        if n_proc > 1:
            parts["train"]["source"].shard(jax.process_index(), n_proc)
            parts["val"]["source"].shard(jax.process_index(), n_proc)
        spe = steps_per_epoch or parts["train"]["length"]
        val_steps = parts["val"]["length"]
        train_iter = parts["train"]["source"].repeat_batches(
            local_bs, skip_batches=start_epoch * spe)
        val_iter = parts["val"]["source"].repeat_batches(
            local_bs, skip_batches=start_epoch * val_steps)

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
            # real adv scores on logged steps only (extra detector pass),
            # matching the reference's visualize-freq score logging
            logged = (step + 1) % 50 == 0
            state, metrics = train_step(state, batch,
                                        with_adv_scores=logged,
                                        det_variables=det_vars)
            thr.count(batch_size)
            step += 1
            if logged:
                mlog.log(step, metrics._asdict(), prefix="train/")
        ips = thr.rate()

        vals = [eval_step(state, next(val_iter), vi, det_variables=det_vars)
                for vi in range(val_steps)]
        val_loss = float(np.mean([float(v.loss) for v in vals]))
        # north-star defense metrics (BASELINE.json): recovery PSNR over
        # the patched region + attack-detection rate; NaN-mean skips val
        # batches where the victim found nobody to patch
        def nanmean(xs):
            xs = [x for x in xs if not np.isnan(x)]
            return float(np.mean(xs)) if xs else float("nan")

        val_psnr = nanmean([float(v.recovery_psnr) for v in vals])
        val_adr = nanmean([float(v.adr) for v in vals])
        mlog.log(step, {"loss": val_loss, "recovery_psnr": val_psnr,
                        "adr": val_adr, "images_per_sec": ips,
                        "epoch": epoch}, prefix="val/")
        logger.info(f"epoch {epoch}: val_loss={val_loss:.4f} "
                    f"psnr={val_psnr:.1f}dB adr={val_adr:.2f} "
                    f"{ips:.1f} img/s")

        # split-violin of clean vs post-attack score distributions
        # (host-side replacement for the tfplot violin at
        # attack_detection.py:208-237)
        if epoch % 10 == 0:
            try:
                from ..utils import visualize
                clean = [float(v.mean_clean_score) for v in vals]
                adv = [float(v.mean_adv_score) for v in vals]
                img = visualize.plot_score_violin(clean, adv)
                from PIL import Image
                Image.fromarray(img).save(
                    os.path.join(save_dir, "logs", f"scores_{epoch:03d}.png"))
            except Exception as e:  # viz must never kill training
                logger.warning(f"violin viz failed: {e}")

        if val_loss < best_val and is_main_process():
            best_val = val_loss
            art_dir = os.path.join(save_dir,
                                   f"patch_{epoch:02d}_{val_loss:.4f}")
            out = os.path.join(art_dir, "antipatch")
            weights = {"params": state.params,
                       "batch_stats": state.batch_stats}
            ckpt_io.save_pytree(out, weights)
            try:
                # reference-consumable mirror (attack_detection.py:311-318;
                # loads into generator.PatchNeutralizer via load_weights)
                from ..ckpt.convert_defense import save_antipatch_h5
                host = jax.tree.map(np.asarray, weights)
                save_antipatch_h5(host, os.path.join(art_dir,
                                                     "antipatch.h5"))
            except Exception as e:  # h5py absent / replicated-sharding edge
                logger.warning(f"antipatch.h5 mirror not written: {e}")
        new_opt = plateau.update(val_loss, state.opt_state)
        state = state._replace(opt_state=new_opt)
        if is_main_process():
            # full-state kill-and-resume checkpoint (see --resume)
            train_loop_lib.save_loop_state(
                latest, state, epoch=epoch + 1, step=step,
                best=best_val, plateau=plateau, aug_key=aug_key)
    mlog.close()
    return state


def main():
    from ..utils.debug import enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache across runs
    p = argparse.ArgumentParser(description="patch-attack defender training")
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--img-dir", default=None)
    p.add_argument("--label-dir", default=None)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--eval-patch", default=None,
                   help="attack artifact dir with patch.npy + scale.txt")
    p.add_argument("--save-dir", default="save_dir_def")
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--initial-weights", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--hparams", default=None,
                   help="config override string 'a.b=1,c=2' or YAML path "
                        "(reference tf2/train.py --hparams)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations for detector + U-Net (fp32 "
                        "params); fp32 is the default here")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each step's batch into this many sequential "
                        "microbatches with one summed-gradient update "
                        "(activation memory ~ batch/grad_accum)")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each image's rows over this many chips "
                        "(spatial model parallelism; must divide the "
                        "device count and the image height)")
    p.add_argument("--packed", type=int, nargs="?", const=3, default=0,
                   help="space-to-depth lane-packed U-Net layout "
                        "(models/unet_packed.py) — same model/pytree, "
                        "TPU-native memory layout; optional value = "
                        "packing depth 1-3 (640/320/160px stages). "
                        "Bare --packed = depth 3, the measured best "
                        "(311->203 ms/step at b24, +53%; BENCH_NOTES)")
    p.add_argument("--resume", action="store_true",
                   help="resume the FULL state (weights + adam moments + "
                        "PRNG + plateau-LR + data position) from "
                        "save_dir/state-latest.msgpack")
    args = p.parse_args()
    train(args.model, img_dir=args.img_dir, label_dir=args.label_dir,
          victim_ckpt=args.victim_ckpt, eval_patch=args.eval_patch,
          save_dir=args.save_dir, batch_size=args.batch_size,
          epochs=args.epochs, lr=args.lr,
          steps_per_epoch=args.steps_per_epoch,
          initial_weights=args.initial_weights, synthetic=args.synthetic,
          image_size=args.image_size, bf16=args.bf16,
          config_override=args.hparams, grad_accum=args.grad_accum,
          spatial=args.spatial, resume=args.resume, packed=args.packed)


if __name__ == "__main__":
    main()
