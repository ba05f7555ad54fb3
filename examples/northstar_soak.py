"""North-star soak: the reference-shaped 500-epoch attack run.

The reference's headline attack artifact is `patch_434_2.1692` —
val_asr_to_scale ~ 2.17 at epoch 434 of a 500-epoch run with
ReduceLROnPlateau(.5, patience 50, min 1e-4) on val_loss and per-epoch
ModelCheckpoint naming (reference attacker_train.py:54,57,70;
demo_v2.py:209). Earlier soaks (docs/SOAK_r03_5k.json) ran 5k flat-LR
steps — ~40 epoch-equivalents — and plateaued at asr/scale ~ 1.4 with the
scheduler never firing. This script runs the production operating point
(lite4@640, b24, bf16, pre_nms_topk 256, window 320 — the shipped
attack/train.py defaults) in the reference's epoch/plateau shape:

  - epochs of `steps_per_epoch` train steps (reference epochs are ~80-100
    steps: ~1k images / batch 12)
  - after each epoch: validation on a FIXED held-out scene pool
    (several batches x several EOT draws), ReduceLROnPlateau(.5, 50,
    1e-4) stepping on val_loss, best-val_asr_to_scale artifact saved as
    `patch_{epoch}_{val_asr_to_scale:.4f}` (attacker_train.py:54)
  - JSON trajectory flushed every epoch (timeout-safe)

Frontier mode (`--frontier "0.3,0.45,0.6,0.75"`) instead runs the
ASR-vs-scale ceiling analysis: per pinned scale, a fresh patch trains
with `freeze_scale=True` (pure sum(max_score^2) objective) and the
converged ASR is reported — the measured ceiling of the synthetic victim
at each patch size.

Run (TPU):
  python examples/northstar_soak.py --save-dir /tmp/northstar
  python examples/northstar_soak.py --save-dir /tmp/northstar \
      --victim-ckpt /tmp/northstar/victim_ckpt --frontier "0.3,0.45,0.6,0.75"
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from production_soak import ScenePool, synthetic_person_batch


def build_victim(cfg, pool, rng, det_steps, victim_path, victim_ckpt=None,
                 batch=24, seed=0):
    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    if victim_ckpt:
        print(f"[victim] loading {victim_ckpt}", flush=True)
        # device_put once: load_pytree returns host arrays, and passing
        # those as train_step args re-uploads ~60 MB of victim weights
        # through the tunnel EVERY step (observed 10x step slowdown)
        return jax.device_put(ckpt_io.load_pytree(victim_ckpt))
    trainer = DetectorTrainer(cfg, steps_per_epoch=det_steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    step_fn = jax.jit(trainer.train_step, donate_argnums=0)
    t0 = time.time()
    for i in range(det_steps):
        imgs, boxes, classes, valid = pool.sample(rng, batch)
        state, metrics = step_fn(state, imgs, boxes, classes, valid)
        if (i + 1) % 100 == 0:
            print(f"[victim] step {i+1}: loss={float(metrics['loss']):.3f} "
                  f"({(i+1)*batch/(time.time()-t0):.1f} img/s)", flush=True)
    det_vars = trainer.eval_variables(state, use_ema=False)
    del state
    ckpt_io.save_pytree(victim_path, jax.tree.map(np.asarray, det_vars))
    print(f"[victim] saved {victim_path}", flush=True)
    return det_vars


def make_config():
    import mladversarialobjectdetection_tpu as mad
    cfg = mad.get_efficientdet_config("efficientdet-lite4")
    # shipped attack driver operating point (attack/train.py defaults)
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                            "pre_nms_topk": 256})
    cfg.mixed_precision = True
    cfg.learning_rate = 0.08
    cfg.lr_warmup_init = 0.004
    cfg.optimizer = "sgd"
    cfg.moving_average_decay = 0.0
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save-dir", default="/tmp/northstar")
    p.add_argument("--det-steps", type=int, default=800)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--max-hours", type=float, default=3.0,
                   help="wall-clock cap on the attack stage")
    p.add_argument("--val-batches", type=int, default=4)
    p.add_argument("--eot-draws", type=int, default=2,
                   help="EOT draws per val batch per epoch")
    p.add_argument("--window", type=int, default=320)
    p.add_argument("--frontier", default="",
                   help="comma-separated pinned scales: run the "
                        "ASR-vs-scale frontier instead of the epoch soak")
    p.add_argument("--frontier-steps", type=int, default=1500)
    p.add_argument("--initial-patch", default=None,
                   help="patch dir to warm-start from")
    p.add_argument("--initial-lr", type=float, default=1e-2,
                   help="resume lever: restart a soak at the LR the "
                        "plateau scheduler had annealed to")
    a = p.parse_args()

    from mladversarialobjectdetection_tpu.attack import artifacts
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.utils.debug import \
        enable_compilation_cache
    from mladversarialobjectdetection_tpu.utils.train_loop import \
        ReduceLROnPlateau

    enable_compilation_cache()
    os.makedirs(a.save_dir, exist_ok=True)
    cfg = make_config()
    rng = np.random.default_rng(a.seed)
    print("[soak] building train scene pool...", flush=True)
    pool = ScenePool(rng, n_batches=12, batch=a.batch, hw=640)
    print(f"[soak] train pool ready: {pool.n} scenes", flush=True)

    victim_path = os.path.join(a.save_dir, "victim_ckpt")
    det_vars = build_victim(cfg, pool, rng, a.det_steps, victim_path,
                            a.victim_ckpt, a.batch, a.seed)

    # fixed held-out validation scenes (different generator stream).
    # Uploaded only AFTER victim training: the detector trainer is the
    # HBM peak (params + adam + EMA + b24@640 activations) and an extra
    # ~470 MB resident val pool OOMs the chip during it.
    rng_val = np.random.default_rng(a.seed + 777)
    val_sets = [synthetic_person_batch(rng_val, a.batch, 640)
                for _ in range(a.val_batches)]
    val_imgs = [jax.device_put(v[0]) for v in val_sets]
    print(f"[soak] fixed val pool ready: {a.val_batches * a.batch} scenes",
          flush=True)

    record = {"config": {"model": "efficientdet-lite4", "image_size": 640,
                         "batch": a.batch, "window": a.window, "bf16": True,
                         "pre_nms_topk": 256,
                         "epochs": a.epochs,
                         "steps_per_epoch": a.steps_per_epoch,
                         "val_batches": a.val_batches,
                         "eot_draws": a.eot_draws,
                         "plateau": {"factor": 0.5, "patience": 50,
                                     "min_lr": 1e-4}}}
    out_json = os.path.join(
        a.save_dir, "frontier.json" if a.frontier else "northstar.json")

    if a.frontier:
        scales = [float(s) for s in a.frontier.split(",") if s.strip()]
        # window 448 keeps the composite un-clamped up to
        # scale*box <= 448/sqrt(2) = 316 px (boxes top out at 400 px tall,
        # so scale .79); the production window 320 would clip the large-
        # scale probes and understate the ceiling.
        record["frontier"] = []
        for sc in scales:
            attacker = PatchAttacker(cfg, det_vars, window=448,
                                     freeze_scale=True)
            st = attacker.init_state(jax.random.PRNGKey(a.seed + 11),
                                     initial_scale=sc)
            fast = jax.jit(functools.partial(attacker.train_step,
                                             with_asr=False),
                           donate_argnums=0)
            logged = jax.jit(functools.partial(attacker.train_step,
                                               with_asr=True),
                             donate_argnums=0)
            eval_j = jax.jit(attacker.eval_step)
            t0 = time.time()
            rows = []
            for i in range(a.frontier_steps):
                imgs, _, _, _ = pool.sample(rng, a.batch)
                step = logged if (i + 1) % 100 == 0 else fast
                st, m = step(st, jnp.asarray(imgs), det_variables=det_vars)
                if (i + 1) % 100 == 0:
                    rows.append({"step": i + 1, "asr": float(m.asr),
                                 "mean_max_score": float(m.mean_max_score)})
                    print(f"[frontier s={sc}] step {i+1}: "
                          f"asr={rows[-1]['asr']:.3f} "
                          f"ms={rows[-1]['mean_max_score']:.3f} "
                          f"({(i+1)*a.batch/(time.time()-t0):.1f} img/s)",
                          flush=True)
            # converged ASR: mean over the fixed val pool, 4 EOT draws
            evs = [eval_j(st, val_imgs[i], batch_idx=i * 7 + d,
                          det_variables=det_vars)
                   for i in range(a.val_batches) for d in range(4)]
            val_asr = float(np.mean([float(e.asr) for e in evs]))
            val_ms = float(np.mean([float(e.mean_max_score) for e in evs]))
            row = {"scale": sc, "val_asr": val_asr,
                   "val_mean_max_score": val_ms,
                   "val_asr_to_scale": val_asr / sc, "trajectory": rows}
            record["frontier"].append(row)
            print(f"[frontier] scale {sc}: val_asr={val_asr:.3f} "
                  f"asr/scale={val_asr/sc:.3f}", flush=True)
            json.dump(record, open(out_json, "w"), indent=1)
        print(f"[frontier] record: {out_json}", flush=True)
        return

    # ---- reference-shaped epoch soak -----------------------------------
    attacker = PatchAttacker(cfg, det_vars, window=a.window,
                             learning_rate=a.initial_lr)
    key = jax.random.PRNGKey(a.seed + 1)
    if a.initial_patch:
        patch_np, scale0 = artifacts.load_patch_dir(
            a.initial_patch, cfg.mean_rgb, cfg.stddev_rgb)
        astate = attacker.init_state(key, initial_patch=patch_np,
                                     initial_scale=scale0)
    else:
        astate = attacker.init_state(key)
    atk_fast = jax.jit(functools.partial(attacker.train_step, with_asr=False),
                       donate_argnums=0)
    atk_logged = jax.jit(functools.partial(attacker.train_step,
                                           with_asr=True),
                         donate_argnums=0)
    eval_j = jax.jit(attacker.eval_step)
    plateau = ReduceLROnPlateau(factor=0.5, patience=50, min_lr=1e-4)
    traj = []
    best = None
    t0 = time.time()
    deadline = t0 + a.max_hours * 3600.0
    for epoch in range(1, a.epochs + 1):
        tm = None
        for s in range(a.steps_per_epoch):
            imgs, _, _, _ = pool.sample(rng, a.batch)
            step = atk_logged if s == a.steps_per_epoch - 1 else atk_fast
            astate, tm = step(astate, jnp.asarray(imgs),
                              det_variables=det_vars)
        evs = [eval_j(astate, val_imgs[i], batch_idx=i * 7 + d,
                      det_variables=det_vars)
               for i in range(a.val_batches) for d in range(a.eot_draws)]
        val_loss = float(np.mean([float(e.loss) for e in evs]))
        val_asr = float(np.mean([float(e.asr) for e in evs]))
        scale = float(astate.scale)
        val_s2s = val_asr / (scale + 1e-7)
        astate = astate._replace(
            opt_state=plateau.update(val_loss, astate.opt_state))
        lr = float(astate.opt_state.hyperparams["learning_rate"])
        row = {"epoch": epoch, "step": epoch * a.steps_per_epoch,
               "val_loss": val_loss, "val_asr": val_asr, "scale": scale,
               "val_asr_to_scale": val_s2s, "lr": lr,
               "train_asr": float(tm.asr),
               "train_mean_max_score": float(tm.mean_max_score),
               "train_loss": float(tm.loss),
               "img_per_sec": epoch * a.steps_per_epoch * a.batch /
                              (time.time() - t0)}
        traj.append(row)
        print(f"[attack] epoch {epoch}: val_loss={val_loss:.3f} "
              f"val_asr={val_asr:.3f} scale={scale:.3f} "
              f"asr/scale={val_s2s:.3f} lr={lr:.2e} "
              f"({row['img_per_sec']:.1f} img/s)", flush=True)
        if best is None or val_s2s > best["val_asr_to_scale"]:
            best = dict(row)
            pd = os.path.join(a.save_dir, f"patch_{epoch}_{val_s2s:.4f}")
            artifacts.save_patch_dir(pd, np.asarray(astate.patch),
                                     float(astate.scale))
            best["artifact"] = pd
            print(f"[attack] new best asr/scale -> {pd}", flush=True)
        record["attack_trajectory"] = traj
        record["best"] = best
        json.dump(record, open(out_json, "w"), indent=1)
        if time.time() > deadline:
            record["stopped"] = f"wall-clock cap {a.max_hours}h at epoch {epoch}"
            print(f"[attack] {record['stopped']}", flush=True)
            break
    json.dump(record, open(out_json, "w"), indent=1)
    print(f"[soak] best: {json.dumps(best)}", flush=True)
    print(f"[soak] record: {out_json}", flush=True)


if __name__ == "__main__":
    main()
