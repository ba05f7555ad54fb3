"""End-to-end functional demonstration: train a detector, attack it,
defend it — entirely self-contained on synthetic data.

This is the full reference workflow (supervised detector training ->
adversarial patch training -> self-supervised defense) on one chip at
reduced scale, without any downloaded checkpoints (this environment has no
network egress). It proves the pieces compose and the attack actually
suppresses detections:

1. train a small EfficientDet on synthetic scenes where "persons" are
   high-contrast rectangles with known boxes, until it detects them;
2. run PatchAttacker against the frozen detector; report the clean
   mean-max-score vs the patched score and the ASR trajectory;
3. train the U-Net defender briefly and report recovery loss.

Run:  python examples/end_to_end_attack.py [--image-size 128] [--steps 300]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def synthetic_scene_batch(rng, batch, hw, n_boxes=2):
    """Scenes = smooth background + solid bright rectangles ("persons")."""
    imgs = np.full((batch, hw, hw, 3),
                   rng.uniform(-0.6, -0.2, (batch, 1, 1, 3)), np.float32)
    imgs += rng.normal(0, 0.03, imgs.shape).astype(np.float32)
    g = n_boxes
    boxes = np.zeros((batch, g, 4), np.float32)
    valid = np.zeros((batch, g), bool)
    for b in range(batch):
        for k in range(n_boxes):
            h = rng.integers(hw // 4, hw // 2)
            w = rng.integers(hw // 6, hw // 3)
            y0 = rng.integers(0, hw - h)
            x0 = rng.integers(0, hw - w)
            color = rng.uniform(0.4, 1.0, 3)
            imgs[b, y0:y0 + h, x0:x0 + w] = color
            boxes[b, k] = (y0, x0, y0 + h, x0 + w)
            valid[b, k] = True
    return np.clip(imgs, -1, 1), boxes, valid


def main(image_size=128, det_steps=300, attack_steps=150, defend_steps=60,
         batch=8, seed=0, bf16=False):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.defense.defender import \
        PatchAttackDefender
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer

    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = image_size
    cfg.fpn_num_filters = 32
    cfg.fpn_cell_repeats = 2
    cfg.box_class_repeats = 2
    cfg.num_classes = 4  # tiny head; class 0 = "person"
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                            "pre_nms_topk": 256, "max_output_size": 25})
    cfg.max_boxes_per_image = 8
    cfg.mixed_precision = bf16
    cfg.learning_rate = 0.08
    cfg.lr_warmup_init = 0.004
    cfg.optimizer = "sgd"
    cfg.moving_average_decay = 0.0

    rng = np.random.default_rng(seed)

    # -- 1. supervised detector training ---------------------------------
    trainer = DetectorTrainer(cfg, steps_per_epoch=det_steps)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    step_fn = jax.jit(trainer.train_step, donate_argnums=0)
    t0 = time.time()
    for i in range(det_steps):
        imgs, boxes, valid = synthetic_scene_batch(rng, batch, image_size)
        classes = np.zeros(valid.shape, np.int32)
        state, metrics = step_fn(state, imgs, boxes, classes, valid)
        if (i + 1) % 50 == 0:
            print(f"[detector] step {i+1}: loss={float(metrics['loss']):.3f} "
                  f"cls={float(metrics['cls_loss']):.3f} "
                  f"box={float(metrics['box_loss']):.4f} "
                  f"({(i+1)*batch/(time.time()-t0):.1f} img/s)", flush=True)
    det_vars = trainer.eval_variables(state, use_ema=False)

    # -- quality gate: does it detect the rectangles? ---------------------
    attacker = PatchAttacker(cfg, det_vars, patch_size=image_size,
                             learning_rate=1e-2)
    imgs, _, _ = synthetic_scene_batch(rng, batch, image_size)
    boxes_det, scores, valid = jax.jit(attacker.first_pass)(jnp.asarray(imgs))
    n_det = int(jnp.sum(valid))
    mean_score = float(jnp.sum(scores * valid) / jnp.maximum(1, n_det))
    print(f"[detector] detections on clean scenes: {n_det} "
          f"(mean score {mean_score:.3f})")

    # -- 2. adversarial patch training ------------------------------------
    astate = attacker.init_state(jax.random.PRNGKey(seed + 1))
    atk_step = jax.jit(attacker.train_step, donate_argnums=0)
    first = last = None
    for i in range(attack_steps):
        imgs, _, _ = synthetic_scene_batch(rng, batch, image_size)
        astate, m = atk_step(astate, jnp.asarray(imgs))
        if i == 0:
            first = {k: float(v) for k, v in m._asdict().items()}
        if (i + 1) % 30 == 0:
            print(f"[attack] step {i+1}: mean_max_score="
                  f"{float(m.mean_max_score):.3f} asr={float(m.asr):.3f} "
                  f"scale={float(m.scale):.3f}", flush=True)
    last = {k: float(v) for k, v in m._asdict().items()}
    print(f"[attack] mean_max_score {first['mean_max_score']:.3f} -> "
          f"{last['mean_max_score']:.3f}; asr {first['asr']:.3f} -> "
          f"{last['asr']:.3f}")

    # -- 3. defender training ---------------------------------------------
    defender = PatchAttackDefender(cfg, det_vars,
                                   eval_patch=np.asarray(astate.patch),
                                   eval_scale=float(astate.scale),
                                   learning_rate=1e-2, n_filters=8)
    dstate = defender.init_state(jax.random.PRNGKey(seed + 2))
    d_step = jax.jit(defender.train_step, donate_argnums=0)
    d_eval = jax.jit(defender.eval_step)
    for i in range(defend_steps):
        imgs, _, _ = synthetic_scene_batch(rng, batch, image_size)
        dstate, dm = d_step(dstate, jnp.asarray(imgs))
        if (i + 1) % 20 == 0:
            print(f"[defense] step {i+1}: loss={float(dm.loss):.4f}",
                  flush=True)
    imgs, _, _ = synthetic_scene_batch(rng, batch, image_size)
    ev = d_eval(dstate, jnp.asarray(imgs))
    print(f"[defense] eval recovery loss={float(ev.loss):.4f} "
          f"adv mean score={float(ev.mean_adv_score):.3f}")
    return first, last


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--det-steps", type=int, default=300)
    p.add_argument("--attack-steps", type=int, default=150)
    p.add_argument("--defend-steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    a = p.parse_args()
    main(a.image_size, a.det_steps, a.attack_steps, a.defend_steps, a.batch,
         bf16=a.bf16)
