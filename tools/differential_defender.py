"""Differential defender-QUALITY run: reference PatchAttackDefender (TF,
CPU) vs the native trainer on identical data, protege, and U-Net init.

VERDICT r4 weak #2: step-goldens prove one defense step matches
(tests/test_defense_step_parity_tf.py); nothing proved the training
TRAJECTORY does. This tool trains BOTH implementations scaled down
(lite0 @ 128px protege, same widened-random weights bridged through
ckpt/convert_tf; same U-Net init bridged through ckpt/convert_defense;
same fixed eval patch; the same pre-generated synthetic batches in the
same order) and reports val-loss / recovery-PSNR / attack-detection-rate
trajectories at equal step counts.

The two sides draw their own masker randomness (crop shuffle, rotation,
noise cannot be pinned across frameworks), so this is a statistical
match-or-beat comparison, not a bit-level golden.

Reference loop transcribed from attack_detection.py:168-206 (call) /
290-298 (train_step applies tape gradients with the driver's Adam 1e-2,
defender_train.py:44); eval metrics computed by SHARED numpy code from
each side's tensors using the native eval_step definitions
(defense/defender.py:272-347 — PSNR over the patched region of
recover()=clip(patched+2*updates), ADR = score recovery > 10 pts rule).

Run (CPU, ~20-40 min):
    python tools/differential_defender.py --out docs/DIFF_DEFENDER.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REFERENCE = "/root/reference"
IMG = 128
NMS_OVERRIDE = {"iou_thresh": 0.5, "score_thresh": 0.05,
                "max_output_size": 16}


# ---------------------------------------------------------------------------
# reference import shims (mirrors tests/test_defense_parity_tf.py ref_env)
# ---------------------------------------------------------------------------

def setup_ref_env_real(patch_npy_path):
    """Shims for optional deps; tfa.rotate implemented with raw TF ops so
    the REAL +-20deg rotation path runs (the test stub only allows 0)."""
    import tensorflow as tf
    import tf_keras

    sys.modules.setdefault("keras", tf_keras)
    sys.modules.setdefault("keras.backend", tf_keras.backend)
    sys.modules.setdefault("keras.layers", tf_keras.layers)
    sys.modules.setdefault("keras.models", tf_keras.models)
    conv_mod = types.ModuleType("keras.layers.convolutional")
    conv_mod.Conv2D = tf_keras.layers.Conv2D
    conv_mod.Conv2DTranspose = tf_keras.layers.Conv2DTranspose
    sys.modules.setdefault("keras.layers.convolutional", conv_mod)
    pool_mod = types.ModuleType("keras.layers.pooling")
    pool_mod.MaxPooling2D = tf_keras.layers.MaxPooling2D
    sys.modules.setdefault("keras.layers.pooling", pool_mod)

    tfa = types.ModuleType("tensorflow_addons")
    tfa_img = types.ModuleType("tensorflow_addons.image")

    def _rotate(im, angle, interpolation="bilinear", fill_value=0.0):
        """Bilinear rotation about the image center (tfa.image.rotate
        semantics) via gather — runs inside the Masker's while_loop."""
        shp = tf.shape(im)
        h = tf.cast(shp[0], tf.float32)
        w = tf.cast(shp[1], tf.float32)
        cy = (h - 1.0) / 2.0
        cx = (w - 1.0) / 2.0
        yy = tf.cast(tf.range(shp[0]), tf.float32)[:, None] - cy
        xx = tf.cast(tf.range(shp[1]), tf.float32)[None, :] - cx
        cos_a = tf.cos(angle)
        sin_a = tf.sin(angle)
        # inverse mapping: source = R(-angle) . dest
        sy = cos_a * yy + sin_a * xx + cy
        sx = -sin_a * yy + cos_a * xx + cx
        y0 = tf.floor(sy)
        x0 = tf.floor(sx)
        wy = sy - y0
        wx = sx - x0

        def gat(yi, xi):
            inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            yc = tf.clip_by_value(yi, 0.0, h - 1.0)
            xc = tf.clip_by_value(xi, 0.0, w - 1.0)
            idx = tf.cast(tf.stack([yc, xc], -1), tf.int32)
            v = tf.gather_nd(im, idx)
            return tf.where(inside[..., None], v,
                            tf.fill(tf.shape(v), fill_value))

        out = ((1 - wy)[..., None] * (1 - wx)[..., None] * gat(y0, x0)
               + (1 - wy)[..., None] * wx[..., None] * gat(y0, x0 + 1)
               + wy[..., None] * (1 - wx)[..., None] * gat(y0 + 1, x0)
               + wy[..., None] * wx[..., None] * gat(y0 + 1, x0 + 1))
        return out

    tfa_img.rotate = _rotate
    tfa.image = tfa_img
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.image"] = tfa_img

    tfplot = types.ModuleType("tfplot")

    def _autowrap(*a, **k):
        def deco(fn):
            return fn
        return deco

    tfplot.autowrap = _autowrap
    sys.modules.setdefault("tfplot", tfplot)

    tifffile_mod = types.ModuleType("tifffile")
    tifffile_mod.imread = lambda p: np.load(patch_npy_path)
    tifffile_mod.tifffile = types.SimpleNamespace(
        imread=lambda p: np.load(patch_npy_path),
        imwrite=lambda *a, **k: None)
    sys.modules["tifffile"] = tifffile_mod

    for p in (REFERENCE, os.path.join(REFERENCE, "automl/efficientdet")):
        if p not in sys.path:
            sys.path.insert(0, p)
    return tf


# ---------------------------------------------------------------------------
# shared data + shared numpy metrics
# ---------------------------------------------------------------------------

def textured_images(b, size, seed):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = []
    for _ in range(b):
        img = np.zeros((size, size, 3), np.float32)
        for _k in range(6):
            a = r.uniform(-0.35, 0.35, 3)
            fy, fx = r.uniform(1.0, 9.0, 2)
            ph = r.uniform(0, 2 * np.pi, 2)
            base = (np.sin(2 * np.pi * fy * yy + ph[0])
                    * np.cos(2 * np.pi * fx * xx + ph[1]))
            img += a[None, None, :] * base[..., None]
        out.append(img)
    return np.clip(np.stack(out), -1, 1).astype(np.float32)


def np_psnr_adr(images, patched, updates, clean_max, adv_max, rec_max):
    """Shared metric code (defense/defender.py:300-341 semantics).

    region: pixels the masker touched = where patched != images.
    recovered = clip(patched + updates*2 ... caller passes 2*unet output).
    clean/adv/rec_max: per-image max detection score after a .55 filter.
    """
    recovered = np.clip(patched + updates, -1.0, 1.0)
    region = (np.abs(patched - images).max(axis=-1) > 1e-6)  # [B,H,W]
    reg = region[..., None].astype(np.float32)
    se = (((recovered - images) ** 2) * reg).sum(axis=(1, 2, 3))
    n_px = reg.sum(axis=(1, 2, 3)) * 3.0
    has_region = n_px > 0
    mse = se / np.maximum(n_px, 1.0)
    psnr_i = 10.0 * np.log10(4.0 / np.maximum(mse, 1e-12))
    psnr = float(psnr_i[has_region].mean()) if has_region.any() else float("nan")
    eligible = (clean_max > 0.55) & has_region
    detected = (rec_max - adv_max) > 0.10
    adr = (float(detected[eligible].mean()) if eligible.any()
           else float("nan"))
    return psnr, adr


def max_above_np(ragged_scores, thresh=0.55):
    out = []
    for s in ragged_scores:
        s = np.asarray(s, np.float32)
        s = s[s >= thresh]
        out.append(float(s.max()) if s.size else 0.0)
    return np.array(out, np.float32)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--val-batches", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/DIFF_DEFENDER.json")
    ap.add_argument("--widen", type=float, default=4.0,
                    help="class-predict kernel widening; larger -> more "
                         "confident detections (ADR needs clean>.55)")
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # the fixed "adversarial" eval patch, shared bit-for-bit
    rng = np.random.default_rng(a.seed + 5)
    eval_patch = rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32)
    eval_scale = 0.4
    os.makedirs("/tmp/diffdef/patch_0_0", exist_ok=True)
    patch_npy = "/tmp/diffdef/patch_0_0/patch.npy"
    np.save(patch_npy, eval_patch)
    with open("/tmp/diffdef/patch_0_0/scale.txt", "w") as f:
        f.write(str(eval_scale))
    with open("/tmp/diffdef/patch_0_0/patch.tiff", "w") as f:
        f.write("")  # tifffile shim reads the .npy instead

    tf = setup_ref_env_real(patch_npy)
    tf.config.threading.set_intra_op_parallelism_threads(0)
    import attack_detection
    import hparams_config as ref_hparams
    from tf2 import efficientdet_keras as ref_keras

    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.ckpt import convert_defense as cd
    from mladversarialobjectdetection_tpu.ckpt import convert_tf
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender as OurDefender)
    from mladversarialobjectdetection_tpu.models import efficientdet

    # -- shared protege ----------------------------------------------------
    ref_cfg = ref_hparams.get_efficientdet_config("efficientdet-lite0")
    ref_cfg.image_size = IMG
    ref_cfg.fpn_cell_repeats = 2
    ref_cfg.box_class_repeats = 2
    ref_cfg.nms_configs.update(NMS_OVERRIDE)
    tf.keras.backend.clear_session()
    tf.random.set_seed(a.seed)
    ref_model = ref_keras.EfficientDetModel(config=ref_cfg)
    ref_model.build((1, IMG, IMG, 3))
    for w in ref_model.weights:
        if "class-predict" in w.name:
            if "kernel" in w.name:
                w.assign(w * a.widen)
            elif "bias" in w.name:
                # +0.5 puts clean max scores ~ sigmoid(.5+spread) > .55 so
                # the ADR eligibility rule (clean > .55) has support
                w.assign(tf.fill(w.shape, 0.5))

    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = IMG
    cfg.fpn_cell_repeats = 2
    cfg.box_class_repeats = 2
    cfg.nms_configs.update(NMS_OVERRIDE)
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    x0 = jnp.zeros((1, IMG, IMG, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x0, training=False)
    tf_weights = convert_tf.tf_weights_from_keras_model(ref_model)
    converted = convert_tf.convert_tf_weights(tf_weights, cfg, spec,
                                              variables, prefer_ema=False)
    print("[setup] protege bridged", flush=True)

    # -- reference defender -------------------------------------------------
    ref_def = attack_detection.PatchAttackDefender(
        ref_model, eval_patch="/tmp/diffdef/patch_0_0",
        visualize_freq=10 ** 9)
    ref_def.cur_step = tf.constant(1, tf.int64)  # never hits the vis cond
    ref_unet = ref_def._antipatch

    # -- ours, bridged to the same U-Net init --------------------------------
    ours = OurDefender(cfg, converted, eval_patch=eval_patch,
                       eval_scale=eval_scale, learning_rate=1e-2)
    dstate = ours.init_state(jax.random.PRNGKey(a.seed + 2))
    v0 = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    conv_unet = cd.convert_unet_weights(cd.keras_unet_weights(ref_unet), v0)
    dstate = dstate._replace(params=conv_unet["params"],
                             batch_stats=conv_unet.get("batch_stats",
                                                       dstate.batch_stats),
                             opt_state=ours.tx.init(conv_unet["params"]))
    print("[setup] U-Net init bridged", flush=True)

    # -- shared batches (identical content + order on both sides) ----------
    n_train = a.steps
    train_batches = [textured_images(a.batch, IMG, seed=1000 + i)
                     for i in range(min(n_train, 40))]
    val_batches = [textured_images(a.batch, IMG, seed=9000 + i)
                   for i in range(a.val_batches)]

    # -- reference train/eval (transcribed from attack_detection.py:168-206,
    #    290-298; Adam 1e-2 per defender_train.py:44) --------------------
    opt = tf.keras.optimizers.legacy.Adam(1e-2) if hasattr(
        tf.keras.optimizers, "legacy") else tf.keras.optimizers.Adam(1e-2)

    @tf.function
    def ref_train_step(images):
        boxes, scores = ref_def.odet_model(images)
        with tf.GradientTape() as tape:
            patched, targets = ref_def._masker([boxes, images], training=True)
            updates = 2.0 * ref_def._antipatch(patched, training=True)
            ft = tf.reshape(targets, (tf.shape(images)[0], -1))
            fu = tf.reshape(updates, (tf.shape(images)[0], -1))
            loss = tf.reduce_sum(tf.reduce_mean((ft - fu) ** 2.0, axis=1))
        grads = tape.gradient(loss, ref_def._trainable_variables)
        opt.apply_gradients(zip(grads, ref_def._trainable_variables))
        return loss

    @tf.function
    def ref_eval_tensors(images):
        boxes, scores = ref_def.odet_model(images)
        patched, targets = ref_def._masker([boxes, images], training=False)
        updates = 2.0 * ref_def._antipatch(patched, training=False)
        ft = tf.reshape(targets, (tf.shape(images)[0], -1))
        fu = tf.reshape(updates, (tf.shape(images)[0], -1))
        loss = tf.reduce_sum(tf.reduce_mean((ft - fu) ** 2.0, axis=1))
        return loss, patched, updates

    def ref_eval(images):
        loss, patched, updates = ref_eval_tensors(tf.constant(images))
        patched = patched.numpy()
        updates = updates.numpy()
        recovered = np.clip(patched + updates, -1, 1)
        _, s_clean = ref_def.odet_model(tf.constant(images), score_thresh=0.)
        _, s_adv = ref_def.odet_model(tf.constant(patched), score_thresh=0.)
        _, s_rec = ref_def.odet_model(tf.constant(recovered), score_thresh=0.)
        psnr, adr = np_psnr_adr(
            images, patched, updates,
            max_above_np(s_clean), max_above_np(s_adv), max_above_np(s_rec))
        return float(loss.numpy()), psnr, adr

    # -- ours train/eval ----------------------------------------------------
    import functools
    our_step = jax.jit(functools.partial(ours.train_step,
                                         with_adv_scores=False))
    our_eval = jax.jit(ours.eval_step)

    def our_eval_all(state):
        rows = []
        for vi, vb in enumerate(val_batches):
            m = our_eval(state, jnp.asarray(vb), batch_idx=vi * 7,
                         det_variables=converted)
            rows.append((float(m.loss), float(m.recovery_psnr),
                         float(m.adr)))
        arr = np.array(rows, np.float64)
        return (float(arr[:, 0].mean()), float(np.nanmean(arr[:, 1])),
                float(np.nanmean(arr[:, 2])))

    def ref_eval_all():
        rows = [ref_eval(vb) for vb in val_batches]
        arr = np.array(rows, np.float64)
        return (float(arr[:, 0].mean()), float(np.nanmean(arr[:, 1])),
                float(np.nanmean(arr[:, 2])))

    record = {"config": {"img": IMG, "batch": a.batch, "steps": a.steps,
                         "eval_every": a.eval_every, "lr": 1e-2,
                         "protege": "efficientdet-lite0@128 widened-random",
                         "unet_init": "bridged (convert_defense)",
                         "eval_patch": "shared fixed random, scale 0.4"},
              "ref": [], "ours": []}

    t0 = time.time()
    for i in range(a.steps):
        imgs = train_batches[i % len(train_batches)]
        loss_r = ref_train_step(tf.constant(imgs))
        dstate, m = our_step(dstate, jnp.asarray(imgs),
                             det_variables=converted)
        if (i + 1) % a.eval_every == 0 or i == 0:
            vr = ref_eval_all()
            vo = our_eval_all(dstate)
            record["ref"].append({"step": i + 1, "val_loss": vr[0],
                                  "psnr": vr[1], "adr": vr[2],
                                  "train_loss": float(loss_r.numpy())})
            record["ours"].append({"step": i + 1, "val_loss": vo[0],
                                   "psnr": vo[1], "adr": vo[2],
                                   "train_loss": float(m.loss)})
            print(f"[{i+1:4d}] ref  val_loss={vr[0]:.4f} psnr={vr[1]:.2f} "
                  f"adr={vr[2]:.2f} | ours val_loss={vo[0]:.4f} "
                  f"psnr={vo[1]:.2f} adr={vo[2]:.2f} "
                  f"({(i+1)/(time.time()-t0):.2f} step/s)", flush=True)
            json.dump(record, open(a.out, "w"), indent=1)
    json.dump(record, open(a.out, "w"), indent=1)
    print(f"[done] {a.out}", flush=True)


if __name__ == "__main__":
    main()
