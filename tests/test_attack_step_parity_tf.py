"""End-to-end ATTACK-STEP golden parity vs the reference PatchAttacker.

The deepest proof in the suite: on a shared weight-converted victim, the
full attack objective — EOT patch compositing -> second detector pass ->
person/validity masking -> loss sum(max^2 + (max - scale)^2) + 1e-5*TV
(attacker.py:182-193) — produces the same loss and the same gradients
w.r.t. the two trainable tensors (scale, patch) as the reference tape.
Component parity (detector fwd/bwd, pre_nms, NMS, EOT fwd/grad, loss
algebra) exists piecewise elsewhere; this pins their COMPOSITION.

Setup notes:
  - the victim pair is built like test_parity_tf._build_pair but as
    EfficientDetModel (the class the reference attacks through,
    attacker.py:98 `self.model(images, pre_mode=None, post_mode=None)`),
    with the class-predict head widened (kernel x4, bias -1) so sigmoid
    scores spread over (0,1) — a stock random init sits at the -4.6
    focal-bias floor where every anchor scores ~0.01 and NMS selection
    order is decided by sub-1e-4 noise.
  - first-pass parity runs the reference's actual
    first_pass/_postprocessing (attacker.py:91-116,143-170) against ours.
  - the loss/gradient golden feeds FIXED person boxes to both
    compositors (decoupling it from NMS tie-breaks) and pins all EOT
    randomness to distribution means on both sides; the reference tape
    replicates attacker.py:182-193 line-for-line over the reference
    Patcher + EfficientDetModel.
  - tolerances are dominated by the EOT compositors' documented
    sub-pixel/bf16 differences amplified through the widened detector;
    semantic errors (wrong masking, missing stop_gradient, wrong loss
    aggregation) move these by orders of magnitude.

Skipped automatically when the reference tree or TF is unavailable.
"""
import os

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference tree not available"),
]

from test_defense_parity_tf import (  # noqa: E402,F401
    _pin_reference_rng, _smooth_images, ref_env)

NMS_OVERRIDE = {"iou_thresh": 0.5, "score_thresh": 0.05,
                "max_nms_inputs": 0, "max_output_size": 100}
IMG = 64


@pytest.fixture(scope="module")
def victim_pair(ref_env):
    """(ref EfficientDetModel, ref config, our config, our attacker args)"""
    tf = ref_env
    import hparams_config as ref_hparams
    from tf2 import efficientdet_keras as ref_keras

    import jax
    import jax.numpy as jnp
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.ckpt import convert_tf
    from mladversarialobjectdetection_tpu.models import efficientdet

    ref_cfg = ref_hparams.get_efficientdet_config("efficientdet-lite0")
    ref_cfg.image_size = IMG
    ref_cfg.fpn_cell_repeats = 2
    ref_cfg.box_class_repeats = 2
    ref_cfg.nms_configs.update(NMS_OVERRIDE)
    tf.keras.backend.clear_session()
    tf.random.set_seed(0)
    ref_model = ref_keras.EfficientDetModel(config=ref_cfg)
    ref_model.build((1, IMG, IMG, 3))
    # widen the class head so scores spread over (0,1) (see module doc)
    for w in ref_model.weights:
        if "class-predict" in w.name:
            if "kernel" in w.name:
                w.assign(w * 4.0)
            elif "bias" in w.name:
                w.assign(tf.fill(w.shape, -1.0))

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
    return ref_model, ref_cfg, cfg, converted


def _our_attacker(cfg, converted, **kw):
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    return PatchAttacker(cfg, converted, patch_size=IMG, **kw)


def _textured_images(b, size, seed):
    """Scenes with energy at anchor-scale frequencies so top-anchor
    margins are decided by content, not sub-1e-5 noise."""
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


def test_first_pass_parity(victim_pair):
    """Clean-pass person detections (pre_nms -> person filter ->
    filter_valid_boxes -> NMS -> clip, attacker.py:91-116,143-170) agree:
    same count, same scores, same boxes per image."""
    import attacker as ref_attacker_mod
    import jax.numpy as jnp
    ref_model, ref_cfg, cfg, converted = victim_pair
    ref_att = ref_attacker_mod.PatchAttacker(ref_model)
    ours = _our_attacker(cfg, converted)

    images = _smooth_images(2, IMG, seed=31)
    rb, rs = ref_att.first_pass(np.asarray(images))
    ob, os_, ov = map(np.asarray, ours.first_pass(jnp.asarray(images)))

    for i in range(images.shape[0]):
        ref_scores = np.asarray(rs[i])
        ref_boxes = np.asarray(rb[i])
        n = int(ov[i].sum())
        assert n == len(ref_scores), (
            f"image {i}: {n} vs {len(ref_scores)} detections")
        assert n > 0, "victim must detect something for this test to bite"
        assert np.abs(os_[i][:n] - ref_scores).max() < 2e-3
        assert np.abs(ob[i][:n] - ref_boxes).max() < 0.2  # px


def test_attack_loss_and_gradients_parity(victim_pair, monkeypatch):
    """The full differentiable attack objective and its (scale, patch)
    gradients match the reference tape on fixed person boxes with pinned
    EOT randomness (attacker.py:182-193 + Patcher + second_pass).

    Placement alignment: the reference snaps the patch region to integer
    pixels (int casts at attacker.py:418, diag truncation + floor/ceil pad
    at attacker.py:431-433) while our compositor is continuous — for the
    geometries below (size 16, diag int 22, pad 3) the reference paints
    exactly 1px up-left of the true center, so OUR boxes are shifted by
    -1px on both axes to make the painted regions identical. The forward
    assert (patched images equal everywhere to bf16 tolerance) guards the
    alignment; without it the comparison is still valid but the patch
    gradients decorrelate under the detector's oscillatory input-gradient
    field (a 1px footprint shift — measured cos .82 / |mass| ratio 1.46)."""
    import attacker as ref_attacker_mod
    import jax
    import jax.numpy as jnp
    from tf2 import postprocess as ref_pp
    import tensorflow as tf  # ref_env (via victim_pair) already configured it

    ref_model, ref_cfg, cfg, converted = victim_pair
    _pin_reference_rng(monkeypatch, tf)

    images = _textured_images(2, IMG, seed=33)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / IMG
    # every channel slopes along BOTH axes: jnp.abs's subgradient at
    # exactly 0 is +1 while tf's is 0, so a patch with exact-zero
    # adjacent-pixel differences makes the 1e-5*TV term's gradients
    # diverge by convention (measured: it then DOMINATES the patch
    # gradient mass, ratio 1.49) — a measure-zero artifact real patches
    # never hit
    patch0 = (0.4 * np.stack([yy + 0.04 * xx - 0.52,
                              xx + 0.06 * yy - 0.53,
                              0.5 * (yy + xx) - 0.5],
                             axis=-1)).astype(np.float32)
    scale0 = 0.4
    # one box per image, longer side 40 -> patch size floor(40*.4) = 16
    boxes_list = [[[10.0, 14.0, 50.0, 30.0]],
                  [[20.0, 24.0, 60.0, 40.0]]]

    # ---- reference tape: attacker.py:182-193 over Patcher + second_pass
    pvar = tf.Variable(patch0)
    svar = tf.Variable(scale0)
    patcher = ref_attacker_mod.Patcher(pvar, svar, name="Patcher")
    ragged = tf.ragged.constant(boxes_list, ragged_rank=1, inner_shape=(4,),
                                dtype=tf.float32)
    with tf.GradientTape() as tape:
        patched_ref = patcher([ragged, tf.constant(images)])
        cls_out, box_out = ref_model(patched_ref, pre_mode=None,
                                     post_mode=None)
        b2, s2, c2 = ref_pp.pre_nms(ref_cfg.as_dict(),
                                    ref_pp.to_list(cls_out),
                                    ref_pp.to_list(box_out))
        person = tf.equal(c2, 0)
        s2 = tf.ragged.boolean_mask(s2, person)
        b2 = tf.ragged.boolean_mask(b2, person)
        # filter_valid_boxes, thresh=False (attacker.py:79-89,138)
        bh = b2[:, :, 2] - b2[:, :, 0]
        bw = b2[:, :, 3] - b2[:, :, 1]
        cond = (tf.less_equal(bw / IMG, 1.0) & tf.less_equal(bh / IMG, 1.0)
                & tf.greater(bh * bw, 100.0))
        s2 = tf.ragged.boolean_mask(s2, cond)
        max_scores_ref = tf.maximum(tf.reduce_max(s2, axis=1), 0.0)
        loss_ref = (tf.reduce_sum(max_scores_ref ** 2
                                  + (max_scores_ref - svar) ** 2)
                    + 1e-5 * tf.image.total_variation(pvar.value()))
    g_scale_ref, g_patch_ref = tape.gradient(loss_ref, [svar, pvar])
    loss_ref = float(loss_ref)
    max_ref = np.asarray(max_scores_ref)
    g_scale_ref = float(g_scale_ref)
    g_patch_ref = np.asarray(g_patch_ref)
    patched_ref_np = np.asarray(patched_ref)

    # reference d(loss)/d(patched image) at the composited image (for the
    # same-base input-gradient assert below)
    x_in = tf.constant(patched_ref_np)
    with tf.GradientTape() as tape2:
        tape2.watch(x_in)
        cls_out, box_out = ref_model(x_in, pre_mode=None, post_mode=None)
        b2, s2, c2 = ref_pp.pre_nms(ref_cfg.as_dict(),
                                    ref_pp.to_list(cls_out),
                                    ref_pp.to_list(box_out))
        person = tf.equal(c2, 0)
        s2 = tf.ragged.boolean_mask(s2, person)
        b2 = tf.ragged.boolean_mask(b2, person)
        bh = b2[:, :, 2] - b2[:, :, 0]
        bw = b2[:, :, 3] - b2[:, :, 1]
        cond = (tf.less_equal(bw / IMG, 1.0) & tf.less_equal(bh / IMG, 1.0)
                & tf.greater(bh * bw, 100.0))
        s2 = tf.ragged.boolean_mask(s2, cond)
        mx = tf.maximum(tf.reduce_max(s2, axis=1), 0.0)
        li = tf.reduce_sum(mx ** 2 + (mx - svar) ** 2)
    gi_ref = np.asarray(tape2.gradient(li, x_in))

    # ---- ours: the product loss (_loss_from_images) with pinned EOT;
    # boxes shifted -1px (both axes) to align with the reference's
    # integer-snapped placement (see docstring)
    from mladversarialobjectdetection_tpu.ops import eot
    ours = _our_attacker(
        cfg, converted, tolerance=0.0,
        eot_overrides=dict(noise_mag=0.0, brightness_mag=0.0,
                           rotation_mag=0.0, print_jitter=False))
    bx = np.zeros((2, 1, 4), np.float32)
    bv = np.ones((2, 1), bool)
    for i, bl in enumerate(boxes_list):
        bx[i, 0] = np.asarray(bl[0], np.float32) - 1.0

    # forward alignment guard: the two compositors paint the SAME pixels
    # with the same values (bf16 hat-weight tolerance)
    patched_ours, _ = eot.apply_patches(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(bx),
        jnp.asarray(bv), jnp.asarray(patch0), scale0, tolerance=0.0,
        noise_mag=0.0, brightness_mag=0.0, rotation_mag=0.0,
        print_jitter=False, backend="matmul", window=IMG)
    fwd_diff = np.abs(np.asarray(patched_ours) - patched_ref_np).max()
    assert fwd_diff < 0.02, (
        f"patched images diverge ({fwd_diff:.4f}) — placement alignment "
        "broke; see docstring")

    # same-base input-gradient parity: d(loss)/d(patched image) through
    # OUR second_pass/pre_nms/mask/max at the reference's patched image —
    # pins the detector half of the composition in attack context
    def img_loss(x):
        _, adv_masked = ours.second_pass_scores(x)
        mx = jnp.maximum(jnp.max(adv_masked, axis=1), 0.0)
        return jnp.sum(mx ** 2 + (mx - jnp.asarray(scale0)) ** 2)

    gi = np.asarray(jax.grad(img_loss)(jnp.asarray(patched_ref_np)))
    rel_gi = np.abs(gi - gi_ref).max() / np.abs(gi_ref).max()
    assert rel_gi < 1e-3, f"same-base input-grad rel diff {rel_gi:.2e}"

    def loss_fn(trainables):
        scale, patch = trainables
        return ours._loss_from_images(patch, scale, jnp.asarray(images),
                                      jnp.asarray(bx), jnp.asarray(bv),
                                      jax.random.PRNGKey(0))

    (loss_ours, aux), (g_scale, g_patch) = jax.value_and_grad(
        loss_fn, has_aux=True)((jnp.asarray(scale0), jnp.asarray(patch0)))
    loss_ours = float(loss_ours)
    max_ours = np.asarray(aux["max_scores"])
    g_scale = float(g_scale)
    g_patch = np.asarray(g_patch)

    # fixture sanity: both images must contribute a live max anchor
    assert (max_ref > 0.1).all(), f"dead image in fixture: {max_ref}"
    # per-image peak patched person scores (the quantity the attack
    # minimizes) and the assembled loss (measured deltas ~2e-5 / ~1e-5)
    assert np.abs(max_ours - max_ref).max() < 0.01, (
        f"max_scores {max_ours} vs {max_ref}")
    assert abs(loss_ours - loss_ref) / abs(loss_ref) < 0.02, (
        f"loss {loss_ours} vs {loss_ref}")
    # scale gradient: -2*sum(max - scale) through the same max
    assert abs(g_scale - g_scale_ref) < 0.02 * max(1.0, abs(g_scale_ref)), (
        f"scale grad {g_scale} vs {g_scale_ref}")
    # end-to-end patch gradient field (measured: ratio 1-6e-7,
    # cos .99999, rel 1.1e-5)
    ratio = np.abs(g_patch).sum() / np.abs(g_patch_ref).sum()
    assert abs(ratio - 1.0) < 0.03, f"|grad| mass ratio {ratio:.3f}"
    cos = (g_patch * g_patch_ref).sum() / (
        np.linalg.norm(g_patch) * np.linalg.norm(g_patch_ref) + 1e-12)
    assert cos > 0.995, f"patch-grad cosine {cos:.4f}"
    rel = np.abs(g_patch - g_patch_ref).max() / np.abs(g_patch_ref).max()
    assert rel < 0.1, f"pixelwise patch-grad rel diff {rel:.3f}"
