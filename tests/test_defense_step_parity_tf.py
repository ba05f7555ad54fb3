"""End-to-end DEFENSE-STEP golden parity vs the reference PatchAttackDefender.

The defense twin of test_attack_step_parity_tf.py: on a shared
weight-converted protégé AND a shared weight-converted U-Net, the full
training objective — self-supervised Masker planting -> U-Net forward ->
loss sum_b mean((targets - 2*updates)^2) (attack_detection.py:178-193) —
produces the same loss and the same gradients w.r.t. every trainable
U-Net parameter as the reference tape. Parameter gradients are compared
through the same name-mapping converter the weights use
(ckpt/convert_defense.py): conv kernels map identity, Conv2DTranspose
kernels are flipped+transposed — a permutation, so gradients transform
identically.

Simplifications, each documented where it bites:
  - fixed person boxes feed both maskers (odet-pass parity is asserted
    separately), with the 1px shim from the attack-step test (the Masker
    has the same integer-snap truncation chain, attack_detection.py:403,
    416-418, 459)
  - the U-Net runs training=False on both sides (frozen BN stats, no
    dropout): the reference trains with training=True, but batch-stats
    updates and live dropout draw RNG that cannot be pinned across
    frameworks; the backward through every trainable parameter is
    exercised identically either way.

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
    _build_ref_unet, _our_unet, _pin_reference_rng, ref_env)
from test_attack_step_parity_tf import (  # noqa: E402,F401
    IMG, _textured_images, victim_pair)


def test_defender_first_pass_parity(victim_pair, ref_env, tmp_path):
    """odet_model (pre_nms -> person filter -> NMS -> valid filter,
    attack_detection.py:94-127 — note: NMS before the validity filter,
    the reverse of the attacker's order) agrees with our odet_boxes."""
    import attack_detection
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender)
    tf = ref_env
    ref_model, ref_cfg, cfg, converted = victim_pair

    eval_dir = tmp_path / "patch_0_0"
    eval_dir.mkdir()
    (eval_dir / "scale.txt").write_text("0.4")
    (eval_dir / "patch.tiff").write_text("")  # tifffile stub ignores it
    ref_def = attack_detection.PatchAttackDefender(
        ref_model, eval_patch=str(eval_dir))

    ours = PatchAttackDefender(cfg, converted)
    images = _textured_images(2, IMG, seed=41)
    rb, rs = ref_def.odet_model(np.asarray(images))
    ob, os_, ov = map(np.asarray, ours.odet_boxes(jnp.asarray(images)))

    for i in range(images.shape[0]):
        ref_scores = np.asarray(rs[i])
        ref_boxes = np.asarray(rb[i])
        n = int(ov[i].sum())
        assert n == len(ref_scores), (
            f"image {i}: {n} vs {len(ref_scores)} detections")
        assert n > 0, "protege must detect something for this test to bite"
        assert np.abs(os_[i][:n] - ref_scores).max() < 2e-3
        assert np.abs(ob[i][:n] - ref_boxes).max() < 0.2


def test_defense_step_loss_and_gradients_parity(victim_pair, ref_env,
                                                monkeypatch):
    """Loss + every trainable U-Net parameter gradient match the reference
    tape over the composed Masker -> U-Net -> MSE objective."""
    import attack_detection
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from mladversarialobjectdetection_tpu.ckpt import convert_defense as cd
    from mladversarialobjectdetection_tpu.defense import masker as masker_lib

    _, _, cfg, _ = victim_pair  # protégé unused: boxes are fixed
    _pin_reference_rng(monkeypatch, tf)

    ref_unet = _build_ref_unet(ref_env, image_size=IMG, seed=7)
    m, v_tmpl = _our_unet(image_size=IMG)
    v = cd.convert_unet_weights(cd.keras_unet_weights(ref_unet), v_tmpl)

    images = _textured_images(2, IMG, seed=42)
    boxes_list = [[[10.0, 14.0, 50.0, 30.0]],
                  [[20.0, 24.0, 60.0, 40.0]]]

    # ---- reference: attack_detection.py:178-193 (training masker path,
    # U-Net at training=False — see module docstring)
    masker = attack_detection.Masker(np.zeros((8, 8, 3), np.float32), 0.4,
                                     name="Masker")
    ragged = tf.ragged.constant(boxes_list, ragged_rank=1, inner_shape=(4,),
                                dtype=tf.float32)
    with tf.GradientTape() as tape:
        patched_ref, targets_ref = masker([ragged, tf.constant(images)],
                                          training=True)
        updates = 2.0 * ref_unet(patched_ref, training=False)
        flat_t = tf.reshape(targets_ref, (2, -1))
        flat_u = tf.reshape(updates, (2, -1))
        loss_ref = tf.reduce_sum(tf.reduce_mean((flat_t - flat_u) ** 2,
                                                axis=1))
    ref_grads = tape.gradient(loss_ref, ref_unet.trainable_variables)
    loss_ref = float(loss_ref)
    patched_ref_np = np.asarray(patched_ref)
    targets_ref_np = np.asarray(targets_ref)

    # map reference gradients into our tree through the weight converter
    # (non-trainables — BN moving stats — carry zeros)
    grad_by_name = {w.name: g for w, g in
                    zip(ref_unet.trainable_variables, ref_grads)}
    grad_dict = {}
    for w in ref_unet.weights:
        name = w.name[:-2] if w.name.endswith(":0") else w.name
        g = grad_by_name.get(w.name)
        grad_dict[name] = (np.asarray(g) if g is not None
                           else np.zeros(w.shape, np.float32))
    ref_grads_ours = cd.convert_unet_weights(grad_dict, v_tmpl)["params"]

    # ---- ours: product pieces with pinned masker randomness + 1px shim
    bx = np.zeros((2, 1, 4), np.float32)
    bv = np.ones((2, 1), bool)
    for i, bl in enumerate(boxes_list):
        bx[i, 0] = np.asarray(bl[0], np.float32) - 1.0

    patched_o, targets_o = masker_lib.apply_masker(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(bx),
        jnp.asarray(bv), training=True, train_patches=jnp.asarray(images),
        random_scale_range=None, adv_scale_override=0.4, tolerance=0.0,
        noise_mag=0.0, brightness_mag=0.0, rotation_mag=0.0,
        print_jitter=False, backend="matmul", window=IMG)
    # forward alignment guard (same 1px shim argument as the attack test)
    assert np.abs(np.asarray(patched_o) - patched_ref_np).max() < 0.02
    assert np.abs(np.asarray(targets_o) - targets_ref_np).max() < 0.02

    batch_stats = v.get("batch_stats", {})

    def loss_fn(params):
        updates = m.apply({"params": params, "batch_stats": batch_stats},
                          patched_o, False)
        flat_u = (2.0 * updates).reshape(2, -1)
        flat_t = targets_o.reshape(2, -1)
        return jnp.sum(jnp.mean((flat_t - flat_u) ** 2, axis=1))

    loss_ours, grads_ours = jax.value_and_grad(loss_fn)(v["params"])
    loss_ours = float(loss_ours)

    assert abs(loss_ours - loss_ref) / abs(loss_ref) < 1e-3, (
        f"loss {loss_ours} vs {loss_ref}")

    # per-leaf gradient agreement across the whole U-Net
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads_ours)
    flat_our = dict(jax.tree_util.tree_leaves_with_path(grads_ours))
    checked = 0
    gmax = max(float(jnp.abs(l).max())
               for _, l in flat_ref if l.size and float(jnp.abs(l).max()) > 0)
    for path, ref_leaf in flat_ref:
        our_leaf = flat_our[path]
        d = float(jnp.abs(jnp.asarray(ref_leaf) - our_leaf).max())
        assert d < 5e-3 * gmax, (
            f"{jax.tree_util.keystr(path)}: grad diff {d:.3e} "
            f"(global max {gmax:.3e})")
        checked += 1
    assert checked >= 100  # the whole 4-enc/4-dec U-Net, not a corner
