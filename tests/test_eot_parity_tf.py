"""Golden parity for the ATTACK-side EOT compositor vs the reference Patcher.

The defense Masker earned reference-pinned golden parity in
test_defense_parity_tf.py; this module gives the attack-side transform
stack (attacker.py:344-498 `Patcher`) the same treatment. It exercises the
parts the Masker never touches: the print transform (random_print_adjust,
attacker.py:365-372), the scene BrightnessMatcher inside the compositing
pipeline (attacker.py:384-387), the sqrt(2) rotation-diagonal region
geometry (attacker.py:470), and the -2 sentinel pad ring that reveals
background around the patch interior (attacker.py:431-440).

Method (same as the Masker tests): run the reference `attacker.Patcher`
with every RNG pinned to its distribution mean (print gain .5/bias 0, zero
center jitter, zero sensor noise, identity random_brightness, zero
rotation) against `ops/eot.apply_patches` with the matching pinning hooks
(print_jitter=False, tolerance=0, noise_mag=0, brightness_mag=0,
rotation_mag=0), and require the patched images to agree on eroded patch
interiors. The reference quantizes placement to integer pixels
(tf.cast at attacker.py:418) while ours is continuous, so a small boundary
band is eroded; constant and linear-ramp patches make the comparison
resampling-filter independent (tf.image.resize(antialias=True) and both of
our backends have linear precision).

Covers BOTH our backends: `gather` (the straight-line reference
formulation) and `matmul` (the production two-pass MXU warp, including the
canvas pre-downsampling path).

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

# shared reference-import shim + RNG pinning + fixtures (importing the
# fixture function registers it in this module for pytest)
from test_defense_parity_tf import (  # noqa: E402,F401
    _erode, _pin_reference_rng, _smooth_images, ref_env)


def _run_reference_patcher(tf, monkeypatch, images, boxes_list, patch,
                           scale):
    """Reference Patcher with pinned RNG (attacker.py:344-498)."""
    import attacker
    _pin_reference_rng(monkeypatch, tf)
    patcher = attacker.Patcher(tf.constant(patch.astype(np.float32)),
                               tf.constant(float(scale)), name="Patcher")
    ragged = tf.ragged.constant(boxes_list, ragged_rank=1, inner_shape=(4,),
                                dtype=tf.float32)
    patched = patcher([ragged, tf.constant(images)])
    return np.asarray(patched)


def _run_ours(images, boxes_list, patch, scale, *, backend, max_boxes=4,
              **kw):
    import jax
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.ops import eot
    b = images.shape[0]
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    valid = np.zeros((b, max_boxes), bool)
    for i, bl in enumerate(boxes_list):
        for j, bx in enumerate(bl):
            boxes[i, j] = bx
            valid[i, j] = True
    patched, region = eot.apply_patches(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(boxes),
        jnp.asarray(valid), jnp.asarray(patch), scale,
        tolerance=0.0, noise_mag=0.0, brightness_mag=0.0,
        rotation_mag=0.0, print_jitter=False, backend=backend, **kw)
    return np.asarray(patched), np.asarray(region)


def _compare_patched(images, ref_patched, our_patched, interior_tol,
                     band=3):
    """Interior agreement of the composited patches (defense-test method)."""
    ref_mask = np.abs(ref_patched - images).max(-1) > 1e-6
    our_mask = np.abs(our_patched - images).max(-1) > 1e-6
    for i in range(images.shape[0]):
        inter = ref_mask[i] & our_mask[i]
        union = ref_mask[i] | our_mask[i]
        assert inter.sum() > 100, "patched areas should overlap"
        iou = inter.sum() / union.sum()
        assert iou > 0.85, f"patched-region IoU {iou:.3f}"
        interior = _erode(inter, band)
        assert interior.sum() > 50, "interior should be non-empty"
        d = np.abs(ref_patched[i] - our_patched[i]).max(-1)
        assert d[interior].max() < interior_tol, (
            f"interior patched diff {d[interior].max():.4f}")


BOXES_2IMG = [[[20.0, 30.0, 100.0, 70.0]],
              [[40.0, 50.0, 110.0, 120.0], [10.0, 10.0, 60.0, 44.0]]]


def _ramp_patch(p=64):
    yy, xx = np.mgrid[0:p, 0:p].astype(np.float32) / p
    return np.stack([yy - 0.5, xx - 0.5, 0.5 * (yy + xx) - 0.5],
                    axis=-1).astype(np.float32)


def test_patcher_constant_patch_gather(ref_env, monkeypatch):
    """Constant patch through print (.5 gain) + scene brightness match +
    composite: filter-independent interior equality, gather backend."""
    tf = ref_env
    images = _smooth_images(2, 128, seed=11)
    patch = np.full((64, 64, 3), 0.37, np.float32)
    ref_p = _run_reference_patcher(tf, monkeypatch, images, BOXES_2IMG,
                                   patch, 0.4)
    our_p, region = _run_ours(images, BOXES_2IMG, patch, 0.4,
                              backend="gather")
    _compare_patched(images, ref_p, our_p, interior_tol=0.02)
    # the region mask must cover every reference-composited pixel
    ref_mask = np.abs(ref_p - images).max(-1) > 1e-6
    assert (ref_mask & ~region).mean() < 1e-3


def test_patcher_ramp_patch_gather(ref_env, monkeypatch):
    """Linear-ramp patch: any coordinate-mapping error (flip/transpose/
    offset) in the warp shows up as a large interior diff."""
    tf = ref_env
    images = _smooth_images(2, 128, seed=12)
    patch = _ramp_patch()
    boxes = [[[24.0, 16.0, 104.0, 72.0]], [[30.0, 40.0, 96.0, 116.0]]]
    ref_p = _run_reference_patcher(tf, monkeypatch, images, boxes, patch,
                                   0.45)
    our_p, _ = _run_ours(images, boxes, patch, 0.45, backend="gather")
    _compare_patched(images, ref_p, our_p, interior_tol=0.08)


def test_patcher_constant_patch_matmul(ref_env, monkeypatch):
    """The PRODUCTION matmul backend (two-pass MXU warp in a static
    window) against the reference — bf16 hat-weight quantization bounds
    the extra tolerance."""
    tf = ref_env
    images = _smooth_images(2, 128, seed=13)
    patch = np.full((64, 64, 3), 0.37, np.float32)
    ref_p = _run_reference_patcher(tf, monkeypatch, images, BOXES_2IMG,
                                   patch, 0.4)
    our_p, _ = _run_ours(images, BOXES_2IMG, patch, 0.4, backend="matmul",
                         window=64)
    _compare_patched(images, ref_p, our_p, interior_tol=0.03)


def test_patcher_ramp_patch_matmul_downsampled_canvas(ref_env, monkeypatch):
    """matmul backend with the canvas pre-downsampling path active
    (canvas_res < patch size): triangle filters have linear precision, so
    the ramp survives the two-stage resampling in the interior."""
    tf = ref_env
    images = _smooth_images(2, 128, seed=14)
    patch = _ramp_patch()
    boxes = [[[24.0, 16.0, 104.0, 72.0]], [[30.0, 40.0, 96.0, 116.0]]]
    ref_p = _run_reference_patcher(tf, monkeypatch, images, boxes, patch,
                                   0.45)
    our_p, _ = _run_ours(images, boxes, patch, 0.45, backend="matmul",
                         window=64, canvas_res=32)
    _compare_patched(images, ref_p, our_p, interior_tol=0.10)


def test_patcher_patch_gradient_parity(ref_env, monkeypatch):
    """d(sum of patched image)/d(patch) agrees with the reference tape —
    the gradient that actually trains the attack (attacker.py:217).

    Uses the PRODUCTION matmul backend at full canvas resolution: its
    triangle filter widens with the downscale ratio exactly like the
    reference's tf.image.resize(antialias=True) (attacker.py:425), so the
    per-pixel gradient footprints match; the `gather` backend is plain
    bilinear (radius 1) and would disagree pixelwise under downscaling.
    Compared on the eroded canvas interior (integer-vs-continuous placement
    shifts the footprint by <1px at the edges) plus total gradient mass.
    """
    import attacker
    import jax
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.ops import eot
    tf = ref_env
    images = _smooth_images(1, 128, seed=16)
    patch = 0.6 * _ramp_patch()
    boxes = [[[24.0, 16.0, 104.0, 72.0]]]
    scale = 0.45

    _pin_reference_rng(monkeypatch, tf)
    pvar = tf.Variable(patch)
    patcher = attacker.Patcher(pvar, tf.constant(scale), name="Patcher")
    ragged = tf.ragged.constant(boxes, ragged_rank=1, inner_shape=(4,),
                                dtype=tf.float32)
    with tf.GradientTape() as tape:
        out = patcher([ragged, tf.constant(images)])
        loss = tf.reduce_sum(out)
    ref_g = tape.gradient(loss, pvar).numpy()

    bx = np.zeros((1, 4, 4), np.float32)
    bv = np.zeros((1, 4), bool)
    bx[0, 0] = boxes[0][0]
    bv[0, 0] = True

    def our_loss(p):
        patched, _ = eot.apply_patches(
            jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(bx),
            jnp.asarray(bv), p, scale, tolerance=0.0, noise_mag=0.0,
            brightness_mag=0.0, rotation_mag=0.0, print_jitter=False,
            backend="matmul", window=64, canvas_res=patch.shape[0])
        return jnp.sum(patched)

    our_g = np.asarray(jax.grad(our_loss)(jnp.asarray(patch)))

    # the SIGNED gradient sum is ~0 by construction (the brightness
    # matcher's mean-shift term cancels the Y-channel sum), so compare
    # total |gradient| mass and the pixelwise field. Measured deltas:
    # abs-sum ratio 1.0024, pixelwise rel max 0.0115 (bf16 hat-weight
    # quantization in the MXU einsums).
    abs_ratio = np.abs(our_g).sum() / np.abs(ref_g).sum()
    assert abs(abs_ratio - 1.0) < 0.01, f"|grad| mass ratio {abs_ratio:.4f}"
    scale_g = np.abs(ref_g).max()
    rel = np.abs(ref_g - our_g).max() / scale_g
    assert rel < 0.03, f"gradient relative diff {rel:.4f}"


def test_patcher_min_area_culling_matches(ref_env, monkeypatch):
    """A box whose patch lands at or below min_patch_area (4 px) is culled
    by both implementations (attacker.py:392-394)."""
    tf = ref_env
    images = _smooth_images(1, 128, seed=15)
    patch = np.full((64, 64, 3), 0.37, np.float32)
    # longer side 10 * scale .2 -> size 2 -> area 4, not > 4 -> culled
    boxes = [[[20.0, 20.0, 30.0, 28.0]]]
    ref_p = _run_reference_patcher(tf, monkeypatch, images, boxes, patch,
                                   0.2)
    our_p, region = _run_ours(images, boxes, patch, 0.2, backend="gather")
    assert np.abs(ref_p - images).max() < 1e-6
    assert np.abs(our_p - images).max() < 1e-6
    assert not region.any()
