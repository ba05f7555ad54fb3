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


def test_patcher_window_clamp_bound(ref_env, monkeypatch):
    """Golden bound for the static-window clamp (ops/eot.py geometry notes
    vs the reference's image-width clamp, attacker.py:472).

    Geometry: 128px image, 100px box, scale .9 -> size 90,
    diag_true = sqrt(2)*90 = 127.3. window=96 < diag_true exercises the
    clamped branch the production driver (window 320, attack/train.py)
    can hit on big boxes.

    Pinned bounds proved here:
      (a) rotation 0: the clamped composite still matches the REFERENCE —
          the clamp only cuts sentinel-ring pixels that reveal background
          anyway (the unrotated patch side 90 fits inside the 96 window).
      (b) under rotation (the only case where patch corners leave the
          window): clamped-vs-unclamped deviation is CONFINED to pixels
          outside the centered window region; everything inside matches,
          and the affected area is a corner sliver (< 25% of the patch).
    """
    import jax
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.ops import eot
    tf = ref_env
    imgc = 128
    images = _smooth_images(1, imgc, seed=9)
    boxes_list = [[[14.0, 34.0, 114.0, 94.0]]]  # h=100, centered (64, 64)
    patch = _ramp_patch(64)
    scale = 0.9

    # (a) reference (clamps diag at image width 128 only) vs ours at
    # window=96 AND window=128, rotation 0
    ref_patched = _run_reference_patcher(tf, monkeypatch, images,
                                         boxes_list, patch, scale)
    ours96, _ = _run_ours(images, boxes_list, patch, scale,
                          backend="matmul", window=96)
    ours128, _ = _run_ours(images, boxes_list, patch, scale,
                           backend="matmul", window=128)
    _compare_patched(images, ref_patched, ours96, interior_tol=2e-2)
    _compare_patched(images, ref_patched, ours128, interior_tol=2e-2)

    # (b) fixed nonzero rotation (same key + same rotation_mag -> the two
    # window values draw the IDENTICAL angle; window never enters the
    # geometry key path)
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, 0] = boxes_list[0][0]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True

    def run(window):
        patched, _ = eot.apply_patches(
            jax.random.PRNGKey(3), jnp.asarray(images), jnp.asarray(boxes),
            jnp.asarray(valid), jnp.asarray(patch), scale,
            tolerance=0.0, noise_mag=0.0, brightness_mag=0.0,
            rotation_mag=0.35, print_jitter=False, backend="matmul",
            window=window)
        return np.asarray(patched)

    r96 = run(96)
    r128 = run(128)
    d = np.abs(r96 - r128).max(-1)[0]                      # [H, W]
    yy, xx = np.mgrid[0:imgc, 0:imgc].astype(np.float32)
    dist = np.maximum(np.abs(yy - 64.0), np.abs(xx - 64.0))  # max-norm

    diff = d > 0.05
    assert diff.sum() > 0, (
        "clamped branch not exercised (rotated corners must leave the "
        "96px window at this geometry)")
    # deviation confined OUTSIDE the centered 96 window (small fp margin)
    assert d[dist < 45.0].max() < 2e-2, (
        f"clamp leaked inside the window: {d[dist < 45.0].max():.4f}")
    assert not diff[dist > 66.0].any(), "deviation beyond the true region"
    # corner sliver only: bounded fraction of the patch area
    frac = diff.sum() / (90.0 * 90.0)
    assert frac < 0.25, f"clamped fraction {frac:.3f}"


def test_clamp_frac_metric(ref_env, monkeypatch):
    """PatchAttacker.eot_clamp_frac flags exactly the slots whose
    reference-semantics region exceeds the static window."""
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    import mladversarialobjectdetection_tpu as mad
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 128
    cfg.fpn_num_filters = 16
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.nms_configs.update({"score_thresh": 0.5, "pre_nms_topk": 64,
                            "max_output_size": 16})
    import jax
    from mladversarialobjectdetection_tpu.models import efficientdet
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    v = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 128, 128, 3)), training=False)
    atk = PatchAttacker(cfg, v, patch_size=32, window=96)
    boxes = jnp.asarray([[[14.0, 34.0, 114.0, 94.0],     # diag 127 > 96
                          [10.0, 10.0, 60.0, 44.0],      # diag 63 < 96
                          [0.0, 0.0, 0.0, 0.0],
                          [0.0, 0.0, 0.0, 0.0]]])
    valid = jnp.asarray([[True, True, False, False]])
    nc, nv = atk._clamp_frac(boxes, valid, jnp.asarray(0.9))
    assert float(nc) == 1.0 and float(nv) == 2.0
    # window >= image width -> never "tighter than the reference"
    atk_full = PatchAttacker(cfg, v, patch_size=32, window=128)
    nc2, _ = atk_full._clamp_frac(boxes, valid, jnp.asarray(0.9))
    assert float(nc2) == 0.0
