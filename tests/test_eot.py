"""EOT compositor tests (Patcher/Masker semantics, attacker.py:344-498)."""
import jax
import jax.numpy as jnp
import numpy as np

from mladversarialobjectdetection_tpu.defense import masker
from mladversarialobjectdetection_tpu.ops import eot


def _setup(b=2, hw=64, p=32):
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (b, hw, hw, 3), minval=-1, maxval=1)
    boxes = jnp.array([[[8, 8, 40, 40], [0, 0, 0, 0]],
                       [[10, 20, 50, 60], [5, 5, 20, 20]]], jnp.float32)
    valid = jnp.array([[True, False], [True, True]])
    patch = jax.random.uniform(jax.random.PRNGKey(1), (p, p, 3),
                               minval=-1, maxval=1)
    return key, imgs, boxes, valid, patch


def test_geometry_in_bounds():
    key, imgs, boxes, valid, _ = _setup()
    geom = eot.make_patch_geometry(key, boxes[0], valid[0], 0.5, (64, 64))
    assert bool(geom.valid[0]) and not bool(geom.valid[1])
    assert float(geom.ymin[0]) >= 0
    assert float(geom.ymin[0] + geom.diag[0]) <= 64 + 1e-3
    # size = floor(32 * .5) = 16, diag = sqrt(2)*16
    assert float(geom.size[0]) == 16.0
    assert np.isclose(float(geom.diag[0]), 16 * np.sqrt(2), atol=1e-4)


def test_min_area_culling():
    key = jax.random.PRNGKey(0)
    boxes = jnp.array([[10, 10, 14, 14]], jnp.float32)  # 4x4 box
    valid = jnp.array([True])
    geom = eot.make_patch_geometry(key, boxes, valid, 0.5, (64, 64))
    # size = floor(4*.5) = 2 -> area 4 <= min_patch_area 4 -> culled
    assert not bool(geom.valid[0])


def test_compositing_localized():
    key, imgs, boxes, valid, patch = _setup()
    out, region = eot.apply_patches(key, imgs, boxes, valid, patch, 0.5)
    changed = jnp.any(jnp.abs(out - imgs) > 1e-6, axis=-1)
    # nothing changes outside the reported regions
    assert not bool(jnp.any(changed & ~region))
    # image 0 slot 2 invalid -> the 5..20 box of image 0 untouched
    assert bool(jnp.any(changed[0]))
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_invalid_boxes_never_patched():
    key, imgs, boxes, _, patch = _setup()
    none_valid = jnp.zeros((2, 2), bool)
    out, region = eot.apply_patches(key, imgs, boxes, none_valid, patch, 0.5)
    assert np.allclose(out, imgs)
    assert not bool(region.any())


def test_gradient_flows_to_patch():
    key, imgs, boxes, valid, patch = _setup()

    def loss(p):
        out, _ = eot.apply_patches(key, imgs, boxes, valid, p, 0.5)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(patch)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g)) > 0


def test_zero_scale_is_noop():
    key, imgs, boxes, valid, patch = _setup()
    out, _ = eot.apply_patches(key, imgs, boxes, valid, patch, 0.0)
    assert np.allclose(out, imgs)


def _backend_pair(patch, scale, *, pin_rotation):
    """Run both EOT backends with shared keys/geometry, noise off.

    Alignment conditions (see ops/eot.py geometry notes): patch side ==
    canvas_res so the matmul backend's pre-downsample is the identity;
    scale chosen so every slot upscales (rho = canvas/size <= 1), where
    the antialiasing triangle radius collapses to plain bilinear — the
    gather backend's kernel; and every region diag fits the matmul window
    (the backends clamp the region to window vs image width respectively).
    Calls the unjitted function so pin_rotation can't hit a stale jit
    cache."""
    b, hw = 2, 96
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (b, hw, hw, 3),
                              minval=-1, maxval=1)
    # box long sides 52/52/44: at scale .75 -> sizes 39/39/33 (all >= 32)
    # and diags <= 56 (< window 80)
    boxes = jnp.array([[[8., 8., 60., 60.], [0., 0., 0., 0.]],
                       [[20., 30., 72., 82.], [4., 4., 44., 48.]]])
    valid = jnp.array([[True, False], [True, True]])
    key = jax.random.PRNGKey(6)
    kwargs = dict(tolerance=0.2, noise_mag=0.0, brightness_mag=0.3,
                  canvas_res=patch.shape[0])
    fn = eot.apply_patches.__wrapped__  # unjitted
    if pin_rotation:
        kwargs["rotation_mag"] = 0.0
    out_mm, reg_mm = fn(key, imgs, boxes, valid, patch, scale,
                        backend="matmul", window=80, **kwargs)
    out_g, reg_g = fn(key, imgs, boxes, valid, patch, scale,
                      backend="gather", window=None, **kwargs)
    return imgs, out_mm, reg_mm, out_g, reg_g


def _compare_backends(imgs, out_mm, reg_mm, out_g, reg_g, tol):
    assert np.array_equal(np.asarray(reg_mm), np.asarray(reg_g))
    diff = np.abs(np.asarray(out_mm) - np.asarray(out_g))
    inside = np.asarray(jnp.any(jnp.abs(out_g - imgs) > 1e-6, axis=-1))
    assert inside.sum() > 1000  # the comparison actually covers patches
    assert diff[inside].max() < tol, diff[inside].max()
    # untouched pixels are bit-identical to the input in both backends
    assert np.array_equal(np.asarray(out_mm)[~inside],
                          np.asarray(imgs)[~inside])


def test_matmul_matches_gather_pinned_rotation():
    """Rotation pinned to 0: the two-pass warp degenerates to exact
    separable bilinear — the gather backend's kernel — so a white-noise
    patch must agree sample-for-sample to bf16 einsum precision (~0.4% of
    the [-1,1] range x a couple of taps). Pins translation + scale
    sampling math against the independent formulation."""
    p = 32
    patch = jax.random.uniform(jax.random.PRNGKey(5), (p, p, 3),
                               minval=-1, maxval=1)
    _compare_backends(*_backend_pair(patch, 0.75, pin_rotation=True),
                      tol=0.03)


def test_matmul_matches_gather_rotated_ramp():
    """Rotation on, linear-ramp patch: both interpolators reproduce affine
    content exactly at their effective sampling coordinate, so agreement
    pins the ROTATION geometry (any sub-pixel coordinate error shows as
    slope x offset). A white-noise patch would instead expose the benign
    two-pass-vs-direct interpolation difference (~0.1), which is why this
    part uses smooth content."""
    p = 32
    ramp_y = jnp.linspace(-1.0, 1.0, p)[:, None]
    ramp_x = jnp.linspace(-1.0, 1.0, p)[None, :]
    patch = jnp.stack([jnp.broadcast_to(ramp_y, (p, p)),
                       jnp.broadcast_to(ramp_x, (p, p)),
                       0.5 * ramp_y + 0.5 * ramp_x], axis=-1)
    _compare_backends(*_backend_pair(patch, 0.75, pin_rotation=False),
                      tol=0.05)


def test_total_variation():
    img = jnp.zeros((4, 4, 1)).at[0, 0, 0].set(1.0)
    assert np.isclose(float(eot.total_variation(img)), 2.0)


def test_masker_train_targets():
    key, imgs, boxes, valid, _ = _setup(hw=64)
    # masker train crops 240x240, shrink for the test image size
    patched, targets = masker.apply_masker(
        key, imgs, boxes, valid, training=False,
        adv_patch=jnp.ones((32, 32, 3)), adv_scale=0.5)
    changed = jnp.any(jnp.abs(patched - imgs) > 1e-6, axis=-1)
    # targets reconstruct the original inside patched regions
    recon = patched + targets
    assert np.allclose(np.where(np.asarray(changed)[..., None],
                                np.asarray(recon), 0),
                       np.where(np.asarray(changed)[..., None],
                                np.asarray(imgs), 0), atol=1e-5)
    # targets zero where untouched
    untouched = ~np.asarray(changed)
    assert np.allclose(np.asarray(targets)[untouched], 0.0)


def test_masker_eval_ignores_training_hooks():
    """Training-only hook kwargs (train_patches, adv_scale_override) are
    inert in eval mode instead of falling through **eot_kwargs into
    eot.apply_patches (TypeError at trace time)."""
    key, imgs, boxes, valid, _ = _setup(hw=64)
    a = masker.apply_masker(key, imgs, boxes, valid, training=False,
                            adv_patch=jnp.ones((32, 32, 3)), adv_scale=0.5)
    b = masker.apply_masker(key, imgs, boxes, valid, training=False,
                            adv_patch=jnp.ones((32, 32, 3)), adv_scale=0.5,
                            train_patches=jnp.zeros((4, 64, 64, 3)),
                            adv_scale_override=9.0)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_masker_train_mode():
    """Self-supervised mode: patches come from shuffled batch crops with
    per-slot random scale (attack_detection.py:487-492)."""
    key, imgs, boxes, valid, _ = _setup(hw=64)
    patched, targets = masker.apply_masker(key, imgs, boxes, valid,
                                           training=True)
    changed = jnp.any(jnp.abs(patched - imgs) > 1e-6, axis=-1)
    assert bool(changed.any())
    # reconstruction identity holds in train mode too
    recon = patched + targets
    assert np.allclose(np.asarray(recon), np.asarray(imgs), atol=1e-5)
    assert float(patched.min()) >= -1.0 and float(patched.max()) <= 1.0


def test_make_train_patches_shuffles_and_flips():
    key = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(key, (4, 64, 64, 3))
    crops = masker.make_train_patches(key, imgs)
    assert crops.shape == (4, 64, 64, 3)  # crop clamped to image size
    # content comes from the batch (values subset of input range)
    assert float(crops.min()) >= float(imgs.min()) - 1e-6
