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
