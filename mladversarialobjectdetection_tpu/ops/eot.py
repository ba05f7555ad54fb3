"""Expectation-over-Transformation patch compositing, TPU-native.

This module re-designs the reference's scatter-based patch application
(attacker.py:344-498 `Patcher`, attack_detection.py:321-498 `Masker`) as a
fully static-shape, differentiable **inverse-warp gather composite**:

Reference (GPU/TF): per image `tf.map_fn`, per person box `tf.while_loop`:
resize patch to s x s, add noise, random brightness, pad to the rotation
diagonal with a -2 sentinel, `tfa.image.rotate`, composite where the sentinel
reveals background, `tensor_scatter_nd_update` into the image — dynamic
shapes, serial, and scatter-heavy.

TPU rebuild: for each of K static patch slots we compute an inverse affine
map from output-image pixels back into patch-canvas coordinates
(translate -> rotate about the slot center -> scale), bilinearly sample the
patch canvas, and blend by a validity mask. vmap over slots' geometry is
folded into a `lax.fori_loop` over K so later slots overwrite earlier ones —
exactly the reference's sequential scatter z-order. Everything is fixed
shape; gradients flow to the patch canvas through bilinear sampling weights.

Geometry parity (attacker.py:448-488 `Patcher.create`):
  - square side s = floor(max(box_h, box_w) * scale)
  - rotation-safe region side diag = min(sqrt(2) * s, image_width)
  - center jittered uniformly +-tolerance * box_{h,w}/2 around the box center
  - region clamped fully inside the image
  - slots with s^2 <= min_patch_area are culled

Randomness parity: print jitter w~N(.5,.1) b~N(0,.01) (attacker.py:365-372),
sensor noise U(-.01,.01) (attacker.py:427; the Masker uses +-.1,
attack_detection.py:414), brightness delta U(-.3,.3) (attacker.py:428),
rotation U(-20deg, 20deg) (attacker.py:436). Noise here is drawn i.i.d. per
output pixel instead of per pre-rotation patch pixel — statistically
equivalent for EOT purposes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import color

DEG20 = 20.0 * jnp.pi / 180.0


class PatchGeometry(NamedTuple):
    """Static per-slot placement ([K] each unless noted)."""
    ymin: jnp.ndarray   # region top (float)
    xmin: jnp.ndarray   # region left (float)
    size: jnp.ndarray   # patch square side s (float, floored)
    diag: jnp.ndarray   # region side (float)
    angle: jnp.ndarray  # rotation angle (radians)
    valid: jnp.ndarray  # bool


def make_patch_geometry(key: jax.Array, boxes: jnp.ndarray,
                        boxes_valid: jnp.ndarray, scale,
                        img_hw: Tuple[int, int], *,
                        tolerance: float = 0.2,
                        min_patch_area: float = 4.0,
                        random_scale_range: Tuple[float, float] | None = None
                        ) -> PatchGeometry:
    """Compute per-slot patch placement for one image.

    Args:
      key: PRNG key.
      boxes: [K, 4] person boxes (ymin, xmin, ymax, xmax) in pixels.
      boxes_valid: [K] bool.
      scale: scalar patch scale (trainable in the attack). Ignored if
        random_scale_range is given (defender self-supervised mode draws
        scale ~ U(lo, hi) per slot, attack_detection.py:487-492).
      img_hw: static (H, W).
      tolerance: center jitter fraction (attack .2, defender train .5, eval 0).
      min_patch_area: cull slots below this area in px.
      random_scale_range: optional (lo, hi) per-slot random scale.
    """
    h_img, w_img = float(img_hw[0]), float(img_hw[1])
    k = boxes.shape[0]
    k_scale, k_y, k_x, k_a = jax.random.split(key, 4)

    ymin, xmin, ymax, xmax = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    h = ymax - ymin
    w = xmax - xmin
    longer = jnp.maximum(h, w)

    if random_scale_range is not None:
        lo, hi = random_scale_range
        scale_k = jax.random.uniform(k_scale, (k,), minval=lo, maxval=hi)
    else:
        scale_k = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (k,))
    # geometry is intentionally non-differentiable wrt scale: the reference's
    # floor() + int cast cuts this path too; scale learns only through the
    # (max_score - scale)^2 loss term (attacker.py:190-193).
    scale_k = jax.lax.stop_gradient(scale_k)

    size = jnp.floor(longer * scale_k)
    diag = jnp.minimum(jnp.sqrt(2.0) * size, w_img)

    jy = jax.random.uniform(k_y, (k,), minval=-1.0, maxval=1.0) * (tolerance * h / 2.0)
    jx = jax.random.uniform(k_x, (k,), minval=-1.0, maxval=1.0) * (tolerance * w / 2.0)
    cy = ymin + h / 2.0 + jy
    cx = xmin + w / 2.0 + jx

    ymin_p = jnp.maximum(cy - diag / 2.0, 0.0)
    xmin_p = jnp.maximum(cx - diag / 2.0, 0.0)
    ymin_p = jnp.where(ymin_p + diag > h_img, h_img - diag, ymin_p)
    xmin_p = jnp.where(xmin_p + diag > w_img, w_img - diag, xmin_p)

    angle = jax.random.uniform(k_a, (k,), minval=-DEG20, maxval=DEG20)
    valid = boxes_valid & (size * size > min_patch_area)
    return PatchGeometry(ymin_p, xmin_p, size, diag, angle, valid)


def _composite_one_image(image: jnp.ndarray, patch_canvas: jnp.ndarray,
                         geom: PatchGeometry, key: jax.Array, *,
                         noise_mag: float, brightness_mag: float
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequentially composite K patch slots into one [H, W, 3] image.

    Returns (patched_image, region_mask [H, W] bool of all patched regions).
    """
    h_img, w_img, _ = image.shape
    p = patch_canvas.shape[0]
    k = geom.ymin.shape[0]

    yy = jnp.arange(h_img, dtype=jnp.float32)[:, None]  # [H, 1]
    xx = jnp.arange(w_img, dtype=jnp.float32)[None, :]  # [1, W]

    k_noise, k_bright = jax.random.split(key)
    # one noise field per image, shared across slots (slots rarely overlap)
    noise = jax.random.uniform(k_noise, image.shape, minval=-noise_mag,
                               maxval=noise_mag)
    bright = jax.random.uniform(k_bright, (k,), minval=-brightness_mag,
                                maxval=brightness_mag)

    def body(i, state):
        out, region_any = state
        ymin, xmin = geom.ymin[i], geom.xmin[i]
        size, diag, angle = geom.size[i], geom.diag[i], geom.angle[i]
        ok = geom.valid[i]

        # local coords in the diag x diag region, centered
        cyx = (diag - 1.0) / 2.0
        ly = yy - ymin - cyx  # [H, 1]
        lx = xx - xmin - cyx  # [1, W]
        # inverse rotation (content rotated by +angle => sample at R(-angle))
        cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
        sy = cos_a * ly + sin_a * lx + cyx   # [H, W] source row in region
        sx = -sin_a * ly + cos_a * lx + cyx  # [H, W] source col in region

        # offset of the s x s patch inside the region (attacker.py:431-434)
        off = (diag - size) / 2.0
        py = sy - off
        px = sx - off
        inside = ((py > -0.5) & (py < size - 0.5) &
                  (px > -0.5) & (px < size - 0.5))
        region = ((yy >= ymin) & (yy < ymin + diag) &
                  (xx >= xmin) & (xx < xmin + diag))

        # map to patch-canvas coords (half-pixel-center resize convention)
        u = jnp.clip((py + 0.5) * (p / jnp.maximum(size, 1.0)) - 0.5, 0.0, p - 1.0)
        v = jnp.clip((px + 0.5) * (p / jnp.maximum(size, 1.0)) - 0.5, 0.0, p - 1.0)
        u0 = jnp.floor(u); v0 = jnp.floor(v)
        fu = (u - u0)[..., None]; fv = (v - v0)[..., None]
        u0i = u0.astype(jnp.int32); v0i = v0.astype(jnp.int32)
        u1i = jnp.minimum(u0i + 1, p - 1); v1i = jnp.minimum(v0i + 1, p - 1)

        def gather(ui, vi):
            return patch_canvas[ui, vi]  # [H, W, 3] advanced-index gather

        val = ((1 - fu) * (1 - fv) * gather(u0i, v0i)
               + (1 - fu) * fv * gather(u0i, v1i)
               + fu * (1 - fv) * gather(u1i, v0i)
               + fu * fv * gather(u1i, v1i))
        val = jnp.clip(val + noise + bright[i], -1.0, 1.0)

        use = (inside & ok)[..., None]
        out = jnp.where(use, val, out)
        region_any = region_any | (region & ok)
        return out, region_any

    init = (image, jnp.zeros((h_img, w_img), bool))
    out, region_any = jax.lax.fori_loop(0, k, body, init)
    return out, region_any


@functools.partial(jax.jit, static_argnames=("tolerance", "min_patch_area",
                                             "noise_mag", "brightness_mag",
                                             "random_scale_range",
                                             "use_histogram_match"))
def apply_patches(key: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                  boxes_valid: jnp.ndarray, patch: jnp.ndarray, scale, *,
                  tolerance: float = 0.2, min_patch_area: float = 4.0,
                  noise_mag: float = 0.01, brightness_mag: float = 0.3,
                  random_scale_range: Tuple[float, float] | None = None,
                  per_image_patches: jnp.ndarray | None = None,
                  use_histogram_match: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the adversarial patch to every valid person box in a batch.

    Parity with `Patcher.call` (attacker.py:490-498) when
    `per_image_patches is None`, and with the Masker's self-supervised /
    eval modes otherwise.

    Args:
      key: PRNG key (folds per image).
      images: [B, H, W, 3] in [-1, 1].
      boxes: [B, K, 4] person boxes in pixels.
      boxes_valid: [B, K] bool.
      patch: [P, P, 3] shared patch canvas in [-1, 1] (the trainable patch),
        ignored if per_image_patches is given.
      scale: scalar patch scale in [0, 1].
      per_image_patches: optional [B, P', P', 3] per-image patch sources
        (Masker training mode, attack_detection.py:487-492).

    Returns:
      (patched images [B, H, W, 3], region masks [B, H, W] bool).
    """
    b = images.shape[0]
    img_hw = (images.shape[1], images.shape[2])
    keys = jax.random.split(key, b)

    def per_image(img, bxs, bval, k, own_patch):
        k_print, k_geom, k_comp = jax.random.split(k, 3)
        src = own_patch if own_patch is not None else patch
        printed = color.random_print_adjust(k_print, src)
        if use_histogram_match:
            canvas = color.histogram_match(printed, img)
        else:
            canvas = color.brightness_match(printed, img)
        geom = make_patch_geometry(
            k_geom, bxs, bval, scale, img_hw, tolerance=tolerance,
            min_patch_area=min_patch_area,
            random_scale_range=random_scale_range)
        return _composite_one_image(img, canvas, geom, k_comp,
                                    noise_mag=noise_mag,
                                    brightness_mag=brightness_mag)

    if per_image_patches is not None:
        return jax.vmap(per_image)(images, boxes, boxes_valid, keys,
                                   per_image_patches)
    return jax.vmap(lambda i, bx, bv, k: per_image(i, bx, bv, k, None))(
        images, boxes, boxes_valid, keys)


def total_variation(img: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation of an [H, W, C] image
    (tf.image.total_variation parity; attacker.py:191)."""
    dh = jnp.abs(img[1:, :, :] - img[:-1, :, :])
    dw = jnp.abs(img[:, 1:, :] - img[:, :-1, :])
    return jnp.sum(dh) + jnp.sum(dw)
