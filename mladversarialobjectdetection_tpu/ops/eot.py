"""Expectation-over-Transformation patch compositing, TPU-native.

This module re-designs the reference's scatter-based patch application
(attacker.py:344-498 `Patcher`, attack_detection.py:321-498 `Masker`) as a
fully static-shape, differentiable inverse-warp composite.

Reference (GPU/TF): per image `tf.map_fn`, per person box `tf.while_loop`:
resize patch to s x s, add noise, random brightness, pad to the rotation
diagonal with a -2 sentinel, `tfa.image.rotate`, composite where the
sentinel reveals background, `tensor_scatter_nd_update` into the image —
dynamic shapes, serial, and scatter-heavy.

TPU rebuild — two backends sharing the same geometry/semantics:

* `matmul` (default, the production path): per patch slot, the
  scale+rotate+translate inverse warp is decomposed Catmull-Smith style
  into two 1-D resampling passes, each expressed as a dense einsum against
  hat-function (triangle-filter) weight tensors generated from iota —
  **gathers become MXU matmuls**, the canonical TPU transformation. The
  work happens in a static WxW window around each slot (dynamic_slice in /
  dynamic_update_slice out), the patch is pre-downsampled once per image to
  a small canvas (separable matmul resize), and the triangle filter widens
  with the downscale ratio for antialiasing (the reference's
  tf.image.resize(antialias=True) + bilinear tfa.rotate combination).

* `gather`: the straightforward per-pixel bilinear gather formulation.
  Identical geometry; used as a reference implementation in tests (XLA
  lowers arbitrary gathers to scalar loops on TPU - ~300x slower there).

Sequential compositing over the K slots inside `lax.fori_loop` preserves
the reference's scatter z-order (later patches overwrite earlier).

Geometry parity (attacker.py:448-488 `Patcher.create`):
  - square side s = floor(max(box_h, box_w) * scale)
  - rotation-safe region side diag = min(sqrt(2)*s, image_width) — here
    additionally clamped to the static window size W (default
    `default_window` = min(image, 384)); only patches covering >0.42 of
    a full-height box on a 640 image are affected.
  - center jittered uniformly +-tolerance * box_{h,w}/2 around the box
    center; region clamped fully inside the image
  - slots with s^2 <= min_patch_area are culled

Randomness parity: print jitter w~N(.5,.1) b~N(0,.01) (attacker.py:365-372),
sensor noise U(-.01,.01) (attacker.py:427; the Masker uses +-.1,
attack_detection.py:414), brightness delta U(-.3,.3) (attacker.py:428),
rotation U(-20deg,20deg) (attacker.py:436). Noise is drawn i.i.d. per
output pixel, fresh per patch slot (the key folds the slot index),
instead of per pre-rotation patch pixel — statistically equivalent for
EOT purposes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import color

DEG20 = 20.0 * float(np.pi) / 180.0


class PatchGeometry(NamedTuple):
    """Per-slot placement ([K] each)."""
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
                        random_scale_range: Tuple[float, float] | None = None,
                        max_region: Optional[float] = None,
                        rotation_mag: float = DEG20
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
      tolerance: center jitter fraction (attack .2, defender train .5,
        eval 0).
      min_patch_area: cull slots below this area in px.
      random_scale_range: optional (lo, hi) per-slot random scale.
      max_region: clamp for the region side (defaults to image width,
        matching the reference; the matmul backend passes its static
        window size).
      rotation_mag: rotation range in radians (default +-20deg,
        attacker.py:436); 0 pins the rotation for parity tests.
    """
    h_img, w_img = float(img_hw[0]), float(img_hw[1])
    region_cap = w_img if max_region is None else min(w_img, float(max_region))
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
    size = jnp.minimum(size, region_cap)  # a patch can never exceed the region
    diag = jnp.minimum(jnp.sqrt(2.0) * size, region_cap)

    jy = jax.random.uniform(k_y, (k,), minval=-1.0, maxval=1.0) * (tolerance * h / 2.0)
    jx = jax.random.uniform(k_x, (k,), minval=-1.0, maxval=1.0) * (tolerance * w / 2.0)
    cy = ymin + h / 2.0 + jy
    cx = xmin + w / 2.0 + jx

    ymin_p = jnp.maximum(cy - diag / 2.0, 0.0)
    xmin_p = jnp.maximum(cx - diag / 2.0, 0.0)
    ymin_p = jnp.where(ymin_p + diag > h_img, h_img - diag, ymin_p)
    xmin_p = jnp.where(xmin_p + diag > w_img, w_img - diag, xmin_p)

    angle = jax.random.uniform(k_a, (k,), minval=-rotation_mag,
                               maxval=rotation_mag)
    valid = boxes_valid & (size * size > min_patch_area)
    return PatchGeometry(ymin_p, xmin_p, size, diag, angle, valid)


# ---------------------------------------------------------------------------
# canvas pre-downsampling (separable matmul resize with triangle filter)
# ---------------------------------------------------------------------------

from .preprocess import linear_resize_matrix as _resize_matrix_np


def downsample_canvas(patch: jnp.ndarray, p0: int) -> jnp.ndarray:
    """[P, P, 3] -> [p0, p0, 3] separable antialiased resize (two matmuls)."""
    p = patch.shape[0]
    if p == p0:
        return patch
    r = jnp.asarray(_resize_matrix_np(p0, p))
    out = jnp.einsum("oi,ijc->ojc", r, patch,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("oj,ijc->ioc", r, out,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# matmul backend: two-pass shear-resample warp in a static window
# ---------------------------------------------------------------------------

def _hat(dist: jnp.ndarray, radius) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist) / radius)


def _warp_scalars(canvas_p0: int, oy, ox, geom_i):
    """Shared affine/scalar math of the two-pass warp.

    Returns (p1_scalars (g_i, g_x, g_c), p2_scalars (a, b, cu), radius)."""
    ymin, xmin, size, diag, angle = geom_i
    cyx = (diag - 1.0) / 2.0
    off = (diag - size) / 2.0
    rho = canvas_p0 / jnp.maximum(size, 1.0)
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)
    a = cos_a * rho
    b = sin_a * rho
    d = -sin_a * rho
    e = cos_a * rho
    base_y = oy - ymin - cyx
    base_x = ox - xmin - cyx
    cu = (cos_a * base_y + sin_a * base_x + cyx - off + 0.5) * rho - 0.5
    cv = (-sin_a * base_y + cos_a * base_x + cyx - off + 0.5) * rho - 0.5
    g_i = d / a
    g_x = e - d * b / a
    g_c = cv - d * cu / a
    radius = jnp.maximum(1.0, rho)
    return (g_i, g_x, g_c), (a, b, cu), radius


def _inside_region_masks(oy, ox, geom_i, w: int):
    """Analytic inside-the-patch + region masks (replaces the -2 sentinel
    logic of attacker.py:431-440)."""
    ymin, xmin, size, diag, angle = geom_i
    cyx = (diag - 1.0) / 2.0
    off = (diag - size) / 2.0
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)
    yy = oy + jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0)
    xx = ox + jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    ly = yy - ymin - cyx
    lx = xx - xmin - cyx
    sy = cos_a * ly + sin_a * lx + cyx
    sx = -sin_a * ly + cos_a * lx + cyx
    py = sy - off
    px = sx - off
    inside = ((py > -0.5) & (py < size - 0.5) &
              (px > -0.5) & (px < size - 0.5))
    region = ((yy >= ymin) & (yy < ymin + diag) &
              (xx >= xmin) & (xx < xmin + diag))
    return inside, region


def _warp_window_matmul(canvas: jnp.ndarray, oy, ox, geom_i, w: int):
    """Sample the rotated+scaled canvas over a [w, w] window.

    canvas: [P0, P0, 3]; oy/ox: window origin (float, traced);
    geom_i: (ymin, xmin, size, diag, angle) scalars.
    Returns (sample [w, w, 3], inside [w, w] bool).

    Math: canvas coords (u, v) of output pixel (yo, xo) are affine:
      u = A*yo + B*xo + Cu,  v = -B*yo + A*xo + Cv
    (A = cos(angle)*rho, B = sin(angle)*rho, rho = P0/size). Pass 1
    resamples along the canvas minor axis j with index g(i, xo) affine in
    (i, xo); pass 2 resamples along i with index u(yo, xo). Both passes are
    dense einsums over hat-weight tensors built from iota — MXU work, no
    gathers. The triangle radius max(1, rho) antialiases downscaling.
    """
    ymin, xmin, size, diag, angle = geom_i
    p0 = canvas.shape[0]
    cyx = (diag - 1.0) / 2.0
    off = (diag - size) / 2.0
    rho = p0 / jnp.maximum(size, 1.0)
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)

    # u = A*yo + B*xo + Cu ; v = D*yo + E*xo + Cv
    a = cos_a * rho
    b = sin_a * rho
    d = -sin_a * rho
    e = cos_a * rho
    base_y = oy - ymin - cyx
    base_x = ox - xmin - cyx
    cu = (cos_a * base_y + sin_a * base_x + cyx - off + 0.5) * rho - 0.5
    cv = (-sin_a * base_y + cos_a * base_x + cyx - off + 0.5) * rho - 0.5

    # pass-1 index: g(i, xo) = (d/a)*i + (e - d*b/a)*xo + (cv - d*cu/a)
    # (a = cos(angle)*rho >= cos(20deg)*rho > 0, never degenerate)
    g_i = d / a
    g_x = e - d * b / a
    g_c = cv - d * cu / a

    radius = jnp.maximum(1.0, rho)
    io = jax.lax.broadcasted_iota(jnp.float32, (p0, 1, 1), 0)
    xo_ = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    jo = jax.lax.broadcasted_iota(jnp.float32, (1, 1, p0), 2)
    w1 = _hat(g_i * io + g_x * xo_ + g_c - jo, radius)      # [p0, w, p0]
    w1 = w1 / jnp.maximum(jnp.sum(w1, axis=2, keepdims=True), 1e-8)
    # hat weights carry ~1% quantization noise in bf16 — below the EOT
    # sensor-noise floor (noise_mag .01); halves HBM traffic, enables MXU
    t = jnp.einsum("ijc,ixj->ixc", canvas.astype(jnp.bfloat16),
                   w1.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)       # [p0, w, 3]

    yo_ = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    xo2 = jax.lax.broadcasted_iota(jnp.float32, (w, 1, 1), 0)
    i2 = jax.lax.broadcasted_iota(jnp.float32, (1, 1, p0), 2)
    w2 = _hat(a * yo_ + b * xo2 + cu - i2, radius)           # [w(x), w(y), p0]
    w2 = w2 / jnp.maximum(jnp.sum(w2, axis=2, keepdims=True), 1e-8)
    sample = jnp.einsum("ixc,xyi->yxc", t.astype(jnp.bfloat16),
                        w2.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)  # [w, w, 3]
    sample = sample.astype(jnp.float32)

    # analytic inside-the-patch mask (replaces the -2 sentinel + fill logic
    # of attacker.py:431-440)
    yy = oy + jax.lax.broadcasted_iota(jnp.float32, (w, 1), 0)
    xx = ox + jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    ly = yy - ymin - cyx
    lx = xx - xmin - cyx
    sy = cos_a * ly + sin_a * lx + cyx
    sx = -sin_a * ly + cos_a * lx + cyx
    py = sy - off
    px = sx - off
    inside = ((py > -0.5) & (py < size - 0.5) &
              (px > -0.5) & (px < size - 0.5))
    region = ((yy >= ymin) & (yy < ymin + diag) &
              (xx >= xmin) & (xx < xmin + diag))
    return sample, inside, region


def _composite_matmul_batch(images: jnp.ndarray, canvases: jnp.ndarray,
                            geom: PatchGeometry, keys: jax.Array, *,
                            noise_mag: float, brightness_mag: float,
                            window: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential windowed composite of K slots over a whole batch.

    The slot loop lives OUTSIDE the batch vmap so each iteration can be
    skipped for the entire batch with a real `lax.cond` branch (a cond
    under vmap executes both sides). NMS validity is a prefix mask — once
    a candidate falls below score_thresh every later one does too
    (ops/nms.py greedy loop) — so slot i is dead for the whole step iff no
    image has > i valid boxes, which in the common regime (a handful of
    persons per image, max_boxes 16) skips most of the K iterations'
    warp + RNG work. Semantics identical: dead slots never wrote anything.

    images [B,H,W,3]; canvases [B,P0,P0,3]; geom fields [B,K]; keys [B]
    (the per-image composite keys).
    """
    b, h_img, w_img, _ = images.shape
    k = geom.ymin.shape[1]
    wsz = window

    split2 = jax.vmap(lambda kk: jax.random.split(kk))
    ks = split2(keys)                       # [B, 2, key]
    k_noise, k_bright = ks[:, 0], ks[:, 1]
    bright = jax.vmap(lambda kk: jax.random.uniform(
        kk, (k,), minval=-brightness_mag, maxval=brightness_mag))(k_bright)

    warp = _warp_window_matmul

    # remat policy: the enormous hat-weight tensors (pure functions of four
    # scalars) are regenerated in the backward pass instead of stored
    # (storing them OOMs HBM); dots_saveable keeps the small matmul
    # OUTPUTS (t/sample) so the forward itself is not recomputed
    @functools.partial(jax.checkpoint,
                       policy=jax.checkpoint_policies.dots_saveable)
    def patched_window(win, canvas_, geom_scalars, oy, ox, bright_i, ok,
                       k_noise_i):
        sample, inside, region = warp(canvas_, oy, ox, geom_scalars, wsz)
        # fresh sensor noise per slot (attacker.py:427 draws per patch);
        # regenerated in the bwd pass under the remat policy, never stored.
        # rbg impl: the hw RngBitGenerator is ~10x cheaper than threefry on
        # TPU for these [w,w,3]-per-slot draws (measured ~20 ms/step at
        # lite4@640 b24 window 320 with threefry); seeded from the folded
        # threefry key so slots stay decorrelated.
        kd = (k_noise_i if jnp.issubdtype(k_noise_i.dtype, jnp.integer)
              else jax.random.key_data(k_noise_i))  # raw vs typed key
        rbg = jax.random.wrap_key_data(
            jnp.tile(kd.reshape(-1).astype(jnp.uint32), 2)[:4],
            impl="unsafe_rbg")
        noise = jax.random.uniform(rbg, (wsz, wsz, 3),
                                   minval=-noise_mag, maxval=noise_mag)
        val = jnp.clip(sample + noise + bright_i, -1.0, 1.0)
        use = (inside & ok)[..., None]
        return jnp.where(use, val, win), region

    def one_image_slot(out, region_any, canvas_, ymin, xmin, size, diag,
                       angle, ok, bright_i, k_noise_img, i):
        # static window fully inside the image, containing the region
        oy = jnp.clip(jnp.floor(ymin), 0.0, float(h_img - wsz))
        ox = jnp.clip(jnp.floor(xmin), 0.0, float(w_img - wsz))
        oyi = oy.astype(jnp.int32)
        oxi = ox.astype(jnp.int32)

        win = jax.lax.dynamic_slice(out, (oyi, oxi, 0), (wsz, wsz, 3))
        new_win, region = patched_window(
            win, canvas_, (ymin, xmin, size, diag, angle),
            oy, ox, bright_i, ok, jax.random.fold_in(k_noise_img, i))
        out = jax.lax.dynamic_update_slice(out, new_win, (oyi, oxi, 0))

        reg_win = jax.lax.dynamic_slice(region_any, (oyi, oxi), (wsz, wsz))
        region_any = jax.lax.dynamic_update_slice(
            region_any, reg_win | (region & ok), (oyi, oxi))
        return out, region_any

    def slot_work(i, state):
        out, region_any = state
        return jax.vmap(one_image_slot, in_axes=(0,) * 11 + (None,))(
            out, region_any, canvases, geom.ymin[:, i], geom.xmin[:, i],
            geom.size[:, i], geom.diag[:, i], geom.angle[:, i],
            geom.valid[:, i], bright[:, i], k_noise, i)

    def body(i, state):
        any_live = jnp.any(geom.valid[:, i])
        return jax.lax.cond(any_live, lambda s: slot_work(i, s),
                            lambda s: s, state)

    init = (images, jnp.zeros((b, h_img, w_img), bool))
    return jax.lax.fori_loop(0, k, body, init)


# ---------------------------------------------------------------------------
# gather backend (reference implementation for tests)
# ---------------------------------------------------------------------------

def _composite_gather(image: jnp.ndarray, patch_canvas: jnp.ndarray,
                      geom: PatchGeometry, key: jax.Array, *,
                      noise_mag: float, brightness_mag: float
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel bilinear-gather composite (straight-line formulation)."""
    h_img, w_img, _ = image.shape
    p = patch_canvas.shape[0]
    k = geom.ymin.shape[0]

    yy = jnp.arange(h_img, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w_img, dtype=jnp.float32)[None, :]

    k_noise, k_bright = jax.random.split(key)
    bright = jax.random.uniform(k_bright, (k,), minval=-brightness_mag,
                                maxval=brightness_mag)

    def body(i, state):
        out, region_any = state
        # fresh noise per slot (attacker.py:427)
        noise = jax.random.uniform(jax.random.fold_in(k_noise, i),
                                   image.shape, minval=-noise_mag,
                                   maxval=noise_mag)
        ymin, xmin = geom.ymin[i], geom.xmin[i]
        size, diag, angle = geom.size[i], geom.diag[i], geom.angle[i]
        ok = geom.valid[i]

        cyx = (diag - 1.0) / 2.0
        ly = yy - ymin - cyx
        lx = xx - xmin - cyx
        cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
        sy = cos_a * ly + sin_a * lx + cyx
        sx = -sin_a * ly + cos_a * lx + cyx
        off = (diag - size) / 2.0
        py = sy - off
        px = sx - off
        inside = ((py > -0.5) & (py < size - 0.5) &
                  (px > -0.5) & (px < size - 0.5))
        region = ((yy >= ymin) & (yy < ymin + diag) &
                  (xx >= xmin) & (xx < xmin + diag))

        u = jnp.clip((py + 0.5) * (p / jnp.maximum(size, 1.0)) - 0.5, 0.0,
                     p - 1.0)
        v = jnp.clip((px + 0.5) * (p / jnp.maximum(size, 1.0)) - 0.5, 0.0,
                     p - 1.0)
        u0 = jnp.floor(u); v0 = jnp.floor(v)
        fu = (u - u0)[..., None]; fv = (v - v0)[..., None]
        u0i = u0.astype(jnp.int32); v0i = v0.astype(jnp.int32)
        u1i = jnp.minimum(u0i + 1, p - 1); v1i = jnp.minimum(v0i + 1, p - 1)

        val = ((1 - fu) * (1 - fv) * patch_canvas[u0i, v0i]
               + (1 - fu) * fv * patch_canvas[u0i, v1i]
               + fu * (1 - fv) * patch_canvas[u1i, v0i]
               + fu * fv * patch_canvas[u1i, v1i])
        val = jnp.clip(val + noise + bright[i], -1.0, 1.0)

        use = (inside & ok)[..., None]
        out = jnp.where(use, val, out)
        region_any = region_any | (region & ok)
        return out, region_any

    init = (image, jnp.zeros((h_img, w_img), bool))
    return jax.lax.fori_loop(0, k, body, init)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def default_window(img_hw: Tuple[int, int]) -> int:
    """Static slot-window side. 384 covers diag = sqrt(2)*scale*box up to
    scale .42 on a full-height 640 box (typical learned scales are .3-.4);
    larger patches are clamped to the window (the reference itself clamps
    to image width, attacker.py:472). Pass `window=` explicitly for very
    large patch scales."""
    return min(img_hw[0], img_hw[1], 384)


@functools.partial(jax.jit, static_argnames=("tolerance", "min_patch_area",
                                             "noise_mag", "brightness_mag",
                                             "random_scale_range",
                                             "use_histogram_match",
                                             "backend", "window",
                                             "canvas_res", "rotation_mag",
                                             "print_jitter"))
def apply_patches(key: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                  boxes_valid: jnp.ndarray, patch: jnp.ndarray, scale, *,
                  tolerance: float = 0.2, min_patch_area: float = 4.0,
                  noise_mag: float = 0.01, brightness_mag: float = 0.3,
                  random_scale_range: Tuple[float, float] | None = None,
                  per_image_patches: jnp.ndarray | None = None,
                  use_histogram_match: bool = False,
                  backend: str = "matmul",
                  window: Optional[int] = None,
                  canvas_res: int = 96,
                  rotation_mag: float = DEG20,
                  print_jitter: bool = True
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
      backend: 'matmul' (two-pass MXU warp) or 'gather'.
      window: static window side for the matmul backend
        (default `default_window` = min(image, 384)).
      canvas_res: pre-downsampled patch-canvas resolution for the matmul
        backend.
      rotation_mag: rotation range in radians (0 disables rotation —
        parity-test hook).
      print_jitter: False pins the print transform to its mean (w=.5,
        b=0) — parity-test hook (the reference pins the same way by
        stubbing its RNG; the .5 gain is also what the CPU inference
        mirror uses deterministically, adv_patch.py:40-59).

    Returns:
      (patched images [B, H, W, 3], region masks [B, H, W] bool).
    """
    b = images.shape[0]
    img_hw = (images.shape[1], images.shape[2])
    if window is None:
        window = default_window(img_hw)
    window = min(window, img_hw[0], img_hw[1])
    keys = jax.random.split(key, b)
    max_region = None if backend == "gather" else float(window)

    def per_image_prep(img, bxs, bval, k, own_patch):
        """Per-image canvas + geometry; the composite key is returned so the
        batched composite derives the same per-image key chain as the
        gather backend."""
        k_print, k_geom, k_comp = jax.random.split(k, 3)
        src = own_patch if own_patch is not None else patch
        if print_jitter:
            printed = color.random_print_adjust(k_print, src)
        else:
            printed = jnp.clip(0.5 * src, -1.0, 1.0)
        if use_histogram_match:
            canvas = color.histogram_match(printed, img)
        else:
            canvas = color.brightness_match(printed, img)
        geom = make_patch_geometry(
            k_geom, bxs, bval, scale, img_hw, tolerance=tolerance,
            min_patch_area=min_patch_area,
            random_scale_range=random_scale_range, max_region=max_region,
            rotation_mag=rotation_mag)
        return canvas, geom, k_comp

    if per_image_patches is not None:
        prep = jax.vmap(per_image_prep)(images, boxes, boxes_valid, keys,
                                        per_image_patches)
    else:
        prep = jax.vmap(
            lambda i, bx, bv, k: per_image_prep(i, bx, bv, k, None))(
                images, boxes, boxes_valid, keys)
    canvases, geoms, k_comps = prep

    if backend == "matmul":
        p0 = min(canvas_res, canvases.shape[1])
        small = jax.vmap(lambda c: downsample_canvas(c, p0))(canvases)
        return _composite_matmul_batch(images, small, geoms, k_comps,
                                       noise_mag=noise_mag,
                                       brightness_mag=brightness_mag,
                                       window=window)
    return jax.vmap(functools.partial(_composite_gather,
                                      noise_mag=noise_mag,
                                      brightness_mag=brightness_mag))(
        images, canvases, geoms, k_comps)


def total_variation(img: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation of an [H, W, C] image
    (tf.image.total_variation parity; attacker.py:191)."""
    dh = jnp.abs(img[1:, :, :] - img[:-1, :, :])
    dw = jnp.abs(img[:, 1:, :] - img[:, :-1, :])
    return jnp.sum(dh) + jnp.sum(dw)
