"""Differentiable color-space ops: RGB<->YUV and scene-brightness matching.

Behavioral parity with reference brightness_matcher.py:
  - `brightness_match` (BrightnessMatcher.call, brightness_matcher.py:43-73):
    rescale [-1,1]->[0,1], RGB->YUV, shift the patch's Y channel by
    (scene mean - patch mean), clip, YUV->RGB, rescale back.
  - `histogram_match` (HistogramMatcher, brightness_matcher.py:76-162):
    full 256-bin CDF histogram specification on Y.

The YUV matrices match tf.image.rgb_to_yuv / yuv_to_rgb so converted
checkpoints and goldens agree numerically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np

# tf.image.rgb_to_yuv coefficients. Plain NUMPY at module scope: this
# module may be first imported from inside an active jit trace (lazy
# imports in model code), and creating jax arrays at import time inside a
# trace raises TracerArrayConversionError. _apply_color_matrix folds the
# coefficients as python floats anyway.
_RGB2YUV = _np.array([
    [0.299, -0.14714119, 0.61497538],
    [0.587, -0.28886916, -0.51496512],
    [0.114, 0.43601035, -0.10001026],
], dtype=_np.float32)

# exact inverse (tf's published yuv_to_rgb kernel is only a ~3-decimal
# approximation of it; the exact inverse keeps roundtrips lossless).
# Images are row-vectors (img @ M), so the inverse map uses plain matrix
# inverse.
_YUV2RGB = _np.linalg.inv(_np.asarray(_RGB2YUV, _np.float64)).astype(
    _np.float32)


def _apply_color_matrix(img: jnp.ndarray, m) -> jnp.ndarray:
    """Channel mix as elementwise FMAs: full fp32 on the VPU (a 3x3 matmul
    would hit the MXU at bf16 default precision and cost ~5e-3 error)."""
    m = _np.asarray(m, _np.float32)
    c0, c1, c2 = img[..., 0], img[..., 1], img[..., 2]
    return jnp.stack([
        c0 * float(m[0, j]) + c1 * float(m[1, j]) + c2 * float(m[2, j])
        for j in range(3)
    ], axis=-1)


def rgb_to_yuv(img: jnp.ndarray) -> jnp.ndarray:
    return _apply_color_matrix(img, _RGB2YUV)


def yuv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return _apply_color_matrix(img, _YUV2RGB)


def _rescale_0_1(img: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] with the reference's 127/255 convention."""
    return (img + 1.0) * (127.0 / 255.0)


def _rescale_back(img: jnp.ndarray) -> jnp.ndarray:
    return img * (255.0 / 127.0) - 1.0


def brightness_match(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Shift `src`'s Y-channel mean to match `tgt`'s. Both [-1,1] HWC RGB."""
    src01 = _rescale_0_1(src)
    tgt01 = _rescale_0_1(tgt)
    src_yuv = rgb_to_yuv(src01)
    tgt_yuv = rgb_to_yuv(tgt01)
    y = src_yuv[..., 0]
    shift = jnp.mean(tgt_yuv[..., 0]) - jnp.mean(y)
    y = jnp.clip(y + shift, 0.0, 1.0)
    out = jnp.stack([y, src_yuv[..., 1], src_yuv[..., 2]], axis=-1)
    out = jnp.clip(yuv_to_rgb(out), 0.0, 1.0)
    return _rescale_back(out)


def _equalize_histogram(y: jnp.ndarray) -> jnp.ndarray:
    """256-bin CDF of a Y channel in [0,1] (brightness_matcher.py:117-139)."""
    hist = jnp.histogram(jnp.clip(y, 0.0, 1.0), bins=256, range=(0.0, 1.0))[0]
    cdf = jnp.cumsum(hist)
    cdf_min = jnp.min(cdf)
    pix_cnt = y.size
    return (cdf - cdf_min).astype(jnp.float32) / float(pix_cnt - 1)


def _interp(dx: jnp.ndarray, dy: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation of (dx, dy) at points x (both CDFs)."""
    idx1 = jnp.clip(jnp.searchsorted(dx, x, side="left"), 1, dx.shape[0] - 1)
    idx0 = idx1 - 1
    x0, x1 = dx[idx0], dx[idx1]
    y0, y1 = dy[idx0], dy[idx1]
    denom = jnp.where(x1 - x0 > 0, x1 - x0, 1.0)
    vals = y0 + (y1 - y0) * (x - x0) / denom
    vals = jnp.where(x <= dx[0], dy[0], vals)
    vals = jnp.where(x >= dx[-1], dy[-1], vals)
    return vals


def histogram_match(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Full histogram specification on the Y channel. Both [-1,1] HWC RGB."""
    src01 = _rescale_0_1(src)
    tgt01 = _rescale_0_1(tgt)
    src_yuv = rgb_to_yuv(src01)
    tgt_yuv = rgb_to_yuv(tgt01)
    y_src = src_yuv[..., 0]
    h, w = y_src.shape
    floating = jnp.clip(jnp.arange(0.0, 1.00001, 1.0 / 255.0, dtype=jnp.float32),
                        0.0, 1.0)
    cdf_src = _equalize_histogram(y_src)
    cdf_tgt = _equalize_histogram(tgt_yuv[..., 0])
    pxmap = _interp(cdf_tgt, floating, cdf_src)
    pxmap = _interp(floating, pxmap, y_src.reshape(-1)).reshape(h, w)
    out = jnp.stack([pxmap, src_yuv[..., 1], src_yuv[..., 2]], axis=-1)
    out = jnp.clip(yuv_to_rgb(out), 0.0, 1.0)
    return _rescale_back(out)


def random_print_adjust(key: jax.Array, patch: jnp.ndarray) -> jnp.ndarray:
    """Simulate print + reimage color variation (attacker.py:365-372):
    per-channel gain w ~ N(.5, .1) and bias b ~ N(0, .01), clip to [-1,1]."""
    kw, kb = jax.random.split(key)
    w = 0.5 + 0.1 * jax.random.normal(kw, (1, 1, 3), patch.dtype)
    b = 0.01 * jax.random.normal(kb, (1, 1, 3), patch.dtype)
    return jnp.clip(w * patch + b, -1.0, 1.0)
