"""Input preprocessing: normalize + aspect-preserving resize + pad.

Two implementations of the same math:
  - `preprocess_host`: numpy/cv2 for variable-size host frames (parity with
    reference train_data_generator.py:55-75 `DataSequence._map_fn` and
    dataloader.py:118-142 `DetectionInputProcessor` as driven by
    infer_lib.py:219-235).
  - `preprocess_jax`: jittable fixed-shape variant for batched device-side
    preprocessing of already-uniform frames.

Both return the preprocessed image and `image_scale_to_original` — the
factor that maps detection boxes back to the raw frame (dataloader.py:195).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.image import parse_image_size

import functools


@functools.lru_cache(maxsize=64)
def linear_resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] antialiased linear-resize matrix (half-pixel centers).

    Matches tf.image.resize(method=BILINEAR, antialias=True) — the resize
    the reference serving path uses (dataloader.py:130-136
    `resize_and_crop_image`): a triangle filter whose support widens with
    the downscale ratio, weights normalized per output pixel."""
    ratio = n_in / n_out
    radius = max(ratio, 1.0)
    out_centers = (np.arange(n_out) + 0.5) * ratio - 0.5
    dist = np.abs(out_centers[:, None] - np.arange(n_in)[None, :])
    w = np.maximum(0.0, 1.0 - dist / radius)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-8)
    return w.astype(np.float32)


def resize_linear_np(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable antialiased linear resize of an [H, W, C] float image
    (two BLAS matmuls; exact tf.image.resize(antialias=True) parity)."""
    h, w, c = image.shape
    ry = linear_resize_matrix(out_h, h)        # [out_h, h]
    rx = linear_resize_matrix(out_w, w)        # [out_w, w]
    t = np.einsum("oh,hwc->owc", ry, image.astype(np.float32), optimize=True)
    return np.einsum("ow,hwc->hoc", rx, t, optimize=True)


def preprocess_host(image: np.ndarray, output_size, mean_rgb, stddev_rgb
                    ) -> Tuple[np.ndarray, float]:
    """Normalize, resize (aspect preserving) and zero-pad one raw frame.

    Exact serving-path parity with the reference's map_fn
    (infer_lib.py:219-235 -> dataloader.py:115-145): normalize first, then
    antialiased bilinear resize to (floor(h*scale), floor(w*scale)), then
    zero-pad bottom/right.

    Args:
      image: [H, W, 3] uint8/float RGB.
      output_size: int or (h, w).
      mean_rgb / stddev_rgb: scalar or per-channel normalization constants.

    Returns: (padded [h, w, 3] float32 in normalized space, scale_to_original).
    """
    output_size = parse_image_size(output_size)
    h, w = image.shape[:2]
    image = image.astype(np.float32)
    image -= np.asarray(mean_rgb, np.float32)
    image /= np.asarray(stddev_rgb, np.float32)

    scale = min(output_size[1] / w, output_size[0] / h)
    scaled_h, scaled_w = int(h * scale), int(w * scale)
    scaled = resize_linear_np(image, scaled_h, scaled_w)
    out = np.zeros((*output_size, 3), np.float32)
    out[:scaled_h, :scaled_w, :] = scaled
    return out, 1.0 / scale


def preprocess_jax(image: jnp.ndarray, output_size, mean_rgb, stddev_rgb
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable preprocessing of a single fixed-shape [H, W, 3] image."""
    output_size = parse_image_size(output_size)
    h, w = image.shape[:2]
    image = image.astype(jnp.float32)
    image = (image - jnp.asarray(mean_rgb, jnp.float32)) / jnp.asarray(
        stddev_rgb, jnp.float32)

    scale = min(output_size[1] / w, output_size[0] / h)  # static
    scaled_h, scaled_w = int(h * scale), int(w * scale)
    scaled = jax.image.resize(image, (scaled_h, scaled_w, 3), method="bilinear",
                              antialias=True)
    out = jnp.zeros((*output_size, 3), jnp.float32)
    out = out.at[:scaled_h, :scaled_w, :].set(scaled)
    return out, jnp.asarray(1.0 / scale, jnp.float32)
