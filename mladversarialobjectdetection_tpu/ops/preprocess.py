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


def _resize_taps(n_out: int, n_in: int):
    """Sparse rows of linear_resize_matrix: (idx [n_out, T], w [n_out, T]).

    The triangle filter has at most ceil(2*radius)+1 nonzeros per output
    pixel; enumerating only those makes the host resize ~ratio*n_in/T
    times cheaper than the dense matmul with IDENTICAL weights."""
    ratio = n_in / n_out
    radius = max(ratio, 1.0)
    taps = int(np.ceil(2 * radius)) + 1
    out_centers = (np.arange(n_out) + 0.5) * ratio - 0.5
    first = np.clip(np.ceil(out_centers - radius).astype(np.int64),
                    0, max(n_in - taps, 0))
    idx = first[:, None] + np.arange(taps)[None, :]          # [n_out, T]
    idx = np.minimum(idx, n_in - 1)
    dist = np.abs(out_centers[:, None] - idx)
    w = np.maximum(0.0, 1.0 - dist / radius)
    # duplicate clamped indices must not double-count
    dup = np.zeros_like(w, dtype=bool)
    dup[:, 1:] = idx[:, 1:] == idx[:, :-1]
    w[dup] = 0.0
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-8)
    return idx, w.astype(np.float32)


def resize_linear_np(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable antialiased linear resize of an [H, W, C] float image
    (exact tf.image.resize(antialias=True) parity — the sparse-tap
    evaluation of linear_resize_matrix; weights identical by construction,
    pinned by tests/test_pipeline resize parity)."""
    image = image.astype(np.float32)
    iy, wy = _resize_taps(out_h, image.shape[0])
    t = np.einsum("ot,otwc->owc", wy, image[iy], optimize=True)
    ix, wx = _resize_taps(out_w, image.shape[1])
    return np.einsum("ot,hotc->hoc", wx, t[:, ix], optimize=True)


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

    scale = min(output_size[1] / w, output_size[0] / h)
    scaled_h, scaled_w = int(h * scale), int(w * scale)
    # normalize AFTER the resize: the per-output-normalized linear filter
    # commutes exactly with the affine normalization (weights sum to 1),
    # and the scaled image is (1/scale)^2 x smaller to normalize. The
    # reference normalizes first (dataloader.py:118-128) — same result.
    scaled = resize_linear_np(image.astype(np.float32), scaled_h, scaled_w)
    scaled -= np.asarray(mean_rgb, np.float32)
    scaled /= np.asarray(stddev_rgb, np.float32)
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
