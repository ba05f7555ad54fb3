"""Optional training augmentations: GridMask and Mosaic.

Behavioral parity with the reference's optional augmentation layer
(SURVEY.md §2.2 #36: automl `aug/` — gridmask.py and mosaic.py as wired at
dataloader.py:308-319). GridMask runs on device (jittable, static shapes);
Mosaic runs host-side where images are still individually sized.

The AutoAugment/RandAugment policy engine (reference aug/autoaugment.py)
lives separately in data/autoaugment.py (v0-v3/test policies +
RandAugment, wired into DetectionTFRecordReader via autoaugment_policy);
this module holds the device-side GridMask and host-side Mosaic halves.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def gridmask(key: jax.Array, images: jnp.ndarray, *,
             ratio: float = 0.6, fill_value: float = 0.0,
             d_range: Tuple[int, int] = (32, 96)) -> jnp.ndarray:
    """GridMask augmentation (arXiv 2001.04086; automl aug/gridmask.py).

    Masks a periodic grid of squares. Per-image random period d, offset,
    and keep-ratio `ratio` (fraction of each period kept visible).
    """
    b, h, w, _ = images.shape
    k_d, k_oy, k_ox = jax.random.split(key, 3)
    d = jax.random.randint(k_d, (b, 1, 1), d_range[0], d_range[1])
    off_y = jax.random.randint(k_oy, (b, 1, 1), 0, d_range[1])
    off_x = jax.random.randint(k_ox, (b, 1, 1), 0, d_range[1])

    yy = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    keep_len = (d.astype(jnp.float32) * ratio).astype(jnp.int32)
    my = ((yy + off_y) % d) < keep_len
    mx = ((xx + off_x) % d) < keep_len
    mask = (my | mx)[..., None]  # block out only grid intersections' gaps
    return jnp.where(mask, images, fill_value)


def mosaic(rng: np.random.Generator, images: Sequence[np.ndarray],
           boxes: Sequence[np.ndarray], classes: Sequence[np.ndarray],
           out_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mosaic augmentation (YOLOv4-style; automl aug/mosaic.py role):
    tile 4 images around a random center, remap + clip their boxes.

    Args: 4 raw images [Hi, Wi, 3]; per-image boxes [Ni, 4] in pixels;
    classes [Ni]. Returns (image [S,S,3], boxes [N,4], classes [N]).
    """
    assert len(images) == 4
    s = out_size
    cy = int(rng.uniform(0.25, 0.75) * s)
    cx = int(rng.uniform(0.25, 0.75) * s)
    canvas = np.zeros((s, s, 3), images[0].dtype)
    quads = [(0, 0, cy, cx), (0, cx, cy, s), (cy, 0, s, cx), (cy, cx, s, s)]
    out_boxes, out_classes = [], []
    import cv2
    for (y0, x0, y1, x1), img, bxs, cls in zip(quads, images, boxes, classes):
        th, tw = y1 - y0, x1 - x0
        if th <= 0 or tw <= 0:
            continue
        ih, iw = img.shape[:2]
        scale = max(th / ih, tw / iw)
        rh, rw = int(round(ih * scale)), int(round(iw * scale))
        resized = cv2.resize(img, (rw, rh))
        crop = resized[:th, :tw]
        canvas[y0:y1, x0:x1] = crop
        if len(bxs):
            remapped = np.asarray(bxs, np.float64) * scale
            remapped += np.asarray([y0, x0, y0, x0], np.float64)
            remapped[:, 0::2] = remapped[:, 0::2].clip(y0, y1)
            remapped[:, 1::2] = remapped[:, 1::2].clip(x0, x1)
            area = ((remapped[:, 2] - remapped[:, 0])
                    * (remapped[:, 3] - remapped[:, 1]))
            keep = area > 4.0
            out_boxes.append(remapped[keep])
            out_classes.append(np.asarray(cls)[keep])
    if out_boxes:
        return (canvas, np.concatenate(out_boxes).astype(np.float32),
                np.concatenate(out_classes))
    return canvas, np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
