"""AutoAugment for detection (policy v0), host-side numpy/cv2.

Behavioral parity with the reference's aug/autoaugment.py as wired at
dataloader.py:308-313 (`autoaugment_policy='v0'`): each image draws one
random sub-policy of (op, probability, magnitude) pairs; geometric ops
move the bounding boxes with the pixels.

TPU-first placement: the reference runs these inside tf.data on the host
CPU; here they are plain numpy/cv2 transforms applied in the host input
pipeline before batching — the device never sees dynamic shapes.

Boxes are [N, 4] = (ymin, xmin, ymax, xmax) in PIXELS of the given image.
Magnitudes follow the reference's 0..10 scale.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

_MAX_LEVEL = 10.0


# -- pixel-only ops ---------------------------------------------------------

def _equalize(img: np.ndarray) -> np.ndarray:
    import cv2
    out = img.copy()
    for c in range(3):
        out[..., c] = cv2.equalizeHist(img[..., c])
    return out


def _color(img: np.ndarray, factor: float) -> np.ndarray:
    grey = img.mean(axis=-1, keepdims=True)
    return np.clip(grey + factor * (img.astype(np.float32) - grey),
                   0, 255).astype(img.dtype)


def _contrast(img: np.ndarray, factor: float) -> np.ndarray:
    mean = img.astype(np.float32).mean()
    return np.clip(mean + factor * (img.astype(np.float32) - mean),
                   0, 255).astype(img.dtype)


def _brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(img.astype(np.float32) * factor, 0, 255).astype(img.dtype)


def _sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    import cv2
    blurred = cv2.GaussianBlur(img, (3, 3), 0)
    return np.clip(blurred + factor * (img.astype(np.float32) - blurred),
                   0, 255).astype(img.dtype)


def _solarize(img: np.ndarray, threshold: int) -> np.ndarray:
    return np.where(img < threshold, img, 255 - img).astype(img.dtype)


def _posterize(img: np.ndarray, bits: int) -> np.ndarray:
    shift = max(0, 8 - int(bits))
    return ((img >> shift) << shift).astype(img.dtype)


def _cutout(rng, img: np.ndarray, pad: int) -> np.ndarray:
    h, w = img.shape[:2]
    cy, cx = rng.integers(0, h), rng.integers(0, w)
    y0, y1 = max(0, cy - pad), min(h, cy + pad)
    x0, x1 = max(0, cx - pad), min(w, cx + pad)
    out = img.copy()
    out[y0:y1, x0:x1] = 128
    return out


# -- geometric ops (move boxes with pixels) ---------------------------------

def _affine(img: np.ndarray, boxes: np.ndarray, m: np.ndarray
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Apply a 2x3 affine (x, y convention) to image + boxes."""
    import cv2
    h, w = img.shape[:2]
    out = cv2.warpAffine(img, m, (w, h), borderValue=(128, 128, 128))
    if len(boxes):
        ys = boxes[:, [0, 0, 2, 2]]
        xs = boxes[:, [1, 3, 1, 3]]
        pts = np.stack([xs, ys], axis=-1).reshape(-1, 2)  # [4N, (x,y)]
        ones = np.ones((pts.shape[0], 1))
        new = (np.concatenate([pts, ones], axis=1) @ m.T).reshape(-1, 4, 2)
        new_x, new_y = new[..., 0], new[..., 1]
        boxes = np.stack([new_y.min(1), new_x.min(1),
                          new_y.max(1), new_x.max(1)], axis=1)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, h)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, w)
    return out, boxes.astype(np.float32)


def _translate(img, boxes, dx: float, dy: float):
    m = np.array([[1, 0, dx], [0, 1, dy]], np.float64)
    return _affine(img, boxes, m)


def _shear(img, boxes, sx: float, sy: float):
    m = np.array([[1, sx, 0], [sy, 1, 0]], np.float64)
    return _affine(img, boxes, m)


def _rotate(img, boxes, degrees: float):
    import cv2
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), degrees, 1.0)
    return _affine(img, boxes, m)


# -- magnitude decoding (reference level_to_arg semantics) -------------------

def _enhance_factor(level: float) -> float:
    return level / _MAX_LEVEL * 1.8 + 0.1


def _apply_op(rng, img, boxes, name: str, level: float):
    h, w = img.shape[:2]
    if name == "Equalize":
        return _equalize(img), boxes
    if name == "Color":
        return _color(img, _enhance_factor(level)), boxes
    if name == "Contrast":
        return _contrast(img, _enhance_factor(level)), boxes
    if name == "Brightness":
        return _brightness(img, _enhance_factor(level)), boxes
    if name == "Sharpness":
        return _sharpness(img, _enhance_factor(level)), boxes
    if name == "Solarize":
        return _solarize(img, int(256 - level / _MAX_LEVEL * 256)), boxes
    if name == "Posterize":
        return _posterize(img, int(8 - level / _MAX_LEVEL * 4)), boxes
    if name == "Cutout":
        return _cutout(rng, img, int(level / _MAX_LEVEL * 100)), boxes
    sign = -1.0 if rng.random() < 0.5 else 1.0
    if name == "TranslateX_BBox":
        return _translate(img, boxes, sign * level / _MAX_LEVEL * 250 / 331 * w, 0)
    if name == "TranslateY_BBox":
        return _translate(img, boxes, 0, sign * level / _MAX_LEVEL * 250 / 331 * h)
    if name == "ShearX_BBox":
        return _shear(img, boxes, sign * level / _MAX_LEVEL * 0.3, 0)
    if name == "ShearY_BBox":
        return _shear(img, boxes, 0, sign * level / _MAX_LEVEL * 0.3)
    if name == "Rotate_BBox":
        return _rotate(img, boxes, sign * level / _MAX_LEVEL * 30.0)
    raise ValueError(f"unknown op {name}")


# detection policy v0 (the automl default, aug/autoaugment.py policy_v0)
POLICY_V0: List[List[Tuple[str, float, float]]] = [
    [("TranslateX_BBox", 0.6, 4), ("Equalize", 0.8, 10)],
    [("TranslateY_BBox", 0.2, 2), ("Cutout", 0.8, 8)],
    [("Sharpness", 0.0, 8), ("ShearX_BBox", 0.4, 0)],
    [("ShearY_BBox", 1.0, 2), ("TranslateY_BBox", 0.6, 6)],
    [("Rotate_BBox", 0.6, 10), ("Color", 1.0, 6)],
]

POLICIES: Dict[str, list] = {"v0": POLICY_V0}


def distort_image_with_autoaugment(
        rng: np.random.Generator, image: np.ndarray, boxes: np.ndarray,
        policy_name: str = "v0") -> Tuple[np.ndarray, np.ndarray]:
    """Apply one randomly-chosen sub-policy (reference
    distort_image_with_autoaugment semantics). Image uint8 RGB; boxes in
    pixels."""
    policy = POLICIES[policy_name]
    sub = policy[rng.integers(0, len(policy))]
    img = image
    bxs = np.asarray(boxes, np.float32).reshape(-1, 4)
    for name, prob, level in sub:
        if rng.random() < prob:
            img, bxs = _apply_op(rng, img, bxs, name, float(level))
    return img, bxs
