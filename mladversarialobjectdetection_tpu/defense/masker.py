"""Masker: plant patches and emit self-supervised recovery targets.

Behavioral parity with reference attack_detection.py:321-498 (`Masker`):
  - training mode: patches are 240x240 top-left crops of a shuffled copy of
    the batch, randomly flipped; per-box scale ~ U(.3,.5); center jitter
    tolerance .5 (attack_detection.py:451-453,487-492)
  - eval mode: the real learned adversarial patch at its learned scale,
    tolerance 0 (attack_detection.py:456,371-373)
  - sensor noise +-.1 (attack_detection.py:414)
  - targets = original - patched over all patched regions, zero elsewhere
    (the scatter of `patch_bg - im` at attack_detection.py:429-430)

Built on the same inverse-warp EOT compositor as the attack (ops/eot.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import eot

TRAIN_CROP = 240
TRAIN_SCALE_RANGE = (0.3, 0.5)
TRAIN_TOLERANCE = 0.5
NOISE_MAG = 0.1


def make_train_patches(key: jax.Array, images: jnp.ndarray,
                       crop: int = TRAIN_CROP) -> jnp.ndarray:
    """Self-supervised patch sources: shuffled batch crops + random flips
    (attack_detection.py:487-492)."""
    crop = min(crop, images.shape[1], images.shape[2])
    k_shuf, k_lr, k_ud = jax.random.split(key, 3)
    crops = images[:, :crop, :crop, :]
    perm = jax.random.permutation(k_shuf, images.shape[0])
    crops = crops[perm]
    flip_lr = jax.random.bernoulli(k_lr, 0.5, (images.shape[0],))
    flip_ud = jax.random.bernoulli(k_ud, 0.5, (images.shape[0],))
    crops = jnp.where(flip_lr[:, None, None, None], crops[:, :, ::-1, :], crops)
    crops = jnp.where(flip_ud[:, None, None, None], crops[:, ::-1, :, :], crops)
    return crops


def apply_masker(key: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                 boxes_valid: jnp.ndarray, *, training: bool,
                 adv_patch: jnp.ndarray | None = None,
                 adv_scale: float | jnp.ndarray = 0.4,
                 return_region: bool = False,
                 **eot_kwargs) -> Tuple[jnp.ndarray, ...]:
    """Plant patches; return (patched images, targets[, region]).

    targets[b] = original[b] - patched[b] inside patched regions, else 0.
    `return_region=True` additionally returns the [B, H, W] bool patched-
    region mask (used by the recovery-PSNR metric). `eot_kwargs` pass
    through to eot.apply_patches (backend selection and the randomness-
    pinning hooks used by the reference-parity tests).
    """
    k_patch, k_apply = jax.random.split(key)
    if training:
        train_patches = eot_kwargs.pop(
            "train_patches", None)
        if train_patches is None:
            train_patches = make_train_patches(k_patch, images)
        patched, region = eot.apply_patches(
            k_apply, images, boxes, boxes_valid,
            jnp.zeros_like(train_patches[0]),  # unused placeholder
            eot_kwargs.pop("adv_scale_override", 0.0),
            tolerance=eot_kwargs.pop("tolerance", TRAIN_TOLERANCE),
            noise_mag=eot_kwargs.pop("noise_mag", NOISE_MAG),
            random_scale_range=eot_kwargs.pop("random_scale_range",
                                              TRAIN_SCALE_RANGE),
            per_image_patches=train_patches, **eot_kwargs)
    else:
        assert adv_patch is not None, "eval mode needs the adversarial patch"
        # training-only hooks are inert in eval mode; drop them instead of
        # letting them fall through to eot.apply_patches (TypeError)
        eot_kwargs.pop("train_patches", None)
        eot_kwargs.pop("adv_scale_override", None)
        patched, region = eot.apply_patches(
            k_apply, images, boxes, boxes_valid, adv_patch, adv_scale,
            tolerance=eot_kwargs.pop("tolerance", 0.0),
            noise_mag=eot_kwargs.pop("noise_mag", NOISE_MAG), **eot_kwargs)
    targets = jnp.where(region[..., None], images - patched, 0.0)
    if return_region:
        return patched, targets, region
    return patched, targets
