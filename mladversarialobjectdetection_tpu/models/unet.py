"""Attention U-Net defender (patch detection + background recovery) in Flax.

Behavioral parity with reference generator.py (UNetBackBone 17-68,
PatchNeutralizer 71-96, AttentionBlock 99-150, Conv2DBlock 153-214,
Conv2DTransposeBlock 217-261): 4 encoder Conv2DBlocks with filters
n_filters * 2^i, a bottleneck block, 4 decoder transpose blocks with
attention-gated skip connections (arXiv 1804.03999), leaky-relu activations,
BatchNorm, dropout 0.2, and a 1x1 tanh output head producing a 3-channel
"update" image.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_he_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

# Keras-parity constants (the reference U-Net is plain tf.keras layers):
# Activation('leaky_relu') resolves to negative_slope 0.2, and
# BatchNormalization uses epsilon 1e-3 / momentum .99 (generator.py:120,
# 172; tf.keras defaults) — both differ from the flax defaults (0.01 /
# 1e-5), and both matter for loading reference antipatch.h5 weights.
# NOTE: defender pytree checkpoints saved before this parity fix were
# trained at the old flax defaults; reloading them here changes their
# forward pass slightly — retrain (defense/train.py) for best recovery.
LEAKY_SLOPE = 0.2
BN_EPS = 1e-3


def _bn(training: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not training, epsilon=BN_EPS,
                        momentum=0.99, dtype=dtype, name=name)


class ConvBlock(nn.Module):
    """Two 3x3 conv + BN + leaky_relu (generator.py:153-214)."""
    n_filters: int
    kernel_size: int = 3
    batchnorm: bool = True
    dropout: Optional[float] = None
    maxpool: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        for j in (1, 2):
            x = nn.Conv(self.n_filters,
                        (self.kernel_size, self.kernel_size),
                        kernel_init=_he_init, dtype=self.dtype,
                        name=f"cnv{j}")(x)
            if self.batchnorm:
                x = _bn(training, self.dtype, f"bn{j}")(x)
            x = nn.leaky_relu(x, LEAKY_SLOPE)
        if self.maxpool:
            f = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.dropout:
                f = nn.Dropout(self.dropout, deterministic=not training)(f)
            return x, f  # (skip, downsampled)
        if self.dropout:
            return nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class AttentionBlock(nn.Module):
    """Convolutional attention gating (generator.py:99-150)."""
    n_filters: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, up_in, skip_in, training: bool = False):
        g = nn.Conv(self.n_filters, (1, 1), dtype=self.dtype,
                    name="cnv1")(up_in)
        g = _bn(training, self.dtype, "bn1")(g)
        x = nn.Conv(self.n_filters, (1, 1), dtype=self.dtype,
                    name="cnv2")(skip_in)
        x = _bn(training, self.dtype, "bn2")(x)
        x = nn.leaky_relu(g + x, LEAKY_SLOPE)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv3")(x)
        x = _bn(training, self.dtype, "bn3")(x)
        x = jax.nn.sigmoid(x)
        return skip_in * x


class DeconvBlock(nn.Module):
    """Transpose conv upsample + attention-gated skip concat + ConvBlock
    (generator.py:217-261)."""
    n_filters: int
    kernel_size: int = 3
    dropout: Optional[float] = None
    batchnorm: bool = True
    attention: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, skip, training: bool = False):
        x = nn.ConvTranspose(self.n_filters,
                             (self.kernel_size, self.kernel_size),
                             strides=(2, 2), kernel_init=_he_init,
                             dtype=self.dtype, name="cnv")(x)
        if self.attention:
            skip = AttentionBlock(self.n_filters, dtype=self.dtype,
                                  name="attention")(x, skip, training)
        x = jnp.concatenate([x, skip], axis=-1)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = ConvBlock(self.n_filters, self.kernel_size, maxpool=False,
                      batchnorm=self.batchnorm, dtype=self.dtype,
                      name="convblock")(x, training)
        return x


class PatchNeutralizer(nn.Module):
    """Attention U-Net + 1x1 tanh head (generator.py:17-96).

    Output is the defender "update": 2 * output added to the input image
    neutralizes detected patches (attack_detection.py:190). `dtype` is the
    compute dtype (bf16 under mixed precision); the output is cast to f32.
    """
    n_filters: int = 8
    dropout: float = 0.2
    batchnorm: bool = True
    dtype: Optional[object] = None
    # remat: recompute each block (incl. its dropout masks, replayed from
    # the same rng) in the backward pass instead of storing activations.
    # A MEMORY knob, not a speed knob: measured at 640x640/b24 bf16 the
    # rematted fwd+bwd moves MORE bytes (194 vs 134 GB, 315 vs 219 ms —
    # BENCH_NOTES.md) because the recompute re-reads block inputs and
    # redoes the BN-stats passes; use only when activations don't fit.
    remat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        conv_block, deconv_block = ConvBlock, DeconvBlock
        if self.remat:
            conv_block = nn.remat(ConvBlock, static_argnums=(2,))
            deconv_block = nn.remat(DeconvBlock, static_argnums=(3,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        skips = []
        for i in range(4):
            skip, x = conv_block(self.n_filters * (2 ** i),
                                 batchnorm=self.batchnorm,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name=f"conv{i}")(x, training)
            skips.append(skip)
        x = conv_block(self.n_filters * (2 ** 4), batchnorm=self.batchnorm,
                       maxpool=False, dtype=self.dtype,
                       name="conv4")(x, training)
        m = 8
        for i, skip in enumerate(reversed(skips)):
            x = deconv_block(int(self.n_filters * m),
                             dropout=self.dropout,
                             batchnorm=self.batchnorm, dtype=self.dtype,
                             name=f"deconv{i}")(x, skip, training)
            m /= 2
        x = nn.Conv(3, (1, 1), kernel_init=_he_init, dtype=self.dtype,
                    name="output")(x)
        return jnp.tanh(x).astype(jnp.float32)
