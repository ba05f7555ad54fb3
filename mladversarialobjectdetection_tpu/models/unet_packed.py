"""Space-to-depth lane-packed attention U-Net defender (TPU-native layout).

Same model as models/unet.PatchNeutralizer (reference generator.py:17-261)
with the SAME parameter/batch_stats pytree — checkpoints are interchangeable
both ways — but the full-resolution stages compute in a space-to-depth
packed layout: a [B, 640, 640, 8] activation becomes [B, 320, 320, 32].

Why: on TPU the channel (lane) dimension pads to 128. The reference
architecture's n_filters=8 means every 640x640 tensor moves 12-16x its
logical bytes through HBM (BENCH_NOTES.md "Defender training": the U-Net
fwd+bwd is 219 ms / 134 GB of the 310 ms step, and three kernel-level
reformulations all lost to XLA's padded direct conv). Packing 2x2 pixel
blocks into channels quarters that padding tax at identical semantics:

- 3x3 SAME conv  -> 3x3 conv on the packed grid with a sparse
  [3,3,4Ci,4Co] block kernel built from the original [3,3,Ci,Co] weights
  (per output phase only 2 of the 3 taps are live; invalid taps are 0).
  Exactly the same set of multiply-adds, so fwd AND grads match the
  unpacked module to float tolerance.
- ConvTranspose stride 2 -> a 2x2 conv from the UNPACKED input to the
  packed output (the classic sub-pixel decomposition): flax lowers
  o[2i+dy] += K[dy] . x[i], so output phase p' takes taps dy = p' and
  dy = p'+2.
- 2x2/2 max-pool -> max over the 4 phase channels (pool windows align
  exactly with the packed blocks).
- BatchNorm -> phase-grouped stats: mean/var over (batch, h, w, phase)
  reproduce the unpacked per-channel statistics bit-for-bit in exact
  arithmetic (same value set), with [C] running stats as before.
- 1x1 convs (attention gates, output head) -> per-phase einsum.

The one intentional delta: dropout masks inside the packed deconv3 block
are drawn over the packed shape, so individual masks differ from the
unpacked module (same iid Bernoulli distribution). Everything else —
including fresh-init parameter values, which depend only on the scope
paths shared with PatchNeutralizer — is equivalent; see
tests/test_unet_packed.py.

Packed tensor convention: [B, H/2, W/2, 4*C] with channel index
(p*2 + q)*C + c, where (p, q) is the pixel's offset inside its 2x2 block.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .unet import BN_EPS, LEAKY_SLOPE, ConvBlock, DeconvBlock, _he_init

_lecun_init = nn.initializers.lecun_normal()  # nn.Conv's default


# -- packed layout helpers ---------------------------------------------------

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (phase-major channel packing)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """[B, H/2, W/2, 4C] -> [B, H, W, C] (inverse of space_to_depth)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _phase_tap_table() -> np.ndarray:
    """T[k, p, P, d] = 1 iff original tap d (of a 3x3 SAME conv) maps to
    packed-grid tap k when the input phase is p and the output phase is P:
    d = 2k + p - P - 1."""
    t = np.zeros((3, 2, 2, 3), np.float32)
    for k in range(3):
        for p in range(2):
            for pp in range(2):
                d = 2 * k + p - pp - 1
                if 0 <= d < 3:
                    t[k, p, pp, d] = 1.0
    return t


_T3 = _phase_tap_table()


def pack_conv3_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Ci, Co] -> [3, 3, 4Ci, 4Co] packed block kernel.

    The packed conv (SAME, stride 1, on the half-resolution grid) computes
    exactly the original 3x3 SAME conv: each (input phase, output phase,
    tap) combination routes the original weight, everything else is 0.
    """
    t = jnp.asarray(_T3, w.dtype)
    kh, kw, ci, co = w.shape
    wp = jnp.einsum("apPd,bqQe,decf->abpqcPQf", t, t, w)
    return wp.reshape(kh, kw, 4 * ci, 4 * co)


def pack_convT_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Ci, Co] ConvTranspose(stride 2, SAME) kernel -> [2, 2, Ci, 4Co]
    regular-conv kernel from the UNPACKED input to the PACKED output.

    flax/jax lower the SAME stride-2 transpose conv as
    o[2i + 2 - dy] += K[dy] . x[i] (kernel spatially flipped; verified
    numerically), so output phase p' at block ib reads x[ib + kt - 1]
    with dy = 2 kt - p'; apply with explicit padding ((1, 0), (1, 0)).
    """
    t = np.zeros((2, 2, 3), np.float32)  # [kt, p', dy]
    for kt in range(2):
        for pp in range(2):
            d = 2 * kt - pp
            if 0 <= d < 3:
                t[kt, pp, d] = 1.0
    t = jnp.asarray(t, w.dtype)
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.einsum("aPd,bQe,decf->abcPQf", t, t, w)
    return wp.reshape(2, 2, ci, 4 * co)


def _conv(x, w, b, padding):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.reshape((1, 1, 1, -1))


def packed_conv3(x, kernel, bias, dtype):
    """3x3 SAME conv in the packed domain. `kernel` is the original
    [3, 3, Ci, Co]; `bias` is [Co]."""
    wp = pack_conv3_kernel(kernel)
    bp = jnp.tile(bias, 4)
    if dtype is not None:
        x, wp, bp = x.astype(dtype), wp.astype(dtype), bp.astype(dtype)
    return _conv(x, wp, bp, ((1, 1), (1, 1)))


def packed_convT(x, kernel, bias, dtype):
    """ConvTranspose(stride 2, k3, SAME) from unpacked x to packed output."""
    wp = pack_convT_kernel(kernel)
    bp = jnp.tile(bias, 4)
    if dtype is not None:
        x, wp, bp = x.astype(dtype), wp.astype(dtype), bp.astype(dtype)
    return _conv(x, wp, bp, ((1, 0), (1, 0)))


def packed_1x1(x, kernel, bias, dtype):
    """1x1 conv applied per phase (no zero-padded block kernel needed)."""
    w = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    if dtype is not None:
        x, w, bias = x.astype(dtype), w.astype(dtype), bias.astype(dtype)
    b, h, ww, c4 = x.shape
    ci = w.shape[0]
    y = jnp.einsum("bhwpc,cd->bhwpd", x.reshape(b, h, ww, 4, ci), w) + bias
    return y.reshape(b, h, ww, 4 * w.shape[1])


def phase_max(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max-pool of the underlying image = max over the 4 phases."""
    b, h, w, c4 = x.shape
    return x.reshape(b, h, w, 4, c4 // 4).max(axis=3)


def phase_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of the underlying images, in packed layout."""
    bb, h, w, ca = a.shape
    cb = b.shape[-1]
    y = jnp.concatenate([a.reshape(bb, h, w, 4, ca // 4),
                         b.reshape(bb, h, w, 4, cb // 4)], axis=-1)
    return y.reshape(bb, h, w, ca + cb)


# -- parameter shells (same scope paths/shapes as the unpacked modules) ------

class _ConvParams(nn.Module):
    """Declares nn.Conv-shaped params without running the conv."""
    shape: Sequence[int]  # [kh, kw, Ci, Co]
    kernel_init: object = _he_init

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.param("kernel", self.kernel_init, tuple(self.shape))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.shape[-1],))
        return k, b


class _PackedBN(nn.Module):
    """BatchNorm over packed tensors with phase-grouped statistics.

    Parameters and running stats are [features] exactly like the unpacked
    nn.BatchNorm; batch stats reduce over (B, h, w, phase), which is the
    same value set the unpacked module reduces over. Mirrors flax
    BatchNorm semantics: f32 stats, fast variance (E[x^2]-E[x]^2 clipped
    at 0), momentum .99, eps 1e-3, no running update while initializing.
    """
    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        if training:
            b, h, w, _ = x.shape
            # like flax _compute_stats: promote to AT LEAST float32 (f64
            # inputs keep f64, which the equivalence tests rely on)
            stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
            xf = x.astype(stat_dtype).reshape(b, h, w, 4, self.features)
            mu = xf.mean(axis=(0, 1, 2, 3))
            mu2 = (xf * xf).mean(axis=(0, 1, 2, 3))
            var = jnp.maximum(0.0, mu2 - mu * mu)
            if not self.is_initializing():
                ra_mean.value = 0.99 * ra_mean.value + 0.01 * mu
                ra_var.value = 0.99 * ra_var.value + 0.01 * var
        else:
            mu, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + BN_EPS) * scale
        y = (x - jnp.tile(mu, 4)) * jnp.tile(mul, 4) + jnp.tile(bias, 4)
        out_dtype = x.dtype if self.dtype is None else self.dtype
        return y.astype(out_dtype)


# -- packed blocks ------------------------------------------------------------

class _PackedConvBlock(nn.Module):
    """ConvBlock (two 3x3 conv + BN + leaky_relu) in the packed domain.

    Scope-path/param parity with unet.ConvBlock: children cnv1/cnv2,
    bn1/bn2, anonymous Dropout.
    """
    n_filters: int
    in_features: int
    batchnorm: bool = True
    dropout: Optional[float] = None
    maxpool: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, xp, training: bool = False):
        cin = self.in_features
        for j in (1, 2):
            k, b = _ConvParams((3, 3, cin, self.n_filters),
                               name=f"cnv{j}")()
            xp = packed_conv3(xp, k, b, self.dtype)
            if self.batchnorm:
                xp = _PackedBN(self.n_filters, dtype=self.dtype,
                               name=f"bn{j}")(xp, training)
            xp = nn.leaky_relu(xp, LEAKY_SLOPE)
            cin = self.n_filters
        if self.maxpool:
            f = phase_max(xp)  # unpacked, half resolution
            if self.dropout:
                f = nn.Dropout(self.dropout, deterministic=not training)(f)
            return xp, f
        if self.dropout:
            return nn.Dropout(self.dropout,
                              deterministic=not training)(xp)
        return xp


class _PackedAttention(nn.Module):
    """AttentionBlock in the packed domain (all 1x1 convs -> per-phase
    einsums; BN3 normalizes the single gate channel over phases too)."""
    n_filters: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, up_p, skip_p, training: bool = False):
        nf = self.n_filters
        k, b = _ConvParams((1, 1, nf, nf), kernel_init=_lecun_init,
                           name="cnv1")()
        g = packed_1x1(up_p, k, b, self.dtype)
        g = _PackedBN(nf, dtype=self.dtype, name="bn1")(g, training)
        k, b = _ConvParams((1, 1, nf, nf), kernel_init=_lecun_init,
                           name="cnv2")()
        x = packed_1x1(skip_p, k, b, self.dtype)
        x = _PackedBN(nf, dtype=self.dtype, name="bn2")(x, training)
        x = nn.leaky_relu(g + x, LEAKY_SLOPE)
        k, b = _ConvParams((1, 1, nf, 1), kernel_init=_lecun_init,
                           name="conv3")()
        x = packed_1x1(x, k, b, self.dtype)                 # [B, h, w, 4]
        x = _PackedBN(1, dtype=self.dtype, name="bn3")(x, training)
        x = jax.nn.sigmoid(x)
        b_, h, w, c4 = skip_p.shape
        gated = skip_p.reshape(b_, h, w, 4, c4 // 4) * x[..., None]
        return gated.reshape(b_, h, w, c4)


class _PackedDeconvBlock(nn.Module):
    """DeconvBlock in the packed domain: sub-pixel ConvTranspose from the
    unpacked input straight into packed layout, packed attention gating,
    phase-aware concat, packed ConvBlock."""
    n_filters: int
    in_features: int
    dropout: Optional[float] = None
    batchnorm: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, skip_p, training: bool = False):
        nf = self.n_filters
        k, b = _ConvParams((3, 3, self.in_features, nf), name="cnv")()
        up_p = packed_convT(x, k, b, self.dtype)
        skip_p = _PackedAttention(nf, dtype=self.dtype,
                                  name="attention")(up_p, skip_p, training)
        xp = phase_concat(up_p, skip_p)
        if self.dropout:
            # same iid Bernoulli mask distribution as the unpacked module,
            # drawn over the packed shape (arrangement differs)
            xp = nn.Dropout(self.dropout, deterministic=not training)(xp)
        xp = _PackedConvBlock(nf, 2 * nf, maxpool=False,
                              batchnorm=self.batchnorm, dtype=self.dtype,
                              name="convblock")(xp, training)
        return xp


class PackedPatchNeutralizer(nn.Module):
    """PatchNeutralizer with the high-resolution stages space-to-depth
    packed. Identical variable pytree; opt-in via
    PatchAttackDefender(packed=True).

    `packed_levels` controls how deep the packing reaches (resolution
    level i runs at H/2^i with n_filters*2^i channels):

    - 1: encoder conv0, decoder deconv3, output head (the 640px C=8
      stages — a 4x cut of their 16x lane-padding tax)
    - 2: + conv1/deconv2 (320px C=16, 8x -> 2x tax)
    - 3: + conv2/deconv1 (160px C=32 -> 128 packed, a PERFECT lane fit)

    Packed decoder stages above level 0 end with a depth_to_space so the
    next (higher-resolution) stage's sub-pixel ConvTranspose reads the
    plain layout it expects.
    """
    n_filters: int = 8
    dropout: float = 0.2
    batchnorm: bool = True
    dtype: Optional[object] = None
    packed_levels: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        nf = self.n_filters
        dt = self.dtype
        pl = self.packed_levels
        if not 1 <= pl <= 3:
            raise ValueError(f"packed_levels must be in 1..3, got {pl}")
        if dt is not None:
            x = x.astype(dt)
        f = x
        skips = []  # (is_packed, tensor), resolution level i
        for i in range(4):
            nf_i = nf * (2 ** i)
            if i < pl:
                skip_p, f = _PackedConvBlock(
                    nf_i, f.shape[-1], batchnorm=self.batchnorm,
                    dropout=self.dropout, dtype=dt,
                    name=f"conv{i}")(space_to_depth(f), training)
                skips.append((True, skip_p))
            else:
                skip, f = ConvBlock(nf_i, batchnorm=self.batchnorm,
                                    dropout=self.dropout, dtype=dt,
                                    name=f"conv{i}")(f, training)
                skips.append((False, skip))
        f = ConvBlock(nf * 16, batchnorm=self.batchnorm, maxpool=False,
                      dtype=dt, name="conv4")(f, training)
        m = 8
        for i, (packed, skip) in enumerate(reversed(skips)):
            level = 3 - i
            nf_i = int(nf * m)
            if packed:
                f = _PackedDeconvBlock(
                    nf_i, f.shape[-1], dropout=self.dropout,
                    batchnorm=self.batchnorm, dtype=dt,
                    name=f"deconv{i}")(f, skip, training)
                if level > 0:
                    # boundary: the next stage's sub-pixel ConvTranspose
                    # takes the plain layout
                    f = depth_to_space(f)
            else:
                f = DeconvBlock(nf_i, dropout=self.dropout,
                                batchnorm=self.batchnorm, dtype=dt,
                                name=f"deconv{i}")(f, skip, training)
            m /= 2
        k, b = _ConvParams((1, 1, nf, 3), name="output")()
        yp = packed_1x1(f, k, b, dt)
        return depth_to_space(jnp.tanh(yp)).astype(jnp.float32)
