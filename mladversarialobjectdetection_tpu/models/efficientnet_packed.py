"""Space-to-depth lane-packed EfficientNet ENTRY stages (TPU layout).

Same network as models/efficientnet.EfficientNet with the SAME
parameter/batch_stats pytree — checkpoints interop both ways — but the
leading high-resolution stages compute in a 2x2 space-to-depth packed
layout: a [B, 768, 768, 32] activation becomes [B, 384, 384, 128].

Why: TPU pads the channel (lane) dim to 128 in both vregs and HBM tile
layout, so the C=32/64 entry stages of the big backbones move ~4x/2x
their logical bytes (tools/profile_hlo.py: d7x@1536 blocks 0-9 = 68 ms of
the 148 ms backbone at 242 GB/s achieved — the lane-padding tax). The
identical trick won +53% on the n_filters=8 U-Net
(models/unet_packed.py). Reference structure being rebuilt:
efficientnet_model.py:224-417 (MBConvBlock), :507-529 (Stem).

Op mapping (packed layout is PHASE-MAJOR: channel = (p*2+q)*C + c,
matching models/unet_packed.py):

- stem s2 conv 3->S: a stride-4 conv writing the packed layout directly
  ([5,5,3,4S] kernel holding the [3,3,3,S] weights at the four phase
  offsets) — the image is read once, no relayout.
- 1x1 expand/project: per-phase einsum (the packed positions are just
  more rows of the same GEMM) — models/unet_packed.packed_1x1 sans bias.
- depthwise s1 kxk: grouped conv on a CHANNEL-MAJOR view
  ([pk,pk,4,4C], feature_group_count=C, pk=3 for k3 and k5), with
  minor-dim permutations pm<->cm around it (XLA grouped-conv groups are
  contiguous channel ranges, so each channel's four phases must be
  adjacent). The permutes cost two packed-size copies — 4x smaller than
  the unpacked padded tensors they replace.
- depthwise s2 kxk: the natural EXIT from packed mode — a stride-1
  grouped conv from the packed grid straight to the UNPACKED half-res
  output ([pk,pk,4,C], fgc=C; out rows 2o+t map to packed rows
  o + (t-pad)/2), after which the block (SE, project, bn2) and all later
  blocks run unpacked.
- BatchNorm: phase-grouped statistics over (B, H, W, phase) — the same
  value set as the unpacked per-channel stats; params/running stats stay
  [C] (models/unet_packed._PackedBN generalized with the backbone's
  momentum/epsilon).
- SqueezeExcite: global mean pools over phases too; the per-channel gate
  broadcasts back with a phase-major tile.
- drop_connect/residual-add: shape-agnostic, unchanged.

`packed_blocks` = number of leading blocks computed packed. A stride-2
block inside that range exits packed mode; if a later block is still
inside the range it re-packs (space_to_depth) at block entry — one packed
segment per resolution stage. Packed reduction endpoints are returned
depth_to_space'd; the FPN consumes only reductions >= min_level, so XLA
dead-code-eliminates those conversions in the detector program.

Sync-BN (bn_axis_name) is not supported in packed mode — the packed
region is an inference/victim-forward optimization; training with
cross-replica BN uses the unpacked module.

MEASURED VERDICT (round 5, real chip — docs/PACKED_BACKBONE.md): a
LOSS at every production operating point. The current XLA toolchain
lowers the required 4-channel-group depthwise through an intermediate
whose per-group minor dim (=1) is lane-padded 128x, which OOMs the
giants' and lite4's serve compiles outright and runs the lite4 attack
step 2.4x slower (56.8 vs 137.7 img/s). This module stays as an
equivalence-tested opt-in measurement lever; every default is unpacked.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .efficientnet import (BackboneSpec, BlockArgs, _conv_init, activation,
                           drop_connect)
from .unet_packed import depth_to_space, space_to_depth


# -- layout helpers -----------------------------------------------------------

def pm_to_cm(xp: jnp.ndarray) -> jnp.ndarray:
    """Phase-major [.., 4C] (ph*C + c) -> channel-major (c*4 + ph)."""
    b, h, w, c4 = xp.shape
    c = c4 // 4
    return (xp.reshape(b, h, w, 4, c).transpose(0, 1, 2, 4, 3)
            .reshape(b, h, w, c4))


def cm_to_pm(xc: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c4 = xc.shape
    c = c4 // 4
    return (xc.reshape(b, h, w, c, 4).transpose(0, 1, 2, 4, 3)
            .reshape(b, h, w, c4))


# -- packed kernel constructors (trace-time einsum against constant maps) ----

def _dw_map_s1(k: int) -> np.ndarray:
    """[pk,pk,4(iph),4(oph),k,k] 0/1 map for the s1 packed depthwise."""
    r = k // 2
    lo = (0 - r) // 2
    hi = (1 + r) // 2
    pk = hi - lo + 1
    ctr = -lo
    m = np.zeros((pk, pk, 4, 4, k, k), np.float32)
    for p in range(2):
        for q in range(2):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    ip, iq = (p + dy) % 2, (q + dx) % 2
                    ty, tx = (p + dy) // 2 + ctr, (q + dx) // 2 + ctr
                    m[ty, tx, ip * 2 + iq, p * 2 + q, dy + r, dx + r] = 1.0
    return m


def _dw_map_s2(k: int) -> Tuple[np.ndarray, int, int]:
    """[pk,pk,4(iph),k,k] map for the s2 packed->unpacked depthwise,
    plus the explicit (lo, hi) padding of the stride-1 packed conv.

    Unpacked SAME s2 on even H: pad_lo = (k - 2) // 2 (0 for k3, 1 for
    k5); out[o] reads unpacked rows 2o + t - pad_lo = packed row
    o + (t - pad_lo)//2, phase (t - pad_lo) % 2."""
    pad_lo = (k - 2) // 2
    offs = [(t - pad_lo) // 2 for t in range(k)]
    lo, hi = min(offs), max(offs)
    pk = hi - lo + 1
    m = np.zeros((pk, pk, 4, k, k), np.float32)
    for dy in range(k):
        for dx in range(k):
            ty, tx = offs[dy] - lo, offs[dx] - lo
            ip = (dy - pad_lo) % 2
            iq = (dx - pad_lo) % 2
            m[ty, tx, ip * 2 + iq, dy, dx] = 1.0
    return m, -lo, hi


def pack_dw_kernel_s1(kdw: jnp.ndarray) -> jnp.ndarray:
    """[k,k,1,C] depthwise -> [pk,pk,4,4C] channel-major grouped kernel."""
    k = kdw.shape[0]
    m = jnp.asarray(_dw_map_s1(k), kdw.dtype)
    kp = jnp.einsum("tuioyx,yxc->tuico", m, kdw[:, :, 0, :])
    pk = kp.shape[0]
    c = kdw.shape[-1]
    return kp.reshape(pk, pk, 4, 4 * c)


def pack_dw_kernel_s2(kdw: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    """[k,k,1,C] s2 depthwise -> ([pk,pk,4,C] cm grouped kernel, pad_lo,
    pad_hi) for the stride-1 packed->unpacked transition conv."""
    k = kdw.shape[0]
    m, pl, ph = _dw_map_s2(k)
    kp = jnp.einsum("tuiyx,yxc->tuic", jnp.asarray(m, kdw.dtype),
                    kdw[:, :, 0, :])
    return kp, pl, ph


def pack_stem_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,3,S] s2 stem -> [5,5,3,4S] stride-4 packed-output kernel
    (phase-major outputs). Output phase (p,q) is the s2 conv at input
    offset (2p, 2q); SAME s2 k3 on even H pads (0,1), so the packed
    stride-4 conv pads (0,1) too."""
    s = k.shape[-1]
    kp = jnp.zeros((5, 5, 3, 4 * s), k.dtype)
    for p in range(2):
        for q in range(2):
            ph = p * 2 + q
            kp = kp.at[2 * p:2 * p + 3, 2 * q:2 * q + 3, :,
                       ph * s:(ph + 1) * s].set(k)
    return kp


def _conv(x, k, strides, padding, fgc=1):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), strides, padding, feature_group_count=fgc,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_1x1(xp: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv applied per phase (no bias — backbone convs are BN'd)."""
    w = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(xp.dtype)
    b, h, ww, c4 = xp.shape
    ci = w.shape[0]
    y = jnp.einsum("bhwpc,cd->bhwpd", xp.reshape(b, h, ww, 4, ci), w)
    return y.reshape(b, h, ww, 4 * w.shape[1])


# -- parameter shells (same scope paths/shapes as the unpacked modules) ------

class _ConvKernel(nn.Module):
    """Declares an nn.Conv(use_bias=False)-shaped kernel param."""
    shape: Sequence[int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", _conv_init, tuple(self.shape))


class _PackedBNCore(nn.Module):
    """nn.BatchNorm-compatible params/stats with phase-grouped statistics
    (models/unet_packed._PackedBN with configurable momentum/epsilon).
    Operates on phase-major packed tensors; `packed=False` degrades to
    plain per-channel BN on unpacked tensors (post-transition use)."""
    features: int
    momentum: float
    epsilon: float
    packed: bool = True
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
            stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
            xf = x.astype(stat_dtype)
            if self.packed:
                xf = xf.reshape(b, h, w, 4, self.features)
                axes = (0, 1, 2, 3)
            else:
                axes = (0, 1, 2)
            mu = xf.mean(axis=axes)
            mu2 = (xf * xf).mean(axis=axes)
            var = jnp.maximum(0.0, mu2 - mu * mu)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mu
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mu, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        if self.packed:
            mu = jnp.tile(mu, 4)
            mul = jnp.tile(mul, 4)
            off = jnp.tile(bias, 4)
        else:
            off = bias
        y = (x - mu) * mul + off
        out_dtype = x.dtype if self.dtype is None else self.dtype
        return y.astype(out_dtype)


class _PackedBN(nn.Module):
    """Path-parity wrapper: efficientnet.BatchNorm nests nn.BatchNorm under
    child name 'bn', so params live at <name>/bn/{scale,bias,mean,var}."""
    features: int
    momentum: float
    epsilon: float
    packed: bool = True
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool):
        return _PackedBNCore(self.features, self.momentum, self.epsilon,
                             self.packed, self.dtype, name="bn")(x, training)


class _PackedSE(nn.Module):
    """SqueezeExcite on a phase-major packed tensor (param parity with
    efficientnet.SqueezeExcite: se/reduce, se/expand nn.Convs w/ bias)."""
    se_filters: int
    output_filters: int
    act_type: str
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, xp):
        b, h, w, c4 = xp.shape
        c = c4 // 4
        pooled = xp.reshape(b, h, w, 4, c).mean(axis=(1, 2, 3))  # [B, C]
        pooled = pooled[:, None, None, :]
        s = nn.Conv(self.se_filters, (1, 1), kernel_init=_conv_init,
                    dtype=self.dtype, name="reduce")(pooled)
        s = activation(s, self.act_type)
        s = nn.Conv(self.output_filters, (1, 1), kernel_init=_conv_init,
                    dtype=self.dtype, name="expand")(s)
        gate = jax.nn.sigmoid(s)                      # [B,1,1,C]
        return xp * jnp.tile(gate, (1, 1, 1, 4)).astype(xp.dtype)


class PackedMBConvBlock(nn.Module):
    """MBConvBlock computed on a packed input. Returns (y, packed_out):
    stride-1 blocks stay packed; stride-2 blocks exit to unpacked."""
    args: BlockArgs
    spec: BackboneSpec
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, xp, training: bool,
                 survival_prob: Optional[float] = None):
        ba = self.args
        spec = self.spec
        inputs = xp
        c_in = xp.shape[-1] // 4

        def bn(name, features, packed=True):
            return _PackedBN(features, spec.bn_momentum, spec.bn_epsilon,
                             packed, self.dtype, name=name)

        if ba.expand_ratio != 1:
            filters = ba.input_filters * ba.expand_ratio
            k = _ConvKernel((1, 1, c_in, filters), name="expand_conv")()
            xp = packed_1x1(xp, k)
            xp = activation(bn("bn0", filters)(xp, training), spec.act_type)
        else:
            filters = c_in

        kdw = _ConvKernel((ba.kernel_size, ba.kernel_size, 1, filters),
                          name="depthwise_conv")()
        s2 = ba.strides[0] > 1
        if s2:
            # transition: packed grid -> UNPACKED half-res output
            kp, pl, ph = pack_dw_kernel_s2(kdw)
            x = _conv(pm_to_cm(xp), kp, (1, 1), ((pl, ph), (pl, ph)),
                      fgc=filters)
            packed_out = False
        else:
            kp = pack_dw_kernel_s1(kdw)
            pad = (kp.shape[0] - 1) // 2
            x = cm_to_pm(_conv(pm_to_cm(xp), kp, (1, 1),
                               ((pad, pad), (pad, pad)), fgc=filters))
            packed_out = True
        x = activation(bn("bn1", filters, packed=packed_out)(x, training),
                       spec.act_type)

        if spec.use_se and ba.se_ratio:
            se_filters = max(1, int(ba.input_filters * ba.se_ratio))
            if packed_out:
                x = _PackedSE(se_filters, filters, spec.act_type,
                              self.dtype, name="se")(x)
            else:
                from .efficientnet import SqueezeExcite
                x = SqueezeExcite(se_filters, filters, spec.act_type,
                                  self.dtype, name="se")(x)

        kproj = _ConvKernel((1, 1, filters, ba.output_filters),
                            name="project_conv")()
        if packed_out:
            x = packed_1x1(x, kproj)
        else:
            x = _conv(x, kproj, (1, 1), "SAME")
        x = bn("bn2", ba.output_filters, packed=packed_out)(x, training)

        if (ba.id_skip and ba.strides == (1, 1)
                and ba.input_filters == ba.output_filters):
            if training and survival_prob:
                key = self.make_rng("dropout")
                x = drop_connect(x, key, survival_prob)
            x = x + inputs
        return x, packed_out


class PackedEntryEfficientNet(nn.Module):
    """EfficientNet with the first `packed_blocks` blocks (and the stem)
    computed in the packed layout. Pytree-identical to EfficientNet."""
    spec: BackboneSpec
    packed_blocks: int = 0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        spec = self.spec
        if self.dtype is not None:
            # nn.Conv(dtype=...) casts activations in the unpacked module;
            # the packed path does raw lax convs, so cast once up front
            x = x.astype(self.dtype)
        if self.packed_blocks > 0:
            assert x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0, (
                "packed entry needs image H/W divisible by 4", x.shape)
        kstem = _ConvKernel((3, 3, 3, spec.stem_filters),
                            name="stem_conv")()
        if self.packed_blocks > 0:
            kp = pack_stem_kernel(kstem)
            x = _conv(x, kp, (4, 4), ((0, 1), (0, 1)))
            packed = True
        else:
            x = _conv(x, kstem, (2, 2), ((0, 1), (0, 1)))
            packed = False
        x = _PackedBN(spec.stem_filters, spec.bn_momentum, spec.bn_epsilon,
                      packed, self.dtype, name="stem_bn")(x, training)
        x = activation(x, spec.act_type)

        from .efficientnet import MBConvBlock
        endpoints = []
        n_blocks = len(spec.blocks)
        for idx, ba in enumerate(spec.blocks):
            survival_prob = None
            if spec.survival_prob:
                drop_rate = 1.0 - spec.survival_prob
                survival_prob = 1.0 - drop_rate * float(idx) / n_blocks
            if idx < self.packed_blocks:
                if not packed:
                    x = space_to_depth(x)   # re-pack a later segment
                    packed = True
                x, packed = PackedMBConvBlock(
                    ba, spec, self.dtype, name=f"blocks_{idx}")(
                        x, training, survival_prob)
            else:
                if packed:
                    x = depth_to_space(x)
                    packed = False
                x = MBConvBlock(ba, spec, None, self.dtype,
                                name=f"blocks_{idx}")(x, training,
                                                      survival_prob)
            is_reduction = (idx == n_blocks - 1 or
                            spec.blocks[idx + 1].strides[0] > 1)
            if is_reduction:
                endpoints.append(depth_to_space(x) if packed else x)
        return endpoints
