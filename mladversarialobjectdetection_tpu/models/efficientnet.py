"""EfficientNet / EfficientNet-lite backbone in Flax, TPU-first.

Behavioral parity with reference backbone/efficientnet_model.py (Stem 507,
MBConvBlock 224-417, Model 605-780) and the builder tables
(backbone/efficientnet_builder.py:30-45, efficientnet_lite_builder.py:33-79):
block-string decoding, width/depth rounding (round_filters 129-143,
round_repeats 146-151), lite specifics (relu6, no squeeze-excite, unscaled
stem/head via fix_head_stem), and the reduction_1..5 feature endpoints that
feed the BiFPN.

Design: the architecture is fully resolved into a static, hashable
`BackboneSpec` before module construction, so the Flax module tree is flat
and trace-time cheap. BatchNorm supports an optional `axis_name` for
cross-replica sync (the TPU equivalent of the reference's
TpuBatchNormalization, automl utils.py:166-203) — unused when frozen.
"""
from __future__ import annotations

import math
import re
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BlockArgs(NamedTuple):
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    id_skip: bool
    se_ratio: Optional[float]
    strides: Tuple[int, int]


class BackboneSpec(NamedTuple):
    """Fully-resolved static backbone description (hashable)."""
    blocks: Tuple[BlockArgs, ...]  # repeats already expanded
    stem_filters: int
    act_type: str
    use_se: bool
    bn_momentum: float
    bn_epsilon: float
    survival_prob: Optional[float]


# (width_coefficient, depth_coefficient, resolution, dropout_rate) — parity
# with efficientnet_builder.py:32-45 and efficientnet_lite_builder.py:36-43.
PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-lite0": (1.0, 1.0, 224, 0.2),
    "efficientnet-lite1": (1.0, 1.1, 240, 0.2),
    "efficientnet-lite2": (1.1, 1.2, 260, 0.3),
    "efficientnet-lite3": (1.2, 1.4, 280, 0.3),
    "efficientnet-lite4": (1.4, 1.8, 300, 0.3),
}

# efficientnet_lite_builder.py:47-52 / efficientnet_builder default blocks
DEFAULT_BLOCK_STRINGS = (
    "r1_k3_s11_e1_i32_o16_se0.25",
    "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25",
    "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25",
    "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
)


def decode_block_string(s: str) -> BlockArgs:
    """Decode 'r1_k3_s11_e1_i32_o16_se0.25' (efficientnet_builder.py:52-77)."""
    options = {}
    for op in s.split("_"):
        splits = re.split(r"(\d.*)", op)
        if len(splits) >= 2:
            options[splits[0]] = splits[1]
    return BlockArgs(
        kernel_size=int(options["k"]),
        num_repeat=int(options["r"]),
        input_filters=int(options["i"]),
        output_filters=int(options["o"]),
        expand_ratio=int(options["e"]),
        id_skip="noskip" not in s,
        se_ratio=float(options["se"]) if "se" in options else None,
        strides=(int(options["s"][0]), int(options["s"][1])),
    )


def round_filters(filters: int, width_coefficient: float,
                  divisor: int = 8, skip: bool = False) -> int:
    """Parity with efficientnet_model.py:129-143."""
    if skip or not width_coefficient:
        return int(filters)
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


def activation(x: jnp.ndarray, act_type: str) -> jnp.ndarray:
    """Parity with automl utils.py:36-53 activation_fn."""
    if act_type in ("swish", "silu"):
        return jax.nn.silu(x)
    if act_type == "swish_native":
        return x * jax.nn.sigmoid(x)
    if act_type == "relu":
        return jax.nn.relu(x)
    if act_type == "relu6":
        return jax.nn.relu6(x)
    if act_type == "hswish":
        return x * jax.nn.relu6(x + 3) / 6
    if act_type == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    raise ValueError(f"Unsupported act_type {act_type}")


def get_backbone_spec(backbone_name: str, survival_prob: Optional[float] = None
                      ) -> BackboneSpec:
    """Resolve a backbone name into a static spec (builder parity)."""
    if backbone_name not in PARAMS:
        raise ValueError(f"Unknown backbone {backbone_name}")
    width, depth, _, _ = PARAMS[backbone_name]
    is_lite = "lite" in backbone_name
    fix_head_stem = is_lite  # lite: don't scale stem/head
    use_se = not is_lite
    act_type = "relu6" if is_lite else "swish"

    raw_blocks = [decode_block_string(s) for s in DEFAULT_BLOCK_STRINGS]
    expanded: list[BlockArgs] = []
    n = len(raw_blocks)
    for i, ba in enumerate(raw_blocks):
        in_f = round_filters(ba.input_filters, width)
        out_f = round_filters(ba.output_filters, width)
        if fix_head_stem and (i == 0 or i == n - 1):
            repeats = ba.num_repeat
        else:
            repeats = round_repeats(ba.num_repeat, depth)
        first = ba._replace(input_filters=in_f, output_filters=out_f,
                            num_repeat=1)
        expanded.append(first)
        for _ in range(repeats - 1):
            expanded.append(first._replace(input_filters=out_f,
                                           strides=(1, 1)))
    stem_filters = round_filters(raw_blocks[0].input_filters, width,
                                 skip=fix_head_stem)
    return BackboneSpec(tuple(expanded), stem_filters, act_type, use_se,
                        bn_momentum=0.99, bn_epsilon=1e-3,
                        survival_prob=survival_prob)


_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNorm(nn.Module):
    """BatchNorm with optional cross-replica sync via axis_name.

    The TPU equivalent of TpuBatchNormalization / SyncBatchNormalization
    (automl utils.py:166-241): when `axis_name` is set and training, flax
    reduces batch statistics with lax.pmean over the mesh axis. `dtype`
    is the COMPUTE dtype (bf16 under mixed precision; params stay f32 —
    without it flax promotes bf16 activations back to f32 at every layer).
    """
    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool):
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if training else None,
            dtype=self.dtype,
            name="bn")(x)


def drop_connect(x, key, survival_prob: float):
    """Stochastic depth (automl utils.py:329-341)."""
    b = x.shape[0]
    mask = jax.random.bernoulli(key, survival_prob, (b, 1, 1, 1))
    return x / survival_prob * mask.astype(x.dtype)


class SqueezeExcite(nn.Module):
    se_filters: int
    output_filters: int
    act_type: str
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_filters, (1, 1), kernel_init=_conv_init,
                    dtype=self.dtype, name="reduce")(pooled)
        s = activation(s, self.act_type)
        s = nn.Conv(self.output_filters, (1, 1), kernel_init=_conv_init,
                    dtype=self.dtype, name="expand")(s)
        return jax.nn.sigmoid(s) * x


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck (efficientnet_model.py:224-417)."""
    args: BlockArgs
    spec: BackboneSpec
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool, survival_prob: Optional[float] = None):
        ba = self.args
        inputs = x

        bn = lambda name: BatchNorm(self.spec.bn_momentum, self.spec.bn_epsilon,
                                    self.bn_axis_name, self.dtype, name=name)
        if ba.expand_ratio != 1:
            filters = ba.input_filters * ba.expand_ratio
            x = nn.Conv(filters, (1, 1), use_bias=False, kernel_init=_conv_init,
                        dtype=self.dtype, name="expand_conv")(x)
            x = activation(bn("bn0")(x, training), self.spec.act_type)
        else:
            # no expansion: depthwise operates on the actual input channels
            # (the lite stem is unscaled while block args are width-rounded)
            filters = x.shape[-1]

        # depthwise
        x = nn.Conv(filters, (ba.kernel_size, ba.kernel_size),
                    strides=ba.strides, feature_group_count=filters,
                    use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = activation(bn("bn1")(x, training), self.spec.act_type)

        if self.spec.use_se and ba.se_ratio:
            se_filters = max(1, int(ba.input_filters * ba.se_ratio))
            x = SqueezeExcite(se_filters, filters, self.spec.act_type,
                              self.dtype, name="se")(x)

        x = nn.Conv(ba.output_filters, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name="project_conv")(x)
        x = bn("bn2")(x, training)

        if (ba.id_skip and ba.strides == (1, 1)
                and ba.input_filters == ba.output_filters):
            if training and survival_prob:
                key = self.make_rng("dropout")
                x = drop_connect(x, key, survival_prob)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """Backbone returning reduction_1..5 endpoints (features_only mode,
    efficientnet_model.py:711-780)."""
    spec: BackboneSpec
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        spec = self.spec
        x = nn.Conv(spec.stem_filters, (3, 3), strides=(2, 2), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name="stem_conv")(x)
        x = BatchNorm(spec.bn_momentum, spec.bn_epsilon, self.bn_axis_name,
                      self.dtype, name="stem_bn")(x, training)
        x = activation(x, spec.act_type)

        endpoints = []
        n_blocks = len(spec.blocks)
        for idx, ba in enumerate(spec.blocks):
            survival_prob = None
            if spec.survival_prob:
                drop_rate = 1.0 - spec.survival_prob
                survival_prob = 1.0 - drop_rate * float(idx) / n_blocks
            x = MBConvBlock(ba, spec, self.bn_axis_name, self.dtype,
                            name=f"blocks_{idx}")(x, training, survival_prob)
            is_reduction = (idx == n_blocks - 1 or
                            spec.blocks[idx + 1].strides[0] > 1)
            if is_reduction:
                endpoints.append(x)
        # endpoints == [reduction_1 .. reduction_5]
        return endpoints
