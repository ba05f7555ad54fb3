"""BiFPN feature network in Flax.

Behavioral parity with reference tf2/efficientdet_keras.py:42-324 (FNode,
OpAfterCombine, ResampleFeatureMap) and tf2/fpn_configs.py:24-72 (the BiFPN
DAG topology). Weight methods supported: 'attn', 'fastattn', 'channel_attn',
'channel_fastattn', 'sum' (efficientdet_keras.py:86-119).

TPU-first notes: feature sizes per level are static (derived from the
(s-1)//2+1 chain), so resampling resolves to static max-pool / nearest
upsample ops that XLA fuses; no dynamic shape logic survives tracing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import BatchNorm, activation

_conv_init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


class FpnNode(NamedTuple):
    feat_level: int
    inputs_offsets: Tuple[int, ...]


def bifpn_topology(min_level: int, max_level: int) -> Tuple[FpnNode, ...]:
    """BiFPN node list (parity with fpn_configs.bifpn_config, 24-72)."""
    num_levels = max_level - min_level + 1
    node_ids = {min_level + i: [i] for i in range(num_levels)}
    next_id = num_levels
    nodes = []
    for i in range(max_level - 1, min_level - 1, -1):  # top-down
        nodes.append(FpnNode(i, (node_ids[i][-1], node_ids[i + 1][-1])))
        node_ids[i].append(next_id)
        next_id += 1
    for i in range(min_level + 1, max_level + 1):  # bottom-up
        nodes.append(FpnNode(i, tuple(node_ids[i]) + (node_ids[i - 1][-1],)))
        node_ids[i].append(next_id)
        next_id += 1
    return tuple(nodes)


def qufpn_topology(min_level: int, max_level: int) -> Tuple[FpnNode, ...]:
    """Quad-FPN node list (parity with fpn_configs.qufpn_config, 75-163)."""
    num_levels = max_level - min_level + 1
    node_ids = {min_level + i: [i] for i in range(num_levels)}
    next_id = num_levels
    nodes = []

    def add(level, offsets):
        nonlocal next_id
        nodes.append(FpnNode(level, tuple(offsets)))
        node_ids[level].append(next_id)
        next_id += 1

    for i in range(max_level - 1, min_level - 1, -1):  # top-down 1
        add(i, [node_ids[i][-1], node_ids[i + 1][-1]])
    node_ids[max_level].append(node_ids[max_level][-1])
    for i in range(min_level + 1, max_level):  # bottom-up 2
        add(i, list(node_ids[i]) + [node_ids[i - 1][-1]])
    add(max_level, [node_ids[max_level][0], node_ids[max_level - 1][-1]])
    node_ids[min_level].append(node_ids[min_level][-1])
    for i in range(min_level + 1, max_level + 1):  # bottom-up 3
        add(i, [node_ids[i][0],
                node_ids[i - 1][-1] if i != min_level + 1 else node_ids[i - 1][0]])
    node_ids[min_level].append(node_ids[min_level][-1])
    for i in range(max_level - 1, min_level, -1):  # top-down 4
        add(i, [node_ids[i][0], node_ids[i][-1], node_ids[i + 1][-1]])
    add(min_level, [node_ids[min_level][0], node_ids[min_level + 1][-1]])
    node_ids[max_level].append(node_ids[max_level][-1])
    for i in range(max_level, min_level - 1, -1):  # quad-add
        add(i, [node_ids[i][2], node_ids[i][4]])
    return tuple(nodes)


def get_topology(fpn_name: Optional[str], min_level: int, max_level: int
                 ) -> Tuple[FpnNode, ...]:
    if not fpn_name or fpn_name in ("bifpn", "bifpn_dyn"):
        return bifpn_topology(min_level, max_level)
    if fpn_name == "qufpn":
        return qufpn_topology(min_level, max_level)
    raise ValueError(f"unknown fpn name {fpn_name}")


def _max_pool_to(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """SAME max-pool down to (th, tw) (ResampleFeatureMap._pool2d, 264-280)."""
    h, w = x.shape[1], x.shape[2]
    sh = (h - 1) // th + 1
    sw = (w - 1) // tw + 1
    return nn.max_pool(x, (sh + 1, sw + 1), strides=(sh, sw), padding="SAME")


def _nearest_upsample_to(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Nearest-neighbor resize up (ResampleFeatureMap._upsample2d, 282-291)."""
    b, h, w, c = x.shape
    if th % h == 0 and tw % w == 0:
        # exact integer upsample: broadcast-reshape, cheapest on TPU
        ry, rx = th // h, tw // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, ry, w, rx, c))
        return x.reshape(b, th, tw, c)
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class ResampleFeatureMap(nn.Module):
    """Match a feature map to a target (h, w, c)
    (efficientdet_keras.py:224-324)."""
    target_num_channels: int
    target_hw: Tuple[int, int]
    apply_bn: bool = True
    conv_after_downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, training: bool):
        th, tw = self.target_hw
        h, w, c = x.shape[1], x.shape[2], x.shape[3]

        def maybe_1x1(feat):
            if c != self.target_num_channels:
                feat = nn.Conv(self.target_num_channels, (1, 1),
                               kernel_init=_conv_init, dtype=self.dtype,
                               name="conv2d")(feat)
                if self.apply_bn:
                    feat = BatchNorm(axis_name=self.bn_axis_name,
                                     dtype=self.dtype,
                                     name="bn")(feat, training)
            return feat

        if h > th and w > tw:
            if not self.conv_after_downsample:
                x = maybe_1x1(x)
            x = _max_pool_to(x, th, tw)
            if self.conv_after_downsample:
                x = maybe_1x1(x)
        elif h <= th and w <= tw:
            x = maybe_1x1(x)
            if h < th or w < tw:
                x = _nearest_upsample_to(x, th, tw)
        else:
            raise ValueError(f"Incompatible resample {h}x{w} -> {th}x{tw}")
        return x


class FNode(nn.Module):
    """One BiFPN fusion node (efficientdet_keras.py:42-172)."""
    feat_level: int          # relative level (0-based from min_level)
    inputs_offsets: Tuple[int, ...]
    fpn_num_filters: int
    feat_hw: Tuple[int, int]  # static target (h, w) of this node
    weight_method: str = "fastattn"
    act_type: str = "swish"
    separable_conv: bool = True
    apply_bn_for_resampling: bool = True
    conv_after_downsample: bool = False
    conv_bn_act_pattern: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], training: bool):
        nodes = []
        for i, offset in enumerate(self.inputs_offsets):
            nodes.append(ResampleFeatureMap(
                self.fpn_num_filters, self.feat_hw,
                apply_bn=self.apply_bn_for_resampling,
                conv_after_downsample=self.conv_after_downsample,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"resample_{i}_{offset}")(feats[offset], training))

        dtype = nodes[0].dtype
        wm = self.weight_method
        n = len(nodes)
        if wm == "attn":
            w = self.param("WSM", nn.initializers.ones, (n,))
            norm = jax.nn.softmax(w.astype(dtype))
            new_node = sum(nodes[i] * norm[i] for i in range(n))
        elif wm == "fastattn":
            w = jax.nn.relu(self.param("WSM", nn.initializers.ones, (n,)).astype(dtype))
            new_node = sum(nodes[i] * w[i] for i in range(n)) / (jnp.sum(w) + 1e-4)
        elif wm == "channel_attn":
            w = self.param("WSM", nn.initializers.ones, (n, self.fpn_num_filters))
            norm = jax.nn.softmax(w.astype(dtype), axis=0)
            new_node = sum(nodes[i] * norm[i] for i in range(n))
        elif wm == "channel_fastattn":
            w = jax.nn.relu(self.param("WSM", nn.initializers.ones,
                                       (n, self.fpn_num_filters)).astype(dtype))
            new_node = sum(nodes[i] * w[i] for i in range(n)) / (
                jnp.sum(w, axis=0) + 1e-4)
        elif wm == "sum":
            new_node = sum(nodes)
        else:
            raise ValueError(f"unknown weight_method {wm}")

        # op_after_combine (efficientdet_keras.py:175-221)
        if not self.conv_bn_act_pattern:
            new_node = activation(new_node, self.act_type)
        if self.separable_conv:
            new_node = nn.Conv(
                self.fpn_num_filters, (3, 3),
                feature_group_count=self.fpn_num_filters, use_bias=False,
                kernel_init=_conv_init, dtype=self.dtype,
                name="conv_dw")(new_node)
            new_node = nn.Conv(
                self.fpn_num_filters, (1, 1),
                use_bias=not self.conv_bn_act_pattern,
                kernel_init=_conv_init, dtype=self.dtype,
                name="conv_pw")(new_node)
        else:
            new_node = nn.Conv(
                self.fpn_num_filters, (3, 3),
                use_bias=not self.conv_bn_act_pattern,
                kernel_init=_conv_init, dtype=self.dtype,
                name="conv")(new_node)
        new_node = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                             name="bn")(new_node, training)
        if self.conv_bn_act_pattern:
            new_node = activation(new_node, self.act_type)
        return new_node


class FPNCell(nn.Module):
    """One repeat of the BiFPN DAG (efficientdet_keras.py:736-777)."""
    nodes: Tuple[FpnNode, ...]
    min_level: int
    fpn_num_filters: int
    level_hw: Tuple[Tuple[int, int], ...]  # (h, w) per absolute level index 0..max
    weight_method: str
    act_type: str
    separable_conv: bool = True
    apply_bn_for_resampling: bool = True
    conv_after_downsample: bool = False
    conv_bn_act_pattern: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, feats, training: bool):
        feats = list(feats)
        for i, node in enumerate(self.nodes):
            new_node = FNode(
                node.feat_level - self.min_level, node.inputs_offsets,
                self.fpn_num_filters, self.level_hw[node.feat_level],
                weight_method=self.weight_method, act_type=self.act_type,
                separable_conv=self.separable_conv,
                apply_bn_for_resampling=self.apply_bn_for_resampling,
                conv_after_downsample=self.conv_after_downsample,
                conv_bn_act_pattern=self.conv_bn_act_pattern,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"fnode{i}")(feats, training)
            feats.append(new_node)
        return feats


class FPNCells(nn.Module):
    """Stack of FPN cells with output re-selection
    (efficientdet_keras.py:700-733)."""
    nodes: Tuple[FpnNode, ...]
    min_level: int
    max_level: int
    fpn_cell_repeats: int
    fpn_num_filters: int
    level_hw: Tuple[Tuple[int, int], ...]
    weight_method: str
    act_type: str
    separable_conv: bool = True
    apply_bn_for_resampling: bool = True
    conv_after_downsample: bool = False
    conv_bn_act_pattern: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[object] = None
    grad_checkpoint: bool = False

    @nn.compact
    def __call__(self, feats, training: bool):
        cell_cls = FPNCell
        if self.grad_checkpoint:
            cell_cls = nn.remat(FPNCell, static_argnums=(2,))
        for rep in range(self.fpn_cell_repeats):
            cell_feats = cell_cls(
                self.nodes, self.min_level, self.fpn_num_filters,
                self.level_hw, self.weight_method, self.act_type,
                self.separable_conv, self.apply_bn_for_resampling,
                self.conv_after_downsample, self.conv_bn_act_pattern,
                self.bn_axis_name, self.dtype,
                name=f"cell_{rep}")(feats, training)
            # re-select one output per level: the last node at that level
            feats = []
            for level in range(self.min_level, self.max_level + 1):
                for i, fnode in enumerate(reversed(self.nodes)):
                    if fnode.feat_level == level:
                        feats.append(cell_feats[-1 - i])
                        break
        return feats
