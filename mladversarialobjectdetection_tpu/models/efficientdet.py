"""EfficientDet detector assembly in Flax.

Behavioral parity with reference tf2/efficientdet_keras.py:780-994
(`EfficientDetNet`: backbone -> extra ResampleFeatureMap for levels
6..max_level -> FPNCells -> ClassNet/BoxNet) and the `EfficientDetModel`
pre/post-processing modes.

TPU-first: the whole network is a pure function of (params, batch-stats,
images); a static `DetSpec` resolves every architectural decision before
tracing. Mixed precision runs activations in bfloat16 with fp32 params
(automl utils.py:552-642 equivalent) — no loss scaling needed on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils.image import get_feat_sizes, parse_image_size
from . import bifpn, heads
from .efficientnet import BackboneSpec, EfficientNet, get_backbone_spec


class DetSpec(NamedTuple):
    """Static, hashable description of one EfficientDet variant."""
    backbone: BackboneSpec
    min_level: int
    max_level: int
    num_classes: int
    num_anchors: int
    fpn_num_filters: int
    fpn_cell_repeats: int
    box_class_repeats: int
    fpn_nodes: Tuple[bifpn.FpnNode, ...]
    fpn_weight_method: str
    act_type: str
    separable_conv: bool
    apply_bn_for_resampling: bool
    conv_after_downsample: bool
    conv_bn_act_pattern: bool
    level_hw: Tuple[Tuple[int, int], ...]  # (h, w) per absolute level 0..max
    image_size: Tuple[int, int]
    survival_prob: Optional[float]
    grad_checkpoint: bool
    mixed_precision: bool
    heads: Tuple[str, ...] = ("object_detection",)
    seg_num_classes: int = 3


def spec_from_config(config) -> DetSpec:
    """Resolve a Config (config.py) into a static DetSpec."""
    image_size = parse_image_size(config.image_size)
    feat_sizes = get_feat_sizes(image_size, config.max_level)
    level_hw = tuple((f["height"], f["width"]) for f in feat_sizes)
    weight_method = config.fpn_weight_method or "fastattn"
    nodes = bifpn.get_topology(config.fpn_name, config.min_level,
                               config.max_level)
    backbone = get_backbone_spec(config.backbone_name,
                                 survival_prob=config.survival_prob)
    # the detector's act_type overrides the backbone default
    # (efficientdet_keras.py:884-906 passes utils.activation_fn w/ config act)
    backbone = backbone._replace(act_type=config.act_type)
    return DetSpec(
        backbone=backbone,
        min_level=config.min_level,
        max_level=config.max_level,
        num_classes=config.num_classes,
        num_anchors=config.num_scales * len(config.aspect_ratios),
        fpn_num_filters=config.fpn_num_filters,
        fpn_cell_repeats=config.fpn_cell_repeats,
        box_class_repeats=config.box_class_repeats,
        fpn_nodes=nodes,
        fpn_weight_method=weight_method,
        act_type=config.act_type,
        separable_conv=config.separable_conv,
        apply_bn_for_resampling=config.apply_bn_for_resampling,
        conv_after_downsample=config.conv_after_downsample,
        conv_bn_act_pattern=config.conv_bn_act_pattern,
        level_hw=level_hw,
        image_size=image_size,
        survival_prob=config.survival_prob,
        grad_checkpoint=bool(config.grad_checkpoint),
        mixed_precision=bool(config.mixed_precision),
        heads=tuple(config.get("heads", ["object_detection"])),
        seg_num_classes=int(config.get("seg_num_classes", 3) or 3),
    )


class EfficientDetNet(nn.Module):
    """Backbone -> resample 6..max -> BiFPN -> heads (no pre/post).

    packed_entry > 0 computes that many leading backbone blocks (plus the
    stem) in the space-to-depth lane-packed layout — same parameter
    pytree, ~4x less HBM traffic for the C<128 entry stages
    (models/efficientnet_packed.py). Mutually exclusive with bn_axis_name
    (sync-BN); use packed_entry for serving / frozen-victim forwards.
    """
    spec: DetSpec
    bn_axis_name: Optional[str] = None
    packed_entry: int = 0

    @nn.compact
    def __call__(self, images, training: bool = False):
        spec = self.spec
        x = images
        cdtype = jnp.bfloat16 if spec.mixed_precision else None
        if spec.mixed_precision:
            x = x.astype(jnp.bfloat16)

        if self.packed_entry > 0:
            assert self.bn_axis_name is None, (
                "packed_entry does not support cross-replica BN")
            from .efficientnet_packed import PackedEntryEfficientNet
            endpoints = PackedEntryEfficientNet(
                spec.backbone, self.packed_entry, cdtype,
                name="backbone")(x, training)
        else:
            endpoints = EfficientNet(spec.backbone, self.bn_axis_name, cdtype,
                                     name="backbone")(x, training)
        # endpoints[i] == reduction_{i+1}; levels min..5 come from backbone
        feats = [endpoints[level - 1]
                 for level in range(spec.min_level, min(spec.max_level, 5) + 1)]
        # extra downsample levels 6..max_level (efficientdet_keras.py:814-828)
        for level in range(6, spec.max_level + 1):
            feats.append(bifpn.ResampleFeatureMap(
                spec.fpn_num_filters, spec.level_hw[level],
                apply_bn=spec.apply_bn_for_resampling,
                conv_after_downsample=spec.conv_after_downsample,
                bn_axis_name=self.bn_axis_name, dtype=cdtype,
                name=f"resample_p{level}")(feats[-1], training))

        fpn_feats = bifpn.FPNCells(
            spec.fpn_nodes, spec.min_level, spec.max_level,
            spec.fpn_cell_repeats, spec.fpn_num_filters, spec.level_hw,
            spec.fpn_weight_method, spec.act_type, spec.separable_conv,
            spec.apply_bn_for_resampling, spec.conv_after_downsample,
            spec.conv_bn_act_pattern, self.bn_axis_name, cdtype,
            spec.grad_checkpoint, name="fpn_cells")(feats, training)

        num_levels = spec.max_level - spec.min_level + 1
        outputs = []
        if "object_detection" in spec.heads:
            cls_out = heads.class_net(
                spec.num_classes, spec.num_anchors, spec.fpn_num_filters,
                num_levels, spec.box_class_repeats, spec.act_type,
                spec.separable_conv, spec.survival_prob, self.bn_axis_name,
                spec.grad_checkpoint, cdtype)(fpn_feats, training)
            box_out = heads.box_net(
                spec.num_anchors, spec.fpn_num_filters, num_levels,
                spec.box_class_repeats, spec.act_type, spec.separable_conv,
                spec.survival_prob, self.bn_axis_name,
                spec.grad_checkpoint, cdtype)(fpn_feats, training)
            # predictions always fp32 for stable postprocessing/losses
            outputs.append([c.astype(jnp.float32) for c in cls_out])
            outputs.append([b.astype(jnp.float32) for b in box_out])
        if "segmentation" in spec.heads:
            seg = heads.SegmentationHead(
                spec.seg_num_classes, spec.fpn_num_filters, spec.act_type,
                self.bn_axis_name, name="seg_head")(fpn_feats, training)
            outputs.append(seg.astype(jnp.float32))
        return tuple(outputs)
