"""ClassNet / BoxNet prediction heads in Flax.

Behavioral parity with reference tf2/efficientdet_keras.py:327-633:
`repeats` separable convs whose weights are SHARED across pyramid levels
with PER-LEVEL BatchNorm (class-%d-bn-%d naming, 399-408/558-569), class
head bias initialized to -log((1-0.01)/0.01) (469), box head predicting
4*num_anchors regression targets.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .efficientnet import BatchNorm, activation

_pw_init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
_dense_head_init = nn.initializers.normal(stddev=0.01)


class _SharedConv(nn.Module):
    """Separable or plain 3x3 conv shared across levels."""
    features: int
    separable: bool
    use_bias: bool = True
    bias_init_value: float = 0.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        bias_init = nn.initializers.constant(self.bias_init_value)
        if self.separable:
            x = nn.Conv(x.shape[-1], (3, 3),
                        feature_group_count=x.shape[-1], use_bias=False,
                        kernel_init=_pw_init, dtype=self.dtype, name="dw")(x)
            x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                        kernel_init=_pw_init, bias_init=bias_init,
                        dtype=self.dtype, name="pw")(x)
        else:
            x = nn.Conv(self.features, (3, 3), use_bias=self.use_bias,
                        kernel_init=_dense_head_init, bias_init=bias_init,
                        dtype=self.dtype, name="conv")(x)
        return x


class PredictionNet(nn.Module):
    """Shared-conv / per-level-BN head body + final prediction layer.

    Generalizes ClassNet (efficientdet_keras.py:327-474) and BoxNet
    (477-633): they differ only in output width and bias init.
    """
    output_features: int
    num_filters: int
    num_levels: int
    repeats: int = 4
    act_type: str = "swish"
    separable_conv: bool = True
    head_bias_init: float = 0.0
    survival_prob: Optional[float] = None
    bn_axis_name: Optional[str] = None
    grad_checkpoint: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, inputs, training: bool):
        # conv weights shared across levels: instantiate once
        conv_cls = (nn.remat(_SharedConv) if self.grad_checkpoint
                    else _SharedConv)
        convs = [conv_cls(self.num_filters, self.separable_conv,
                          dtype=self.dtype,
                          name=f"conv_{i}") for i in range(self.repeats)]
        predict = _SharedConv(self.output_features, self.separable_conv,
                              bias_init_value=self.head_bias_init,
                              dtype=self.dtype, name="predict")
        outputs = []
        for level_id in range(self.num_levels):
            x = inputs[level_id]
            for i in range(self.repeats):
                original = x
                x = convs[i](x)
                x = BatchNorm(axis_name=self.bn_axis_name, dtype=self.dtype,
                              name=f"bn_{i}_l{level_id}")(x, training)
                x = activation(x, self.act_type)
                if i > 0 and self.survival_prob:
                    # survival_prob/drop-connect omitted in eval; residual add
                    x = x + original
            outputs.append(predict(x))
        return outputs


def class_net(num_classes: int, num_anchors: int, num_filters: int,
              num_levels: int, repeats: int, act_type: str,
              separable_conv: bool, survival_prob=None, bn_axis_name=None,
              grad_checkpoint=False, dtype=None) -> PredictionNet:
    return PredictionNet(
        output_features=num_classes * num_anchors,
        num_filters=num_filters, num_levels=num_levels, repeats=repeats,
        act_type=act_type, separable_conv=separable_conv,
        head_bias_init=-math.log((1 - 0.01) / 0.01),
        survival_prob=survival_prob, bn_axis_name=bn_axis_name,
        grad_checkpoint=grad_checkpoint, dtype=dtype, name="class_net")


class SegmentationHead(nn.Module):
    """Semantic-segmentation head over the FPN pyramid.

    Parity with reference tf2/efficientdet_keras.py:635-697
    (`SegmentationHead`): start from the coarsest pyramid level, repeatedly
    transpose-conv upsample (no bias — BN follows) and concat the next finer
    level, then a final stride-2 transpose conv predicts per-pixel classes
    at half the min_level stride (512 input @ min_level 3 -> 128×128 logits,
    the reference demo's mask resolution, tf2/segmentation.py:39).
    """
    num_classes: int
    num_filters: int
    act_type: str = "swish"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, training: bool):
        x = feats[-1]
        skips = list(reversed(feats[:-1]))
        for i, skip in enumerate(skips):
            x = nn.ConvTranspose(self.num_filters, (3, 3), strides=(2, 2),
                                 use_bias=False, name=f"up_{i}")(x)
            # the (s-1)//2+1 pyramid is not an exact power-of-two chain at
            # small sizes; crop the upsample to the skip's static shape
            x = x[:, :skip.shape[1], :skip.shape[2], :]
            x = BatchNorm(axis_name=self.bn_axis_name,
                          name=f"bn_{i}")(x, training)
            x = activation(x, self.act_type)
            x = jnp.concatenate([x, skip], axis=-1)
        return nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                name="predict")(x)


def box_net(num_anchors: int, num_filters: int, num_levels: int,
            repeats: int, act_type: str, separable_conv: bool,
            survival_prob=None, bn_axis_name=None,
            grad_checkpoint=False, dtype=None) -> PredictionNet:
    return PredictionNet(
        output_features=4 * num_anchors,
        num_filters=num_filters, num_levels=num_levels, repeats=repeats,
        act_type=act_type, separable_conv=separable_conv,
        survival_prob=survival_prob, bn_axis_name=bn_axis_name,
        grad_checkpoint=grad_checkpoint, dtype=dtype, name="box_net")
