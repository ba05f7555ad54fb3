"""Segmentation head + mixed-precision model tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.models import efficientdet


def _tiny(heads=("object_detection",), mixed=False):
    cfg = mad.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    cfg.fpn_num_filters = 16
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.heads = list(heads)
    cfg.mixed_precision = mixed
    return cfg


@pytest.mark.slow
def test_segmentation_head():
    cfg = _tiny(heads=("object_detection", "segmentation"))
    cfg.update({"seg_num_classes": 5})
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x, training=False)
    cls_out, box_out, seg = net.apply(variables, x, False)
    # seg predicted at half the min_level stride (final stride-2 transpose,
    # reference efficientdet_keras.py:682-697: 64x64 -> 128x128 for 512 in)
    assert seg.shape == (1, 16, 16, 5)
    assert len(cls_out) == 5


@pytest.mark.slow
def test_segmentation_only():
    cfg = _tiny(heads=("segmentation",))
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x, training=False)
    (seg,) = net.apply(variables, x, False)
    assert seg.shape == (1, 16, 16, 3)


@pytest.mark.slow
def test_mixed_precision_outputs_fp32_and_close():
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    outs = {}
    for mixed in (False, True):
        cfg = _tiny(mixed=mixed)
        spec = efficientdet.spec_from_config(cfg)
        net = efficientdet.EfficientDetNet(spec)
        variables = jax.jit(net.init, static_argnames=("training",))(
            {"params": jax.random.PRNGKey(0)}, x, training=False)
        cls_out, box_out = jax.jit(
            lambda v, xx: net.apply(v, xx, False))(variables, x)
        assert cls_out[0].dtype == jnp.float32
        outs[mixed] = cls_out
    # bf16 activations stay close to the fp32 reference on logits
    diff = max(float(jnp.abs(a - b).max())
               for a, b in zip(outs[False], outs[True]))
    assert diff < 0.15
