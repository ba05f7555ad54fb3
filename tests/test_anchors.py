"""Anchor generation / decode tests (reference anchors semantics)."""
import jax.numpy as jnp
import numpy as np

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.ops import anchors
from mladversarialobjectdetection_tpu.utils.image import get_feat_sizes


def test_anchor_count_lite4():
    cfg = mad.get_efficientdet_config("efficientdet-lite4")
    a = anchors.Anchors.from_config(cfg)
    # levels 3..7 at 640: 80^2+40^2+20^2+10^2+5^2 = 8525 cells x 9 anchors
    assert a.boxes.shape == (76725, 4)


def test_feat_sizes_chain():
    fs = get_feat_sizes(640, 7)
    assert [f["height"] for f in fs] == [640, 320, 160, 80, 40, 20, 10, 5]
    fs = get_feat_sizes((641, 321), 3)
    assert fs[1] == {"height": 321, "width": 161}


def test_anchor_centers_on_stride_grid():
    a = anchors.Anchors(3, 3, 1, [1.0], 4.0, 64)
    boxes = a.boxes  # one 8x8 level, 1 anchor each
    assert boxes.shape == (64, 4)
    cy = (boxes[:, 0] + boxes[:, 2]) / 2
    cx = (boxes[:, 1] + boxes[:, 3]) / 2
    assert np.allclose(sorted(set(np.round(cy, 3))), np.arange(4, 64, 8))
    assert np.allclose(sorted(set(np.round(cx, 3))), np.arange(4, 64, 8))
    # base anchor size = anchor_scale * stride = 32
    assert np.allclose(boxes[0], [4 - 16, 4 - 16, 4 + 16, 4 + 16])


def test_decode_identity():
    anchor = jnp.array([[10.0, 20.0, 50.0, 60.0]])
    decoded = anchors.decode_box_outputs(jnp.zeros((1, 4)), anchor)
    assert np.allclose(decoded, anchor, atol=1e-5)


def test_decode_shift_and_scale():
    anchor = jnp.array([[0.0, 0.0, 10.0, 10.0]])  # h=w=10, center (5,5)
    pred = jnp.array([[0.1, -0.2, np.log(2.0), np.log(0.5)]])
    out = np.asarray(anchors.decode_box_outputs(pred, anchor))[0]
    # new center = (5 + 1, 5 - 2), new h = 20, new w = 5
    assert np.allclose(out, [6 - 10, 3 - 2.5, 6 + 10, 3 + 2.5], atol=1e-5)
