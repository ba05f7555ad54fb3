"""Config system tests (reference hparams_config_test.py:27-85 patterns)."""
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.config import Config


def test_model_tables():
    lite4 = mad.get_efficientdet_config("efficientdet-lite4")
    assert lite4.image_size == 640
    assert lite4.fpn_num_filters == 224
    assert lite4.fpn_cell_repeats == 7
    assert lite4.box_class_repeats == 4
    assert lite4.act_type == "relu6"
    assert lite4.mean_rgb == 127.0 and lite4.stddev_rgb == 128.0
    assert lite4.fpn_weight_method == "sum"
    assert lite4.anchor_scale == 4.0

    lite0 = mad.get_efficientdet_config("efficientdet-lite0")
    assert lite0.anchor_scale == 3.0 and lite0.image_size == 320

    d7x = mad.get_efficientdet_config("efficientdet-d7x")
    assert d7x.max_level == 8 and d7x.fpn_weight_method == "sum"

    d1 = mad.get_efficientdet_config("efficientdet-d1")
    assert d1.act_type == "swish" and d1.anchor_scale == 4.0

    with pytest.raises(ValueError):
        mad.get_efficientdet_config("resnet50")


def test_override_semantics():
    c = Config({"a": 1, "b": {"c": 2}})
    c.override({"b": {"c": 3}})
    assert c.b.c == 3
    with pytest.raises(KeyError):
        c.override({"new_key": 1})
    c.update({"new_key": 1})
    assert c.new_key == 1


def test_parse_from_str():
    c = Config({"a": 1, "b": {"c": 2.0}, "d": "x"})
    c.parse_from_str("a=5,b.c=3.5,d=hello")
    assert c.a == 5 and c.b.c == 3.5 and c.d == "hello"


def test_nms_defaults():
    cfg = mad.get_efficientdet_config("efficientdet-lite4")
    assert cfg.nms_configs.method == "gaussian"
    assert cfg.nms_configs.max_output_size == 100
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5})
    assert cfg.nms_configs.score_thresh == 0.5


def test_as_dict_roundtrip():
    cfg = mad.get_efficientdet_config("efficientdet-d0")
    d = cfg.as_dict()
    assert d["nms_configs"]["method"] == "gaussian"
    c2 = Config(d)
    assert c2 == cfg
