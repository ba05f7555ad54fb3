"""Configuration system for the TPU-native adversarial object-detection framework.

Behavioral parity with the reference config system (hparams_config.py:35-487 in
tiiuae/MLAdversarialObjectDetection): a recursive attribute-dict `Config` with
`override` (rejects unknown keys) / `update` (allows new keys), string
(`"a.b=1,c=2"`) and YAML parsing, plus the per-model hyperparameter tables for
the EfficientDet d0-d7x and lite0-lite4 families.

The implementation is new and TPU-first: configs are plain Python used only at
trace time; everything that reaches XLA is static.
"""
from __future__ import annotations

import ast
import copy
from typing import Any


class Config:
    """Recursive attribute dict with override/update semantics.

    Mirrors the reference semantics (hparams_config.py:35-167):
      - attribute and item access
      - `override(d)` raises KeyError on keys absent from self
      - `update(d)` allows new keys
      - nested dicts become nested Configs
      - `parse_from_str("a.b=1,c=2*3")` literal-eval values
    """

    def __init__(self, initial: dict | None = None):
        object.__setattr__(self, "_data", {})
        if initial:
            for k, v in initial.items():
                self._data[k] = self._wrap(v)

    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, dict):
            return Config(v)
        if isinstance(v, Config):
            return Config(v.as_dict())
        return v

    # -- attribute/item protocol ------------------------------------------
    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = self._wrap(value)

    def __getitem__(self, name: str) -> Any:
        return self._data[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._data[name] = self._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def get(self, name: str, default: Any = None) -> Any:
        return self._data.get(name, default)

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self.as_dict(), memo))

    def __repr__(self) -> str:
        return f"Config({self.as_dict()!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.as_dict() == other.as_dict()
        if isinstance(other, dict):
            return self.as_dict() == other
        return NotImplemented

    # -- merge semantics ---------------------------------------------------
    def _apply(self, other: Any, allow_new_keys: bool) -> None:
        if isinstance(other, Config):
            other = other.as_dict()
        if isinstance(other, str):
            if other.endswith((".yaml", ".yml")):
                import yaml

                with open(other) as f:
                    other = yaml.safe_load(f)
            else:
                other = self._parse_str(other)
        if not isinstance(other, dict):
            raise ValueError(f"Cannot merge {type(other)} into Config")
        for k, v in other.items():
            if k not in self._data:
                if not allow_new_keys:
                    raise KeyError(f"Key `{k}` does not exist for overriding.")
                self._data[k] = self._wrap(v)
            elif isinstance(self._data.get(k), Config) and isinstance(v, (dict, Config)):
                self._data[k]._apply(v, allow_new_keys)
            else:
                self._data[k] = self._wrap(v)

    def override(self, other: Any, allow_new_keys: bool = False) -> "Config":
        """Merge, rejecting unknown keys unless allow_new_keys."""
        if other is None:
            return self
        self._apply(other, allow_new_keys)
        return self

    def update(self, other: Any) -> "Config":
        """Merge, allowing new keys."""
        if other is None:
            return self
        self._apply(other, allow_new_keys=True)
        return self

    @staticmethod
    def _parse_str(s: str) -> dict:
        """Parse 'a.b=1,c=hello,d=2*3' into a nested dict (reference format)."""
        out: dict = {}
        if not s:
            return out
        # split on commas not inside brackets
        parts, depth, cur = [], 0, []
        for ch in s:
            if ch in "[(":
                depth += 1
            elif ch in "])":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        for part in parts:
            if not part.strip():
                continue
            k, _, v = part.partition("=")
            k, v = k.strip(), v.strip()
            try:
                val = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                try:
                    val = eval(v, {"__builtins__": {}}, {})  # e.g. "2*3"
                except Exception:
                    val = v
            node = out
            keys = k.split(".")
            for kk in keys[:-1]:
                node = node.setdefault(kk, {})
            node[keys[-1]] = val
        return out

    def parse_from_str(self, s: str) -> "Config":
        return self.override(self._parse_str(s))

    def as_dict(self) -> dict:
        out = {}
        for k, v in self._data.items():
            out[k] = v.as_dict() if isinstance(v, Config) else copy.deepcopy(v)
        return out


def default_detection_configs() -> Config:
    """Default detection hyperparameters.

    Parity with reference hparams_config.py:170-298; only keys the TPU build
    consumes or that users may override are kept, plus TPU-specific knobs.
    """
    h = Config()
    h.name = "efficientdet-d1"
    h.act_type = "swish"

    # input preprocessing
    h.image_size = 640  # int or 'WxH' string
    h.target_size = None
    h.input_rand_hflip = True
    h.jitter_min = 0.1
    h.jitter_max = 2.0

    # dataset
    h.num_classes = 90  # 0 is reserved for background at the API level
    h.max_instances_per_image = 100
    h.label_map = None  # dict or 'coco'/'voc' (hparams_config.py:198)

    # architecture
    h.min_level = 3
    h.max_level = 7
    h.num_scales = 3
    h.aspect_ratios = [1.0, 2.0, 0.5]
    h.anchor_scale = 4.0
    h.is_training_bn = True

    # optimization (supervised detector training; the attack loop has its own)
    h.momentum = 0.9
    h.optimizer = "sgd"
    h.learning_rate = 0.08
    h.lr_warmup_init = 0.008
    h.lr_warmup_epoch = 1.0
    h.clip_gradients_norm = 10.0
    h.num_epochs = 300

    # normalization (identical to Cloud TPU ResNet defaults)
    h.mean_rgb = [0.485 * 255, 0.456 * 255, 0.406 * 255]
    h.stddev_rgb = [0.229 * 255, 0.224 * 255, 0.225 * 255]

    # losses
    h.label_smoothing = 0.0
    h.alpha = 0.25
    h.gamma = 1.5
    h.delta = 0.1
    h.box_loss_weight = 50.0
    h.iou_loss_type = None
    h.iou_loss_weight = 1.0
    h.weight_decay = 4e-5

    # precision: 'float32' | 'mixed_bfloat16'
    h.mixed_precision = False

    # detection head
    h.box_class_repeats = 3
    h.fpn_cell_repeats = 3
    h.fpn_num_filters = 88
    h.separable_conv = True
    h.apply_bn_for_resampling = True
    h.conv_after_downsample = False
    h.conv_bn_act_pattern = False

    # NMS (reference hparams_config.py:260-268)
    h.nms_configs = {
        "method": "gaussian",
        "iou_thresh": None,  # default depends on method
        "score_thresh": 0.0,
        "sigma": None,
        "max_nms_inputs": 0,
        "max_output_size": 100,
        # TPU-specific: static candidate count selected by top-k before the
        # suppression loop (replaces the reference's all-anchor dynamic input).
        "pre_nms_topk": 1024,
        # TPU-specific: approximate candidate selection via lax.approx_max_k
        # (fused PartialReduce). False = exact parity; True = recall target
        # 0.95; a float = that recall target. ~5% end-to-end on d7/d7x serve.
        "pre_nms_approx_topk": False,
    }
    h.tflite_max_detections = 100  # reference hparams_config.py:267
    # training-time augmentation policy: None | 'v0'..'v3' | 'test' |
    # 'randaug' (reference hparams_config.py:186-187, dataloader.py:311-319)
    h.autoaugment_policy = None
    h.grid_mask = False

    # FPN
    h.fpn_name = None
    h.fpn_weight_method = None
    h.fpn_config = None

    h.survival_prob = None
    h.moving_average_decay = 0.9998
    h.backbone_name = "efficientnet-b1"
    h.backbone_config = None
    h.grad_checkpoint = False
    h.heads = ["object_detection"]

    # TPU build specific
    h.data_format = "channels_last"
    h.max_boxes_per_image = 16  # static person-slot count (replaces ragged)
    return h


efficientdet_model_param_dict = {
    "efficientdet-d0": dict(
        name="efficientdet-d0", backbone_name="efficientnet-b0", image_size=512,
        fpn_num_filters=64, fpn_cell_repeats=3, box_class_repeats=3),
    "efficientdet-d1": dict(
        name="efficientdet-d1", backbone_name="efficientnet-b1", image_size=640,
        fpn_num_filters=88, fpn_cell_repeats=4, box_class_repeats=3),
    "efficientdet-d2": dict(
        name="efficientdet-d2", backbone_name="efficientnet-b2", image_size=768,
        fpn_num_filters=112, fpn_cell_repeats=5, box_class_repeats=3),
    "efficientdet-d3": dict(
        name="efficientdet-d3", backbone_name="efficientnet-b3", image_size=896,
        fpn_num_filters=160, fpn_cell_repeats=6, box_class_repeats=4),
    "efficientdet-d4": dict(
        name="efficientdet-d4", backbone_name="efficientnet-b4", image_size=1024,
        fpn_num_filters=224, fpn_cell_repeats=7, box_class_repeats=4),
    "efficientdet-d5": dict(
        name="efficientdet-d5", backbone_name="efficientnet-b5", image_size=1280,
        fpn_num_filters=288, fpn_cell_repeats=7, box_class_repeats=4),
    "efficientdet-d6": dict(
        name="efficientdet-d6", backbone_name="efficientnet-b6", image_size=1280,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        fpn_weight_method="sum"),
    "efficientdet-d7": dict(
        name="efficientdet-d7", backbone_name="efficientnet-b6", image_size=1536,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        anchor_scale=5.0, fpn_weight_method="sum"),
    "efficientdet-d7x": dict(
        name="efficientdet-d7x", backbone_name="efficientnet-b7", image_size=1536,
        fpn_num_filters=384, fpn_cell_repeats=8, box_class_repeats=5,
        anchor_scale=4.0, max_level=8, fpn_weight_method="sum"),
}

_lite_common = dict(mean_rgb=127.0, stddev_rgb=128.0, act_type="relu6",
                    fpn_weight_method="sum")

efficientdet_lite_param_dict = {
    "efficientdet-lite0": dict(
        name="efficientdet-lite0", backbone_name="efficientnet-lite0",
        image_size=320, fpn_num_filters=64, fpn_cell_repeats=3,
        box_class_repeats=3, anchor_scale=3.0, **_lite_common),
    "efficientdet-lite1": dict(
        name="efficientdet-lite1", backbone_name="efficientnet-lite1",
        image_size=384, fpn_num_filters=88, fpn_cell_repeats=4,
        box_class_repeats=3, anchor_scale=3.0, **_lite_common),
    "efficientdet-lite2": dict(
        name="efficientdet-lite2", backbone_name="efficientnet-lite2",
        image_size=448, fpn_num_filters=112, fpn_cell_repeats=5,
        box_class_repeats=3, anchor_scale=3.0, **_lite_common),
    "efficientdet-lite3": dict(
        name="efficientdet-lite3", backbone_name="efficientnet-lite3",
        image_size=512, fpn_num_filters=160, fpn_cell_repeats=6,
        box_class_repeats=4, **_lite_common),
    "efficientdet-lite3x": dict(
        name="efficientdet-lite3x", backbone_name="efficientnet-lite3",
        image_size=640, fpn_num_filters=200, fpn_cell_repeats=6,
        box_class_repeats=4, anchor_scale=3.0, **_lite_common),
    "efficientdet-lite4": dict(
        name="efficientdet-lite4", backbone_name="efficientnet-lite4",
        image_size=640, fpn_num_filters=224, fpn_cell_repeats=7,
        box_class_repeats=4, **_lite_common),
}


def get_efficientdet_config(model_name: str = "efficientdet-d1") -> Config:
    """Default config for a model name (reference hparams_config.py:470-480)."""
    h = default_detection_configs()
    if model_name in efficientdet_model_param_dict:
        h.override(efficientdet_model_param_dict[model_name])
    elif model_name in efficientdet_lite_param_dict:
        h.override(efficientdet_lite_param_dict[model_name])
    else:
        raise ValueError(f"Unknown model name: {model_name}")
    return h


def get_detection_config(model_name: str) -> Config:
    if model_name.startswith("efficientdet"):
        return get_efficientdet_config(model_name)
    raise ValueError("model name must start with efficientdet.")
