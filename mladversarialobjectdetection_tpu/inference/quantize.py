"""Opt-in int8 post-training-quantized serving path (on-device).

The reference quantizes only for *edge* export (TFLite INT8 with a
representative dataset, automl/efficientdet/tf2/infer_lib.py:497-540);
its server-side path stays float. Here int8 is also a first-class
*serving* mode on the accelerator itself — the one lever past the bf16
bandwidth roofline (tools/roofline.py; BENCH_NOTES): int8 halves weight
bytes and doubles MXU throughput on supported generations.

Design (stage 1, W8A8 with float glue):

- every eligible ``nn.Conv`` in the serve program is intercepted via
  ``flax.linen.intercept_methods`` — zero model-code changes;
- weights are pre-quantized **per output channel** (symmetric int8);
- activations are quantized **per tensor** with scales calibrated on
  representative frames (abs-max over a calibration set, the same
  contract as the reference's representative_dataset);
- the conv itself runs int8 x int8 -> int32 on the MXU, then dequantizes
  to the network's compute dtype; BatchNorm / activations / residuals /
  postprocess stay float (mirroring the reference INT8 TFLite artifact,
  whose NMS stays a float builtin, infer_lib.py:534-539);
- head ``predict`` layers are skipped by default (standard PTQ practice:
  final logits keep full precision), as is any conv with non-default
  dilation.

Accuracy is validated in tests/test_quantize.py: bounded score delta and
identical top-detection vs the float path on a trained tiny model.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.log import get_logger

logger = get_logger(__name__)

DEFAULT_SKIP = ("predict",)


def _path_str(mod) -> str:
    return "/".join(mod.path)


def _canon2(v) -> Tuple[int, int]:
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(e) for e in v)
    return t if len(t) == 2 else (t[0], t[0])


def _conv_eligible(mod, skip_patterns: Sequence[str]) -> bool:
    """Only plain strided/grouped 'SAME'/'VALID' nn.Conv, no dilation."""
    if type(mod) is not nn.Conv:
        return False
    path = _path_str(mod)
    if any(p in path for p in skip_patterns):
        return False
    if not isinstance(mod.padding, str):
        return False
    if _canon2(mod.kernel_dilation) != (1, 1):
        return False
    if getattr(mod, "input_dilation", None) not in (None, 1, (1, 1)):
        return False
    return True


def collect_act_scales(apply_fn, batches: Iterable[np.ndarray],
                       skip_patterns: Sequence[str] = DEFAULT_SKIP
                       ) -> Dict[str, float]:
    """Run `apply_fn(images)` over calibration batches, recording the
    abs-max input activation of every eligible conv (keyed by module
    path). Shared-weight modules called at several pyramid levels
    max-combine across calls. Returns {path: abs-max} (host floats)."""
    scales: Dict[str, float] = {}

    def run_one(images):
        store: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (context.method_name == "__call__"
                    and _conv_eligible(mod, skip_patterns)):
                p = _path_str(mod)
                amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                store[p] = jnp.maximum(store[p], amax) if p in store else amax
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            apply_fn(images)
        return store

    run = jax.jit(run_one)
    for batch in batches:
        for p, v in run(jnp.asarray(batch)).items():
            v = float(v)
            scales[p] = max(scales.get(p, 0.0), v)
    if not scales:
        raise ValueError("calibration saw no eligible convs")
    return scales


def quantize_conv_params(variables, paths: Iterable[str]
                         ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-output-channel symmetric int8 quantization of conv kernels.

    Returns {path: (int8 kernel [kh,kw,ci,co], f32 scale [co])} where
    kernel ~= int8 * scale."""
    params = variables["params"]
    out = {}
    for path in paths:
        node = params
        for part in path.split("/"):
            node = node[part]
        k = np.asarray(node["kernel"], np.float32)
        wmax = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-8)  # [co]
        w_scale = (wmax / 127.0).astype(np.float32)
        k_q = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
        out[path] = (jnp.asarray(k_q), jnp.asarray(w_scale))
    return out


def extract_biases(variables, paths: Iterable[str]
                   ) -> Dict[str, Optional[jnp.ndarray]]:
    """Conv biases (f32) for the quantized paths; None where bias-free."""
    params = variables["params"]
    out = {}
    for path in paths:
        node = params
        for part in path.split("/"):
            node = node[part]
        b = node.get("bias")
        out[path] = None if b is None else jnp.asarray(b, jnp.float32)
    return out


def make_int8_interceptor(act_scales: Dict[str, float],
                          qkernels: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
                          biases: Dict[str, Optional[jnp.ndarray]],
                          skip_patterns: Sequence[str] = DEFAULT_SKIP):
    """Interceptor replacing eligible convs with the int8 compute path.

    `qkernels`/`biases` may hold tracers: Int8Serve builds the interceptor
    inside the traced serve program so the quantized weights are runtime
    arguments, not embedded constants."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name != "__call__"
                or not _conv_eligible(mod, skip_patterns)):
            return next_fun(*args, **kwargs)
        path = _path_str(mod)
        if path not in qkernels or path not in act_scales:
            return next_fun(*args, **kwargs)
        x = args[0]
        out_dtype = mod.dtype or x.dtype
        k_q, w_scale = qkernels[path]
        a_s = jnp.float32(max(act_scales[path], 1e-8) / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                      -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, k_q, window_strides=_canon2(mod.strides),
            padding=mod.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=int(mod.feature_group_count),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (a_s * w_scale)
        b = biases[path]
        if b is not None:
            y = y + b
        return y.astype(out_dtype)

    return interceptor


class Int8Serve:
    """Quantized drop-in for the Detector's forward.

    Build once from calibration batches, then call as
    `int8(int8.state, images)`: the float variables, int8 kernels and
    biases all ride the `state` pytree as runtime arguments of the jitted
    serve program (not embedded constants). Used by
    `Detector.quantize_int8` (which stores `state` as _forward_state)."""

    def __init__(self, net, variables, calibration_batches,
                 skip_patterns: Sequence[str] = DEFAULT_SKIP):
        self.net = net
        self.skip_patterns = tuple(skip_patterns)
        float_apply = lambda images: net.apply(variables, images, False)
        self.act_scales = collect_act_scales(
            float_apply, calibration_batches, self.skip_patterns)
        qkernels = quantize_conv_params(variables, self.act_scales)
        biases = extract_biases(variables, qkernels)
        self.state = {"variables": variables, "qkernels": qkernels,
                      "biases": biases}
        n_params = sum(int(np.prod(k.shape))
                       for k, _ in qkernels.values())
        logger.info("int8 serve: %d convs quantized (%.1f MB int8 weights)",
                    len(qkernels), n_params / 1e6)

    def __call__(self, state, images: jnp.ndarray):
        interceptor = make_int8_interceptor(
            self.act_scales, state["qkernels"], state["biases"],
            self.skip_patterns)
        with nn.intercept_methods(interceptor):
            return self.net.apply(state["variables"], images, False)
