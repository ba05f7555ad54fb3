"""Model export: serialized AOT artifacts + optional TF/TFLite paths.

The TPU-native counterpart of the reference serving/export stack
(tf2/infer_lib.py:455-564: SavedModel, frozen graph, TFLite FP32/FP16/INT8,
TensorRT):

  - `export_stablehlo`: jax.export serialization of the jitted
    forward+postprocess — the portable AOT artifact (StableHLO), the
    native-deployment equivalent of a frozen graph.
  - `export_saved_model`: jax2tf -> tf.saved_model (gated on TF + jax2tf
    availability).
  - `export_tflite`: SavedModel -> TFLite converter, FP32/FP16 and INT8
    with a representative dataset (infer_lib.py:497-540 parity).
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import numpy as np

from ..utils.log import get_logger

logger = get_logger(__name__)


def export_stablehlo(fn: Callable, example_args, out_path: str) -> None:
    """Serialize a jittable fn to a portable StableHLO artifact."""
    import jax
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    logger.info(f"wrote StableHLO artifact ({len(blob)} bytes) to {out_path}")


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns a callable."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_saved_model(fn: Callable, example_args, out_dir: str,
                       input_names: Optional[Iterable[str]] = None) -> None:
    """jax2tf conversion to a TF SavedModel (KerasDriver.export parity).

    `input_names` (optional) names the signature inputs — needed when a
    TFLite int8 calibration dataset must address inputs by name."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    names = list(input_names) if input_names else [None] * len(example_args)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec(np.shape(a), tf.as_dtype(np.asarray(a).dtype),
                          name=n)
            for a, n in zip(example_args, names)
        ])
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, out_dir,
                        signatures={"serving_default": tf_fn})
    logger.info(f"wrote SavedModel to {out_dir}")


def export_tflite(saved_model_dir: str, out_path: str, *,
                  quantize: Optional[str] = None,
                  representative_dataset: Optional[Iterable] = None) -> None:
    """SavedModel -> TFLite; quantize in {None, 'fp16', 'int8'}
    (infer_lib.py:497-540 parity)."""
    import tensorflow as tf

    converter = tf.lite.TFLiteConverter.from_saved_model(saved_model_dir)
    if quantize == "fp16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize == "int8":
        if representative_dataset is None:
            raise ValueError("int8 quantization needs a representative dataset")
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        # The calibrator feeds list-valued samples POSITIONALLY in the
        # flatbuffer's input-tensor order, which need not match the
        # signature order (and dict-valued samples segfault TF's
        # calibrator on jax2tf graphs). Resolve the true order from a
        # cheap fp32 pre-conversion and reorder dict samples to lists.
        base = tf.lite.TFLiteConverter.from_saved_model(
            saved_model_dir).convert()
        interp = tf.lite.Interpreter(model_content=base)
        order = [d["name"] for d in interp.get_input_details()]

        def ordered_rep():
            for sample in representative_dataset():
                if isinstance(sample, dict):
                    out = []
                    for name in order:
                        # longest substring match: with keys like
                        # ('image', 'image_scale') the tensor
                        # 'serving_default_image_scale:0' must bind to
                        # 'image_scale', not whichever key iterates first
                        hits = sorted((k for k in sample if k in name),
                                      key=len, reverse=True)
                        key = hits[0] if hits else None
                        if key is None:
                            raise KeyError(
                                f"representative sample missing input "
                                f"{name!r} (has {sorted(sample)})")
                        out.append(np.asarray(sample[key]))
                    yield out
                else:
                    yield sample

        converter.representative_dataset = ordered_rep
        # the serve program ends in NMS-style ops post-training quant can't
        # int8-ize; allow float builtins as fallback, exactly like the
        # reference export (infer_lib.py:534-539). IO stays float — our
        # TfliteDriver feeds preprocessed f32 (images, scales), unlike the
        # reference's uint8 image-only signature.
        converter.experimental_new_quantizer = True
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
            tf.lite.OpsSet.TFLITE_BUILTINS,
        ]
    blob = converter.convert()
    with open(out_path, "wb") as f:
        f.write(blob)
    logger.info(f"wrote TFLite model ({len(blob)} bytes) to {out_path}")
