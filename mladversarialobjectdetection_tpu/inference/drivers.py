"""Re-inference drivers for exported artifacts.

Behavioral parity with the reference's artifact-serving drivers
(tf2/infer_lib.py: SavedModelDriver 270-319, TfliteDriver 322-380): after
`Detector.export(...)`, these classes load the artifact back and `serve`
raw uint8 frames with the same Detections contract as `Detector.serve` —
no JAX model rebuild, no checkpoint.

Artifact formats:
  * StableHLO (`Detector.export(fmt='stablehlo')`) — the TPU-native AOT
    artifact; `StableHloDriver` re-executes it with jax runtime.
  * TF SavedModel (`fmt='saved_model'`, via jax2tf) — `SavedModelDriver`
    re-serves it with TF runtime.
  * TFLite flatbuffer (`fmt='tflite'`) — `TfliteDriver` re-serves through
    the TFLite interpreter's signature runner.

Host-side preprocessing (aspect-preserving antialiased resize + pad,
dataloader.py:118-142 parity) is shared with Detector via
ops/preprocess.preprocess_host.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .. import config as config_lib
from ..ops.postprocess import Detections
from ..ops.preprocess import preprocess_host
from ..utils.log import get_logger

logger = get_logger(__name__)

# flat output order of the exported serve fn (Detections field order)
_FIELDS = ("boxes", "scores", "classes", "valid", "valid_len")


class _ArtifactDriver:
    """Shared preprocess + output repacking for artifact drivers."""

    def __init__(self, model_name: str = "efficientdet-lite4", params=None):
        self.config = config_lib.get_efficientdet_config(model_name)
        if params:
            self.config.override(params, allow_new_keys=False)

    def _predict(self, images: np.ndarray, scales: np.ndarray):
        raise NotImplementedError

    def predict(self, images: np.ndarray, scales: np.ndarray) -> Detections:
        """Already-preprocessed images + scales -> Detections in the
        artifact's output contract (normalized tflite boxes when
        `normalized_boxes`; original-coord boxes otherwise)."""
        out = self._predict(np.asarray(images, np.float32),
                            np.asarray(scales, np.float32))
        return Detections(*[np.asarray(o) for o in out])

    # True for artifacts emitting the TFLite contract (normalized [0,1]
    # boxes, 0-based classes); TfliteDriver overrides per layout
    normalized_boxes = False

    def serve(self, raw_frames: Sequence[np.ndarray]) -> Detections:
        """Batch of raw RGB frames -> padded Detections in original coords
        (ServingDriver.serve contract, infer_lib.py:240-252). Artifacts
        emitting the normalized TFLite contract are rescaled to original
        coords + 1-based classes here, exactly like the reference
        TfliteDriver.serve (infer_lib.py:343-350)."""
        from ..ops.postprocess import CLASS_OFFSET
        from ..utils.image import parse_image_size

        imgs, scales = zip(*[
            preprocess_host(np.asarray(f), self.config.image_size,
                            self.config.mean_rgb, self.config.stddev_rgb)
            for f in raw_frames])
        scales = np.asarray(scales, np.float32)
        det = self.predict(np.stack(imgs), scales)
        if self.normalized_boxes:
            h, w = parse_image_size(self.config.image_size)
            factor = (np.asarray([h, w, h, w], np.float32)
                      * scales[:, None, None])
            det = det._replace(boxes=det.boxes * factor,
                               classes=det.classes + CLASS_OFFSET)
        return det


class StableHloDriver(_ArtifactDriver):
    """Serve from a serialized StableHLO artifact (jax.export)."""

    def __init__(self, artifact_path: str,
                 model_name: str = "efficientdet-lite4", params=None):
        super().__init__(model_name, params)
        from . import export as export_lib
        self._fn = export_lib.load_stablehlo(artifact_path)

    def _predict(self, images, scales):
        return self._fn(images, scales)


class SavedModelDriver(_ArtifactDriver):
    """Serve from a jax2tf SavedModel (reference SavedModelDriver,
    infer_lib.py:270-319)."""

    def __init__(self, saved_model_dir: str,
                 model_name: str = "efficientdet-lite4", params=None):
        super().__init__(model_name, params)
        import tensorflow as tf
        self._module = tf.saved_model.load(saved_model_dir)

    def _predict(self, images, scales):
        return self._module.serve(images, scales)


class TfliteDriver(_ArtifactDriver):
    """Serve from a TFLite flatbuffer (reference TfliteDriver,
    infer_lib.py:322-380) via the interpreter's signature runner."""

    def __init__(self, tflite_path: str,
                 model_name: str = "efficientdet-lite4", params=None):
        super().__init__(model_name, params)
        import tensorflow as tf
        self._interp = tf.lite.Interpreter(model_path=tflite_path)
        self._runner = self._interp.get_signature_runner("serving_default")
        names = list(self._runner.get_input_details())
        # jax2tf names positional args args_0/args_1; map by rank
        self._img_key = next(
            n for n in names
            if len(self._runner.get_input_details()[n]["shape"]) == 4)
        self._scale_key = next((n for n in names if n != self._img_key),
                               None)
        self._n_out = len(self._runner.get_output_details())
        # int8 3-output artifacts finish with host NMS in the TFLite
        # output contract (normalized boxes, 0-based classes)
        self.normalized_boxes = self._n_out == 3

    def _predict(self, images, scales):
        feeds = {self._img_key: images.astype(np.float32)}
        if self._scale_key is not None:
            feeds[self._scale_key] = scales.astype(np.float32)
        out = self._runner(**feeds)
        # signature outputs keyed output_0..output_N in flat order
        outs = [out[f"output_{i}"] for i in range(self._n_out)]
        if self._n_out == 3:
            # int8 artifact layout: (box encodings, scores, anchors) — the
            # TFLite-NMS op's inputs (the NMS itself is outside the
            # quantized graph, matching the reference INT8 export); finish
            # with the op's semantics. predict() keeps the NORMALIZED
            # tflite contract; serve() rescales to original coords
            # (infer_lib.py:343-350 parity).
            from ..ops.postprocess import tflite_detections_from_pre
            det = tflite_detections_from_pre(self.config.as_dict(), *outs)
            return list(det)
        return outs
