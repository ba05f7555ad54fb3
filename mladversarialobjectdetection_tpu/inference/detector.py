"""Single-frame serving detector wrapper.

Behavioral parity with reference detector.py:19-72 (`Detector`): raw frame
in -> person boxes + scores out, with all pre/post-processing handled
internally (infer_lib.KerasDriver.serve equivalent, infer_lib.py:383-421).

TPU-first: host-side preprocessing produces a fixed-shape normalized frame
and a scale; the forward + postprocess is one cached jitted program per
input signature.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_lib
from ..ckpt import io as ckpt_io
from ..models.efficientdet import EfficientDetNet, spec_from_config
from ..ops import postprocess
from ..ops.preprocess import preprocess_host
from ..utils.log import get_logger

logger = get_logger(__name__)


class Detector:
    """Inference with the EfficientDet person detector."""

    def __init__(self, *, model_name: str = "efficientdet-lite4",
                 params=None, ckpt_path: str | None = None, seed: int = 0,
                 post_mode: str = "global", mesh=None,
                 packed_entry: int = 0):
        """
        Args:
          model_name: efficientdet variant.
          params: config override dict (e.g. {'nms_configs': {...}},
            detector.py:90-92 usage).
          ckpt_path: native checkpoint (ckpt/io.py) for the detector
            variables; random init if None.
          post_mode: 'global' | 'per_class' | 'combined' | 'tflite'
            (EfficientDetModel post_mode parity, efficientdet_keras.py:944-963).
            'tflite' returns the TFLite custom-op output contract —
            normalized [0,1] boxes, 0-based classes, no scale-back.
          mesh: optional jax.sharding.Mesh (parallel.make_mesh /
            make_hybrid_mesh / make_serve_mesh). Serving then runs SPMD:
            variables replicated, the batch dim sharded over the mesh's
            data axes (padded up to a multiple of their size), results
            unpadded — multi-chip serving beyond the reference's
            one-device drivers. A `make_serve_mesh(n_data, n_spatial)`
            mesh additionally shards each image's ROWS over the
            'spatial' axis: GSPMD partitions every conv with halo
            exchange over ICI — model-parallel serving that cuts the
            large-variant (d5-d7x) latency below one chip's floor.
        """
        self.post_mode = post_mode
        self.mesh = mesh
        self.config = config_lib.get_efficientdet_config(model_name)
        if params:
            self.config.override(params, allow_new_keys=False)
        self.spec = spec_from_config(self.config)
        # packed_entry: leading backbone blocks in the space-to-depth
        # lane-packed layout (models/efficientnet_packed.py) — same
        # checkpoint variables, less HBM traffic on the C<128 stages
        self.net = EfficientDetNet(self.spec, packed_entry=packed_entry)
        dummy = np.zeros((1, *self.spec.image_size, 3), np.float32)
        self.variables = jax.jit(self.net.init, static_argnames=("training",))(
            {"params": jax.random.PRNGKey(seed)}, dummy, training=False)
        if ckpt_path:
            from ..ckpt import convert_tf
            tf_prefix = convert_tf.find_tf_checkpoint(ckpt_path)
            if tf_prefix:
                # a reference TF1 checkpoint (downloaded tarball): convert
                # on the fly, EMA shadows preferred (util_keras.py:108-203)
                tf_weights = convert_tf.load_tf_checkpoint(tf_prefix)
                self.variables = convert_tf.convert_tf_weights(
                    tf_weights, self.config, self.spec, self.variables)
            else:
                restored = ckpt_io.load_pytree(ckpt_path)
                self.variables = jax.tree.map(lambda _, r: r, self.variables,
                                              restored)
        if mesh is not None:
            from ..parallel import SPATIAL_AXIS, replicate
            if SPATIAL_AXIS in mesh.axis_names:
                n_sp = mesh.shape[SPATIAL_AXIS]
                if self.spec.image_size[0] % n_sp != 0:
                    raise ValueError(
                        f"spatial serving needs image height "
                        f"{self.spec.image_size[0]} divisible by the "
                        f"'{SPATIAL_AXIS}' mesh axis size {n_sp}")
            self.variables = replicate(mesh, self.variables)
        self._params_dict = self.config.as_dict()
        self._serve = jax.jit(self._serve_impl)
        self._serve_raw = jax.jit(self._serve_raw_impl)

    # The serve programs take the network state as a runtime ARGUMENT
    # (self._forward_state) rather than closing over self.variables:
    # closure-captured arrays lower as HLO constants, embedding the
    # full weights into every compiled program (oversized compile
    # payloads for the big variants, duplicated HBM across programs,
    # slow compiles). _forward_state is the variables pytree, or the
    # Int8Serve state after quantize_int8. `variables` is a property so
    # assigning fresh weights post-construction (the external
    # convert-then-assign workflow) reaches the already-jitted serve
    # programs instead of leaving them on a stale state; it also resets
    # any installed int8 path back to the float forward.
    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, v):
        self._variables = v
        self._forward_state = v
        self._forward = lambda state, images: self.net.apply(state, images,
                                                             False)

    def _put_batch(self, images: np.ndarray, scales):
        """Device placement for a serve batch.

        Without a mesh: plain transfers. With one: pad the batch up to a
        multiple of the data-axis size (repeating the last frame) and
        shard dim 0 over the data axes — XLA then partitions the whole
        serve program data-parallel. On a ('data','spatial') serve mesh
        the image ROWS additionally shard over 'spatial' (model-parallel
        convs via GSPMD halo exchange); raw uint8 frames of arbitrary
        height stay batch-sharded and pick up the row sharding after the
        on-device resize (see _serve_raw_impl). Returns
        (images, scales, original_batch)."""
        b = images.shape[0]
        if self.mesh is None:
            return (jnp.asarray(images),
                    None if scales is None else jnp.asarray(scales), b)
        from ..parallel import batch_sharding, data_axis_names, image_sharding
        n_data = int(np.prod([self.mesh.shape[a]
                              for a in data_axis_names(self.mesh)]))
        pad = (-b) % n_data
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
            if scales is not None:
                scales = np.concatenate(
                    [scales, np.repeat(scales[-1:], pad, 0)])
        img_sharding = (image_sharding(self.mesh)
                        if images.shape[1:3] == tuple(self.spec.image_size)
                        else batch_sharding(self.mesh))
        return (jax.device_put(images, img_sharding),
                None if scales is None else jax.device_put(
                    np.asarray(scales), batch_sharding(self.mesh)), b)

    def quantize_int8(self, representative_frames, *,
                      skip_patterns=None) -> None:
        """Switch this detector's serve path to on-device int8 (opt-in).

        Post-training quantization: conv weights per-output-channel int8,
        activations per-tensor int8 with scales calibrated on
        `representative_frames` (raw HxWx3 frames, host-preprocessed
        exactly like serve() inputs — the reference representative-dataset
        contract, infer_lib.py:497-540). Head `predict` layers,
        BatchNorm, activations and the whole postprocess stay float
        (inference/quantize.py). Affects serve/infer/serve_streams/
        serve_pipelined; export() is unchanged.
        """
        from .quantize import DEFAULT_SKIP, Int8Serve

        frames = list(representative_frames)
        if not frames:
            raise ValueError("quantize_int8 needs representative frames")
        batches = []
        for i in range(0, len(frames), 8):
            imgs = [preprocess_host(np.asarray(f), self.config.image_size,
                                    self.config.mean_rgb,
                                    self.config.stddev_rgb)[0]
                    for f in frames[i:i + 8]]
            batches.append(np.stack(imgs))
        int8 = Int8Serve(
            self.net, self.variables, batches,
            skip_patterns=skip_patterns or DEFAULT_SKIP)
        self._forward = int8
        self._forward_state = int8.state
        # fresh jit wrappers: the old traces baked in the float _forward
        self._serve = jax.jit(self._serve_impl)
        self._serve_raw = jax.jit(self._serve_raw_impl)

    def _serve_impl(self, state, images: jnp.ndarray, scales: jnp.ndarray
                    ) -> postprocess.Detections:
        return self._post_detections(self._forward(state, images), scales)

    def _serve_float_impl(self, images: jnp.ndarray, scales: jnp.ndarray
                          ) -> postprocess.Detections:
        """Serve program on the FLOAT forward, bypassing any int8
        interceptor installed by quantize_int8 — export() traces this so
        the artifact is always the float network (the documented
        contract)."""
        return self._post_detections(
            self.net.apply(self.variables, images, False), scales)

    def _post_detections(self, outs, scales) -> postprocess.Detections:
        cls_out, box_out = outs
        if self.post_mode == "tflite":
            # TFLite contract: normalized boxes, no scale-back
            # (reference postprocess.py:358-361 rejects scales here too)
            return postprocess.postprocess_tflite(self._params_dict,
                                                  cls_out, box_out)
        post = {"global": postprocess.postprocess_global,
                "per_class": postprocess.postprocess_per_class,
                "combined": postprocess.postprocess_combined}[self.post_mode]
        return post(self._params_dict, cls_out, box_out, image_scales=scales)

    def export(self, out_path: str, fmt: str = "stablehlo",
               batch_size: int = 1, quantize: str | None = None,
               representative_frames=None) -> None:
        """Export the serve program (forward + postprocess, fixed shapes).

        fmt: 'stablehlo' (jax.export AOT artifact) | 'saved_model' (jax2tf)
        | 'tflite' (SavedModel -> TFLite). The artifacts are re-served by
        inference.drivers.{StableHlo,SavedModel,Tflite}Driver — the
        reference's export -> SavedModelDriver/TfliteDriver story
        (infer_lib.py:270-380, 455-564).

        quantize (tflite only): None | 'fp16' | 'int8'. int8 requires
        `representative_frames` — an iterable of raw HxWx3 uint8 frames
        used as the post-training-quantization calibration set
        (infer_lib.py:497-540); they are host-preprocessed exactly like
        serve() inputs. Like the reference INT8 export (whose NMS stays a
        float builtin op, infer_lib.py:534-539), the int8 artifact
        contains the quantized network up to the TFLite-NMS-op inputs
        (box encodings, class scores, center-size anchors); TfliteDriver
        recognizes the 3-output layout and finishes with the same NMS
        semantics, emitting tflite-contract Detections (normalized boxes).
        """
        from . import export as export_lib
        from ..ops import postprocess as post_ops

        if quantize == "int8":
            def fn(images, scales):
                cls_out, box_out = self.net.apply(self.variables, images,
                                                  False)
                return tuple(post_ops.tflite_pre_nms(self._params_dict,
                                                     cls_out, box_out))
        else:
            def fn(images, scales):
                return tuple(self._serve_float_impl(images, scales))

        example = (np.zeros((batch_size, *self.spec.image_size, 3),
                            np.float32),
                   np.ones((batch_size,), np.float32))
        if fmt == "stablehlo":
            export_lib.export_stablehlo(fn, example, out_path)
        elif fmt == "saved_model":
            export_lib.export_saved_model(fn, example, out_path)
        elif fmt == "tflite":
            import tempfile

            rep = None
            if quantize == "int8":
                if representative_frames is None:
                    raise ValueError(
                        "int8 export needs representative_frames")
                from ..ops.preprocess import preprocess_host
                frames = list(representative_frames)
                if len(frames) < batch_size:
                    raise ValueError(
                        f"int8 export needs >= batch_size "
                        f"({batch_size}) representative frames, got "
                        f"{len(frames)} — the calibrator would receive "
                        f"zero samples")

                def rep():
                    for i in range(0, len(frames) - batch_size + 1,
                                   batch_size):
                        imgs, scales = [], []
                        for f in frames[i:i + batch_size]:
                            im, s = preprocess_host(
                                np.asarray(f), self.config.image_size,
                                self.config.mean_rgb,
                                self.config.stddev_rgb)
                            imgs.append(im)
                            scales.append(s)
                        # keyed by the named signature inputs: the
                        # calibrator's positional order is not the
                        # signature order
                        yield {"images": np.stack(imgs).astype(np.float32),
                               "scales": np.asarray(scales, np.float32)}

            with tempfile.TemporaryDirectory() as tmp:
                export_lib.export_saved_model(
                    fn, example, tmp, input_names=("images", "scales"))
                export_lib.export_tflite(tmp, out_path, quantize=quantize,
                                         representative_dataset=rep)
        else:
            raise ValueError(f"unknown export format {fmt}")

    def _serve_raw_impl(self, state, raw: jnp.ndarray
                        ) -> postprocess.Detections:
        """[B, H, W, 3] uint8 raw frames -> Detections, all on device."""
        from ..ops.preprocess import preprocess_jax
        images, scales = jax.vmap(
            lambda im: preprocess_jax(im, self.config.image_size,
                                      self.config.mean_rgb,
                                      self.config.stddev_rgb))(raw)
        if self.mesh is not None:
            # raw frames arrive batch-sharded (arbitrary height); on a
            # spatial serve mesh re-lay the fixed-shape resized batch so
            # the network runs row-sharded from the first conv
            from ..parallel import image_sharding
            images = jax.lax.with_sharding_constraint(
                images, image_sharding(self.mesh))
        return self._serve_impl(state, images, scales)

    def serve(self, raw_frames, *,
              device_preprocess: bool = False) -> postprocess.Detections:
        """Batch of raw RGB frames -> padded Detections in original coords.

        device_preprocess=True ships the RAW uint8 frames to the device
        and runs resize+normalize+pad there (one jitted program per raw
        shape): ~1.8x less host->device transfer than the padded f32
        batch and zero host preprocessing — the right mode for streaming
        a fixed camera shape. Requires all frames to share one shape;
        the default host path handles mixed sizes.
        """
        if device_preprocess:
            raw = np.stack([np.asarray(f) for f in raw_frames])
            if raw.dtype != np.uint8:
                raise ValueError("device_preprocess expects uint8 frames")
            raw, _, b = self._put_batch(raw, None)
            return jax.tree.map(lambda a: np.asarray(a)[:b],
                                self._serve_raw(self._forward_state, raw))
        imgs, scales = zip(*[
            preprocess_host(f, self.config.image_size, self.config.mean_rgb,
                            self.config.stddev_rgb) for f in raw_frames])
        images, scales, b = self._put_batch(
            np.stack(imgs), np.asarray(scales, np.float32))
        return jax.tree.map(lambda a: np.asarray(a)[:b],
                            self._serve(self._forward_state, images, scales))

    def infer(self, frame: np.ndarray, max_boxes: int = 200
              ) -> Tuple[List[tuple], List[float]]:
        """Person detections for one raw frame (detector.py:35-60)."""
        det = self.serve(np.asarray(frame)[None])
        boxes, scores, classes, valid = (det.boxes[0], det.scores[0],
                                         det.classes[0], det.valid[0])
        bb, sc = [], []
        for i in range(boxes.shape[0]):
            if len(bb) == max_boxes:
                break
            if valid[i] and classes[i] == 1:  # person after CLASS_OFFSET
                bb.append(tuple(boxes[i].tolist()))
                sc.append(float(scores[i]))
        return bb, sc

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """Draw person detections over the frame (detector.py:62-72)."""
        from ..demo import draw
        bb, sc = self.infer(frame)
        thresh = self.config.nms_configs.score_thresh or 0.0
        bb, sc = draw.filter_by_thresh(bb, sc, thresh)
        return draw.draw_boxes(frame, bb, sc)

    def serve_streams(self, streams):
        """Serve several frame sources through ONE batched program.

        TPU-native multi-stream serving (the reference runs one stream
        per Detector): the batch dimension is pinned to len(streams) so
        the serve program compiles exactly once; when a stream ends early
        its slot is padded with the last frame and the result masked out.
        Yields per tick a list of length len(streams) whose entries are
        per-stream Detections (leading dim stripped) or None for ended
        streams.
        """
        from .streaming import MultiStream
        n = len(streams)
        pad = None
        for indices, frames in MultiStream(streams).play():
            pad = frames[0] if pad is None else pad
            batch = [None] * n
            for i, f in zip(indices, frames):
                batch[i] = f
            # serve() preprocesses per frame, so mixed raw sizes are fine
            det = self.serve([f if f is not None else pad for f in batch])
            out = [None] * n
            for i in indices:
                out[i] = jax.tree.map(lambda a: a[i], det)
            yield out

    def serve_pipelined(self, frames_iter, *, batch_size: int = 1,
                        device_preprocess: bool = False):
        """Stream frames through the serve program with host/device overlap.

        The reference serves frames strictly serially (demo loops call
        KerasDriver.serve per frame); here a background thread runs the
        host side of batch t+1 while the device executes batch t — double
        buffering via data/pipeline.prefetch, the same pattern as the
        training input pipeline. The final partial batch is padded to
        `batch_size` (one compiled program) and the padding results
        dropped. Yields one Detections per frame, in order.

        device_preprocess=True additionally moves resize/normalize/pad
        onto the chip (see serve()): the background thread only stacks +
        uploads RAW uint8 frames — the fastest streaming mode for a
        fixed camera shape (all frames must share one shape).
        """
        from ..data.pipeline import prefetch
        from ..ops.preprocess import preprocess_host

        _END = object()  # private exhaustion sentinel: a None yielded by
        # the caller's iterator is an error, not end-of-stream

        def host_batches():
            buf, pad_count = [], 0
            it = iter(frames_iter)
            while True:
                frame = next(it, _END)
                if frame is _END:
                    if not buf:
                        return
                    pad_count = batch_size - len(buf)
                    buf.extend([buf[-1]] * pad_count)
                else:
                    if frame is None:
                        raise ValueError(
                            "frames_iter yielded None mid-stream")
                    buf.append(np.asarray(frame))
                if len(buf) == batch_size:
                    if device_preprocess:
                        yield np.stack(buf), None, batch_size - pad_count
                    else:
                        pre = [preprocess_host(f, self.config.image_size,
                                               self.config.mean_rgb,
                                               self.config.stddev_rgb)
                               for f in buf]
                        yield (np.stack([p[0] for p in pre]),
                               np.asarray([p[1] for p in pre]),
                               batch_size - pad_count)
                    if pad_count:
                        return
                    buf = []

        def put(item):
            imgs, scales, n = item
            imgs, scales, _ = self._put_batch(
                imgs, None if scales is None
                else np.asarray(scales, np.float32))
            return imgs, scales, n

        for imgs, scales, n in prefetch(host_batches(), device_put_fn=put):
            if device_preprocess:
                det = jax.tree.map(
                    np.asarray, self._serve_raw(self._forward_state, imgs))
            else:
                det = jax.tree.map(
                    np.asarray,
                    self._serve(self._forward_state, imgs, scales))
            for i in range(n):
                yield jax.tree.map(lambda a: a[i], det)
