"""Export path tests (infer_lib export parity patterns,
model_inspect_test.py:63-169 / infer_lib_test.py:40-126 shapes)."""
import numpy as np
import pytest

TINY = {"image_size": 64, "fpn_num_filters": 16, "fpn_cell_repeats": 1,
        "box_class_repeats": 1,
        "nms_configs": {"pre_nms_topk": 64, "max_output_size": 8}}


def _tiny_served_detector():
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    det = Detector(model_name="efficientdet-lite0", params=TINY)
    raw = np.random.RandomState(5).uniform(
        0, 255, (2, 80, 100, 3)).astype(np.uint8)
    return det, raw, det.serve(raw)


def _assert_matches(out, ref, atol_box=1e-3):
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores),
                       atol=1e-5)
    assert np.allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                       atol=atol_box)
    assert np.array_equal(np.asarray(out.classes), np.asarray(ref.classes))
    assert np.array_equal(np.asarray(out.valid_len),
                          np.asarray(ref.valid_len))


@pytest.mark.slow
def test_stablehlo_driver_reserves_export(tmp_path):
    """Detector.export('stablehlo') -> StableHloDriver.serve == live serve
    (the reference's export -> re-serve story, infer_lib.py:120-135)."""
    from mladversarialobjectdetection_tpu.inference.drivers import (
        StableHloDriver)
    det, raw, ref = _tiny_served_detector()
    path = str(tmp_path / "det.stablehlo")
    det.export(path, fmt="stablehlo", batch_size=2)
    driver = StableHloDriver(path, model_name="efficientdet-lite0",
                             params=TINY)
    _assert_matches(driver.serve(raw), ref)


@pytest.mark.slow
def test_saved_model_driver_reserves_export(tmp_path):
    """Detector.export('saved_model') -> SavedModelDriver (TF runtime)."""
    pytest.importorskip("tensorflow")
    from mladversarialobjectdetection_tpu.inference.drivers import (
        SavedModelDriver)
    det, raw, ref = _tiny_served_detector()
    out_dir = str(tmp_path / "saved_model")
    det.export(out_dir, fmt="saved_model", batch_size=2)
    driver = SavedModelDriver(out_dir, model_name="efficientdet-lite0",
                              params=TINY)
    _assert_matches(driver.serve(raw), ref)


@pytest.mark.slow
def test_tflite_driver_reserves_export(tmp_path):
    """Detector.export('tflite') -> TfliteDriver (TFLite interpreter)."""
    pytest.importorskip("tensorflow")
    from mladversarialobjectdetection_tpu.inference.drivers import (
        TfliteDriver)
    det, raw, ref = _tiny_served_detector()
    path = str(tmp_path / "det.tflite")
    det.export(path, fmt="tflite", batch_size=2)
    driver = TfliteDriver(path, model_name="efficientdet-lite0", params=TINY)
    # TFLite kernels differ slightly from XLA; with a random-weight model
    # the score field is nearly flat, so near-tie candidates can swap under
    # float drift. Assert set-wise agreement instead of slotwise equality.
    out = driver.serve(raw)
    assert np.allclose(np.asarray(out.scores), np.asarray(ref.scores),
                       atol=1e-3)
    from mladversarialobjectdetection_tpu.ops.nms_np import iou_np
    for i in range(len(raw)):
        matched = 0
        for ob, os_ in zip(np.asarray(out.boxes)[i],
                           np.asarray(out.scores)[i]):
            ious = iou_np(ob, np.asarray(ref.boxes)[i])
            close = (np.abs(np.asarray(ref.scores)[i] - os_) < 1e-3)
            if np.any((ious > 0.9) & close):
                matched += 1
        assert matched >= 6, f"image {i}: only {matched}/8 detections match"


def test_stablehlo_roundtrip(tmp_path):
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.inference import export

    def fn(x):
        return jnp.tanh(x) * 2.0

    x = np.ones((2, 4), np.float32)
    path = str(tmp_path / "fn.stablehlo")
    export.export_stablehlo(fn, (x,), path)
    loaded = export.load_stablehlo(path)
    out = loaded(x)
    assert np.allclose(np.asarray(out), np.tanh(x) * 2.0, atol=1e-6)


def test_stablehlo_detector(tmp_path, tiny_detector, rand_images):
    from mladversarialobjectdetection_tpu.inference import export
    from mladversarialobjectdetection_tpu.ops import postprocess

    cfg, spec, net, variables = tiny_detector
    params = cfg.as_dict()

    def fwd(images):
        cls_out, box_out = net.apply(variables, images, False)
        det = postprocess.postprocess_global(params, cls_out, box_out)
        return det.boxes, det.scores, det.valid_len

    path = str(tmp_path / "det.stablehlo")
    export.export_stablehlo(fwd, (np.asarray(rand_images),), path)
    loaded = export.load_stablehlo(path)
    boxes, scores, valid_len = loaded(np.asarray(rand_images))
    ref_boxes, ref_scores, ref_valid = fwd(rand_images)
    assert np.allclose(np.asarray(boxes), np.asarray(ref_boxes), atol=1e-4)
    assert np.allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)


@pytest.mark.slow
def test_tflite_int8_export_reserves(tmp_path):
    """INT8 post-training quantization with a representative dataset
    (infer_lib.py:497-540) -> TfliteDriver re-serve with bounded
    disagreement vs the fp32 tflite-mode serve. Like the reference INT8
    export, the quantized artifact ends at the TFLite-NMS op's inputs
    (the NMS stays float); the driver recognizes the 3-output layout and
    finishes with the same NMS semantics."""
    pytest.importorskip("tensorflow")
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    from mladversarialobjectdetection_tpu.inference.drivers import (
        TfliteDriver)
    det, raw, _ = _tiny_served_detector()
    rng = np.random.RandomState(11)
    rep_frames = [rng.uniform(0, 255, (80, 100, 3)).astype(np.uint8)
                  for _ in range(8)]
    path = str(tmp_path / "det_int8.tflite")
    det.export(path, fmt="tflite", batch_size=2, quantize="int8",
               representative_frames=rep_frames)
    assert int(__import__("os").path.getsize(path)) > 0

    # fp32 reference with identical output contract: tflite post-mode
    # (normalized boxes, per-anchor max class), same weights
    ref_det = Detector(model_name="efficientdet-lite0", params=TINY,
                       post_mode="tflite")
    ref_det.variables = det.variables
    ref = ref_det.serve(raw)

    driver = TfliteDriver(path, model_name="efficientdet-lite0", params=TINY)
    out = driver.serve(raw)
    # int8 activations shift scores; near-tie candidates can reorder on
    # the flat random-weight score field, so compare as score SETS plus a
    # quantization-error bound on each slot
    ref_s = np.sort(np.asarray(ref.scores) * np.asarray(ref.valid), axis=1)
    out_s = np.sort(np.asarray(out.scores) * np.asarray(out.valid), axis=1)
    assert out_s.shape == ref_s.shape
    delta = np.abs(out_s - ref_s).max()
    assert delta < 0.15, f"int8 score delta {delta}"
    # serve() rescales the normalized tflite contract to ORIGINAL frame
    # coords + 1-based classes (reference TfliteDriver.serve parity,
    # infer_lib.py:343-350): valid boxes land at 80x100-frame scale.
    # Neither side clips, so decoded boxes may overshoot the frame
    # (normalized coords slightly outside [0,1]) — bound loosely.
    valid = np.asarray(out.valid).astype(bool)
    vb = np.asarray(out.boxes)[valid]
    if vb.size:
        assert 1.5 < float(vb.max()) <= 200.0 and float(vb.min()) > -50.0
        assert int(np.asarray(out.classes)[valid].min()) >= 1
    # predict() keeps the raw normalized artifact contract for consumers
    # feeding preprocessed inputs (train/eval.py --artifact)
    from mladversarialobjectdetection_tpu.ops.preprocess import (
        preprocess_host)
    imgs, scales = zip(*[preprocess_host(f, driver.config.image_size,
                                         driver.config.mean_rgb,
                                         driver.config.stddev_rgb)
                         for f in raw])
    pred = driver.predict(np.stack(imgs), np.asarray(scales, np.float32))
    pb = np.asarray(pred.boxes)[np.asarray(pred.valid).astype(bool)]
    if pb.size:
        assert float(pb.max()) < 1.5 and float(pb.min()) > -0.5


@pytest.mark.slow
def test_tflite_int8_requires_representative(tmp_path):
    det, raw, ref = _tiny_served_detector()
    with pytest.raises(ValueError, match="representative"):
        det.export(str(tmp_path / "x.tflite"), fmt="tflite",
                   quantize="int8")
