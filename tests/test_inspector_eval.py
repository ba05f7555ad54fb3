"""Inspector CLI + standalone COCO-eval CLI tests.

Mirrors the reference surfaces: tf2/inspector.py run modes (infer /
benchmark / dry / video) and tf2/eval.py (checkpoint -> TFRecord eval ->
metric dict)."""
import os

import numpy as np
import pytest

from mladversarialobjectdetection_tpu.inference import inspector

TINY = ("image_size=64,fpn_num_filters=16,fpn_cell_repeats=1,"
        "box_class_repeats=1,nms_configs.score_thresh=0.0,"
        "nms_configs.pre_nms_topk=64,nms_configs.max_output_size=16")


@pytest.fixture(scope="module")
def tiny_inspector_detector():
    return inspector.build_detector("efficientdet-lite0", hparams=TINY)


def test_inspector_infer_writes_annotated_image(tmp_path,
                                                tiny_inspector_detector):
    from PIL import Image
    rng = np.random.default_rng(0)
    src = tmp_path / "in.jpg"
    Image.fromarray(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
                    ).save(src)
    out = inspector.run_infer(tiny_inspector_detector, str(src),
                              str(tmp_path / "out"), min_score=0.0)
    assert os.path.exists(out)
    img = np.asarray(Image.open(out))
    assert img.shape == (80, 96, 3)


@pytest.mark.slow
def test_inspector_dry_roundtrips_native_ckpt(tmp_path,
                                              tiny_inspector_detector):
    """dry --export-ckpt writes a native checkpoint a fresh Detector can
    restore to an identical serve program (inspector.py:146-152 ckpt
    transfer)."""
    import jax

    ckpt = str(tmp_path / "native_ckpt")
    inspector.run_dry(tiny_inspector_detector, export_ckpt=ckpt)
    det2 = inspector.build_detector("efficientdet-lite0", hparams=TINY,
                                    ckpt=ckpt)
    for a, b in zip(jax.tree.leaves(tiny_inspector_detector.variables),
                    jax.tree.leaves(det2.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_inspector_benchmark_reports_throughput(tiny_inspector_detector):
    res = inspector.run_benchmark(tiny_inspector_detector, batch_size=2,
                                  bm_runs=2)
    assert res["ms"] > 0 and res["fps"] > 0 and res["compile_s"] > 0
    res_net = inspector.run_benchmark(tiny_inspector_detector, batch_size=2,
                                      bm_runs=2, only_network=True)
    assert res_net["ms"] > 0


@pytest.mark.slow
def test_inspector_video_annotates_clip(tmp_path, tiny_inspector_detector):
    import cv2

    from mladversarialobjectdetection_tpu.demo import synthetic_clip

    clip = str(tmp_path / "clip.mp4")
    synthetic_clip.write_clip(clip, n_frames=5, height=120, width=160,
                              seed=0)
    out = str(tmp_path / "annotated.mp4")
    n = inspector.run_video(tiny_inspector_detector, clip, out,
                            min_score=0.0, batch_size=2, max_frames=5)
    assert n == 5
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    got = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        got += 1
        assert frame.shape[2] == 3
    cap.release()
    assert got == 5


@pytest.mark.slow
def test_eval_cli_over_fake_tfrecords(tmp_path):
    """tf2/eval.py parity: ckpt-less tiny model over fake TFRecords
    produces the full 12-metric dict (+ per-class names)."""
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    from mladversarialobjectdetection_tpu.train import eval as eval_cli

    path = str(tmp_path / "val-00000.tfrecord")
    tfr.write_fake_tfrecord(path, n=4, image_hw=(64, 64))
    metrics = eval_cli.evaluate(
        "efficientdet-lite0", str(tmp_path / "val-*.tfrecord"),
        batch_size=2, hparams=TINY, score_thresh=0.0, per_class=True)
    for key in ("AP", "AP50", "AP75", "APs", "APm", "APl", "ARmax1",
                "ARmax10", "ARmax100", "ARs", "ARm", "ARl"):
        assert key in metrics
        assert np.isfinite(metrics[key]) or metrics[key] == -1.0
    # per-class entries carry label-map names (fake records are class 1)
    assert any(k.startswith("AP_/") for k in metrics)
    assert "AP_/person" in metrics


@pytest.mark.slow
def test_eval_artifact_matches_live_model(tmp_path):
    """eval --artifact (the eval_tflite.py analog generalized to all
    export formats) reproduces the live model's metrics exactly: export
    the deterministic tiny per_class detector to StableHLO, evaluate the
    artifact, compare to the live eval."""
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    from mladversarialobjectdetection_tpu.inference.detector import Detector
    from mladversarialobjectdetection_tpu.train import eval as eval_cli

    path = str(tmp_path / "val.tfrecord")
    tfr.write_fake_tfrecord(path, n=4, image_hw=(64, 64))

    live = eval_cli.evaluate("efficientdet-lite0", path, batch_size=2,
                             hparams=TINY, score_thresh=0.0)

    # same model_name/params/seed -> identical random weights as the
    # Detector evaluate() builds internally
    cfg = inspector.build_detector("efficientdet-lite0",
                                   hparams=TINY).config
    det = Detector(model_name="efficientdet-lite0", params=cfg.as_dict(),
                   post_mode="per_class")
    artifact = str(tmp_path / "model.stablehlo")
    det.export(artifact, fmt="stablehlo", batch_size=2)

    arte = eval_cli.evaluate("efficientdet-lite0", path, batch_size=2,
                             hparams=TINY, score_thresh=0.0,
                             artifact=artifact)
    for k in live:
        assert arte[k] == pytest.approx(live[k], abs=1e-6), k


def test_eval_cli_eval_samples_cap(tmp_path):
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    from mladversarialobjectdetection_tpu.train import eval as eval_cli

    path = str(tmp_path / "val.tfrecord")
    tfr.write_fake_tfrecord(path, n=4, image_hw=(64, 64))
    assert eval_cli.count_examples(path) == 4
    with pytest.raises(ValueError, match="batch_size"):
        eval_cli.evaluate("efficientdet-lite0", path, batch_size=8,
                          hparams=TINY, eval_samples=4)
