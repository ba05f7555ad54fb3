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


@pytest.mark.slow
def test_eval_follow_continuous(tmp_path):
    """Continuous-eval watch mode (tf2/train.py:271-297 parity): a writer
    thread produces ckpt-0 then ckpt-1 while follow() is already watching;
    both get evaluated in order, the best is archived, and the loop
    terminates at --until-epoch (deletion tolerance is pinned separately
    below, deterministically)."""
    import threading
    import time

    import jax

    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr
    from mladversarialobjectdetection_tpu.train import eval as eval_cli
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    from mladversarialobjectdetection_tpu import config as config_lib

    val = str(tmp_path / "val.tfrecord")
    tfr.write_fake_tfrecord(val, n=2, image_hw=(64, 64))
    model_dir = tmp_path / "mdir"
    model_dir.mkdir()

    cfg = config_lib.get_efficientdet_config("efficientdet-lite0")
    cfg.override(TINY)
    trainer = DetectorTrainer(cfg, steps_per_epoch=10)
    variables = trainer.eval_variables(
        trainer.init_state(jax.random.PRNGKey(0)))

    def writer():
        time.sleep(0.5)
        ckpt_io.save_pytree(str(model_dir / "ckpt-0"), variables)
        time.sleep(1.5)
        ckpt_io.save_pytree(str(model_dir / "ckpt-1"), variables)

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    results = eval_cli.follow(
        "efficientdet-lite0", val, str(model_dir), min_interval=0.1,
        idle_timeout=60.0, until_epoch=1, batch_size=2, hparams=TINY)
    t.join()
    assert sorted(results) == [0, 1]
    for m in results.values():
        assert "AP" in m
    archive = model_dir / "archive"
    assert archive.is_dir()
    assert (archive / "best_eval.txt").exists()


def test_eval_follow_tolerates_deleted_checkpoint(tmp_path, monkeypatch):
    """A checkpoint the trainer garbage-collects mid-eval is skipped, not
    fatal (tf2/train.py:292-296 NotFoundError tolerance). Deterministic:
    the eval stub deletes ckpt-0 under its own feet and raises, like a
    reader hitting vanished files."""
    import shutil

    from mladversarialobjectdetection_tpu.train import eval as eval_cli

    model_dir = tmp_path / "mdir"
    model_dir.mkdir()
    (model_dir / "ckpt-0").mkdir()
    (model_dir / "ckpt-1").mkdir()

    def fake_evaluate(model, pattern, *, ckpt=None, **kw):
        if ckpt.endswith("ckpt-0"):
            shutil.rmtree(ckpt)
            raise FileNotFoundError(ckpt)
        return {"AP": 0.5}

    monkeypatch.setattr(eval_cli, "evaluate", fake_evaluate)
    results = eval_cli.follow(
        "efficientdet-lite0", str(tmp_path / "val-*.tfrecord"),
        str(model_dir), min_interval=0.05, idle_timeout=2.0, until_epoch=1)
    assert sorted(results) == [1]
    assert (model_dir / "archive" / "best_eval.txt").exists()


def test_eval_follow_idle_timeout_empty_dir(tmp_path):
    """follow() on a dir that never produces checkpoints returns empty
    after idle_timeout instead of hanging forever."""
    from mladversarialobjectdetection_tpu.train import eval as eval_cli
    model_dir = tmp_path / "empty"
    model_dir.mkdir()
    results = eval_cli.follow(
        "efficientdet-lite0", str(tmp_path / "none-*.tfrecord"),
        str(model_dir), min_interval=0.05, idle_timeout=0.3, batch_size=2,
        hparams=TINY)
    assert results == {}
