"""Auxiliary subsystem tests: visualization, debug utils, train_loop,
supervised-trainer mAP eval loop on synthetic data."""
import os

import jax
import numpy as np
import pytest


def test_plot_asr_curve():
    from mladversarialobjectdetection_tpu.utils import visualize
    img = visualize.plot_asr_curve([0.5, 0.6, 0.7], [1.0, 0.9, 0.8])
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8


def test_plot_score_violin():
    from mladversarialobjectdetection_tpu.utils import visualize
    img = visualize.plot_score_violin([0.9, 0.8, 0.7], [0.3, 0.2])
    assert img.ndim == 3


def test_draw_detections_grid():
    from mladversarialobjectdetection_tpu.utils import visualize
    imgs = np.zeros((2, 32, 32, 3), np.float32)
    boxes = np.array([[[2, 2, 20, 20]]] * 2, np.float32)
    valid = np.ones((2, 1), bool)
    out = visualize.draw_detections_grid(imgs, boxes, valid, boxes, valid)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.uint8


def test_reduce_lr_on_plateau():
    import optax
    from mladversarialobjectdetection_tpu.utils.train_loop import \
        ReduceLROnPlateau
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=0.01)
    opt_state = tx.init({"w": np.zeros(3)})
    ctl = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-4)
    opt_state = ctl.update(1.0, opt_state)   # best=1.0
    opt_state = ctl.update(1.1, opt_state)   # wait 1
    opt_state = ctl.update(1.2, opt_state)   # wait 2 -> halve
    assert float(opt_state.hyperparams["learning_rate"]) == pytest.approx(
        0.005)
    opt_state = ctl.update(0.5, opt_state)   # improvement resets
    assert ctl.wait == 0


def test_metric_logger(tmp_path):
    from mladversarialobjectdetection_tpu.utils.train_loop import MetricLogger
    log_dir = str(tmp_path / "logs")
    m = MetricLogger(log_dir)
    m.log(1, {"loss": 1.5}, prefix="train/")
    m.close()
    import json
    lines = open(os.path.join(log_dir, "metrics.jsonl")).readlines()
    rec = json.loads(lines[0])
    assert rec["train/loss"] == 1.5 and rec["step"] == 1


def test_metric_logger_nonfinite_as_null(tmp_path):
    """Non-finite metric values (asr_to_scale on non-ASR train steps) are
    written as JSON null — the line stays strict JSON and a consumer
    averaging the column skips them instead of NaN-poisoning the mean."""
    from mladversarialobjectdetection_tpu.utils.train_loop import MetricLogger
    log_dir = str(tmp_path / "logs")
    m = MetricLogger(log_dir)
    m.log(1, {"loss": 2.0, "asr_to_scale": float("nan")})
    m.log(2, {"loss": 1.0, "asr_to_scale": 2.17})
    m.log(3, {"loss": float("inf"), "asr_to_scale": float("-inf")})
    m.close()
    import json
    recs = [json.loads(ln) for ln in  # strict=True would reject NaN tokens
            open(os.path.join(log_dir, "metrics.jsonl"))]
    assert recs[0]["asr_to_scale"] is None and recs[0]["loss"] == 2.0
    assert recs[1]["asr_to_scale"] == 2.17
    assert recs[2]["loss"] is None and recs[2]["asr_to_scale"] is None
    vals = [r["asr_to_scale"] for r in recs if r["asr_to_scale"] is not None]
    assert sum(vals) / len(vals) == 2.17


def test_benchmark_harness():
    import jax.numpy as jnp
    from mladversarialobjectdetection_tpu.utils import debug
    f = jax.jit(lambda x: x * 2)
    dt = debug.benchmark(f, jnp.ones((4, 4)), iters=3, warmup=1)
    assert dt > 0


@pytest.mark.slow
def test_supervised_map_eval(tiny_cfg):
    """The COCO-eval callback loop runs end-to-end on synthetic batches."""
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    from mladversarialobjectdetection_tpu.train.train import evaluate_map
    t = DetectorTrainer(tiny_cfg, steps_per_epoch=10)
    state = t.init_state(jax.random.PRNGKey(0))
    b = 2
    g = 4

    def batches():
        rng = np.random.default_rng(0)
        while True:
            yield {"images": rng.uniform(-1, 1, (b, 64, 64, 3)).astype(
                       np.float32),
                   "boxes": np.tile(np.array([[8, 8, 40, 40]], np.float32),
                                    (b, g, 1)),
                   "classes": np.zeros((b, g), np.int32),
                   "valid": np.pad(np.ones((b, 1), bool),
                                   ((0, 0), (0, g - 1)))}
    res = evaluate_map(t, state, batches(), n_batches=2)
    assert set(res) >= {"AP", "AP50", "AP75"}
    assert 0.0 <= res["AP"] <= 1.0
