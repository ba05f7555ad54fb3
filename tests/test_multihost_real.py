"""REAL 2-process multi-host execution (VERDICT r3 #3).

tests/test_multihost_input.py pins the multi-host input helpers at
process_count=1; this test actually SPAWNS two `jax.distributed` CPU
processes (localhost coordinator, 2 virtual devices each -> one 4-device
cross-process mesh) and executes the production path: disjoint TFRecord
file shards, per-process local batches assembled by `shard_batch_local`
(`jax.make_array_from_process_local_data`), one SPMD supervised train
step with cross-process gradient collectives, per-process metric files,
and process-0-only checkpoint writes. The step loss and the assembled
batch checksums must match a single-process reference computed in this
parent process.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_loss() -> float:
    """Single-process reference: the same step on the same global batch
    (the worker regenerates it from the same seed)."""
    from mladversarialobjectdetection_tpu import config as config_lib
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer

    cfg = config_lib.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    cfg.fpn_num_filters = 16
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.max_boxes_per_image = 4
    cfg.nms_configs.update({"pre_nms_topk": 64, "max_output_size": 16})
    trainer = DetectorTrainer(cfg, steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    gb = 4
    images = rng.uniform(-1, 1, (gb, 64, 64, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[8.0, 8.0, 40.0, 40.0],
                                [20.0, 20.0, 56.0, 60.0]], np.float32),
                    (gb, 1, 1))
    _, metrics = jax.jit(trainer.train_step)(
        state, images, boxes, np.zeros((gb, 2), np.int32),
        np.ones((gb, 2), bool))
    rows = images.sum(axis=(1, 2, 3))
    w = np.arange(1, gb + 1, dtype=np.float32)
    return (float(metrics["loss"]), float(rows.sum()),
            float((rows * w).sum()), float(boxes.sum()))


def test_two_process_distributed_training(tmp_path):
    from mladversarialobjectdetection_tpu.data import tfrecord as tfr

    # two TFRecord files -> file-level sharding engages (one per process)
    for i in range(2):
        tfr.write_fake_tfrecord(str(tmp_path / f"shard-{i}.tfrecord"),
                                n=2, image_hw=(64, 64))

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the workers configure their own device counts via the config API;
    # scrub the conftest fake-8-device env so it can't interfere
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             "--pid", str(pid), "--nprocs", "2", "--coord", coord,
             "--tmp", str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["process_index"]] = r
    assert sorted(results) == [0, 1]

    # topology: 2 processes x 2 local devices = one 4-device global mesh
    for r in results.values():
        assert r["process_count"] == 2
        assert r["local_device_count"] == 2
        assert r["device_count"] == 4
        assert r["mesh_devices"] == 4
        assert r["local_batch"] == 2
        assert r["step"] == 1
        assert r["shard_n_images"] == 2
    assert results[0]["is_main"] and not results[1]["is_main"]

    # disjoint file shards covering the dataset
    f0, f1 = (set(results[0]["shard_files"]), set(results[1]["shard_files"]))
    assert f0 and f1 and not (f0 & f1)
    assert f0 | f1 == {"shard-0.tfrecord", "shard-1.tfrecord"}

    # the assembled global batch is the canonical batch, rows in order,
    # and the SPMD step over it reproduces the single-process loss
    ref_loss, ref_total, ref_weighted, ref_boxes = _reference_loss()
    for r in results.values():
        np.testing.assert_allclose(r["checksum_total"], ref_total,
                                   rtol=1e-5)
        np.testing.assert_allclose(r["checksum_weighted"], ref_weighted,
                                   rtol=1e-5)
        np.testing.assert_allclose(r["checksum_boxes"], ref_boxes,
                                   rtol=1e-6)
        np.testing.assert_allclose(r["loss"], ref_loss, rtol=1e-4)
    assert results[0]["loss"] == results[1]["loss"]  # same replicated value

    # per-process metric files: canonical name on p0, .p1 suffix on p1
    assert results[0]["metric_file"] == "metrics.jsonl"
    assert results[1]["metric_file"] == "metrics.p1.jsonl"
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    assert (tmp_path / "logs" / "metrics.p1.jsonl").exists()

    # process-0-only checkpoint write
    assert (tmp_path / "state-latest.msgpack").exists()
    writers = (tmp_path / "ckpt_writer.txt").read_text().split()
    assert writers == ["0"]
