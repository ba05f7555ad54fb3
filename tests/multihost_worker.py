"""Worker for the REAL 2-process multi-host test (test_multihost_real.py).

Launched twice by the test harness with a shared localhost coordinator.
Each process owns 2 virtual CPU devices (4 global), initializes
`jax.distributed`, and exercises the production multi-host path end to
end: disjoint TFRecord file shards, per-process local batch loading,
`shard_batch_local` global assembly, one SPMD supervised train step over
the cross-process mesh, per-process metric files, and process-0-gated
checkpoint writes. Results are emitted as one `RESULT {json}` line on
stdout for the parent to assert on.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--coord", required=True)
    ap.add_argument("--tmp", required=True)
    a = ap.parse_args()

    import jax

    # 2 local CPU devices per process BEFORE backend init; the config API
    # is authoritative on this platform (env selection is ignored)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=a.coord,
                               num_processes=a.nprocs, process_id=a.pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mladversarialobjectdetection_tpu import config as config_lib
    from mladversarialobjectdetection_tpu import parallel
    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
    from mladversarialobjectdetection_tpu.data.tfrecord import (
        DetectionTFRecordReader)
    from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer
    from mladversarialobjectdetection_tpu.utils.train_loop import MetricLogger

    out = {"process_index": int(jax.process_index()),
           "process_count": int(jax.process_count()),
           "device_count": int(jax.device_count()),
           "local_device_count": int(jax.local_device_count()),
           "is_main": bool(parallel.is_main_process())}

    # -- disjoint file-level TFRecord shards --------------------------------
    reader = DetectionTFRecordReader(
        os.path.join(a.tmp, "shard-*.tfrecord"), image_size=64,
        mean_rgb=127.0, stddev_rgb=128.0, max_instances=4, shuffle=False,
        shard=(jax.process_index(), jax.process_count()))
    files = reader.files
    if len(files) >= jax.process_count():  # file-level sharding engages
        files = files[jax.process_index()::jax.process_count()]
    out["shard_files"] = [os.path.basename(f) for f in files]
    local_rb = next(reader.batches(2))
    out["shard_n_images"] = int(local_rb["images"].shape[0])

    # -- global batch assembly + one SPMD supervised step --------------------
    cfg = config_lib.get_efficientdet_config("efficientdet-lite0")
    cfg.image_size = 64
    cfg.fpn_num_filters = 16
    cfg.fpn_cell_repeats = 1
    cfg.box_class_repeats = 1
    cfg.max_boxes_per_image = 4
    cfg.nms_configs.update({"pre_nms_topk": 64, "max_output_size": 16})

    mesh = parallel.make_mesh()  # all 4 global devices, 'data' axis
    out["mesh_devices"] = int(mesh.devices.size)
    trainer = DetectorTrainer(cfg, steps_per_epoch=10)
    state = parallel.replicate(mesh, trainer.init_state(jax.random.PRNGKey(0)))

    # the canonical global batch, regenerated identically on every process
    # and in the parent's single-process reference
    rng = np.random.default_rng(0)
    gb = 4
    images = rng.uniform(-1, 1, (gb, 64, 64, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[8.0, 8.0, 40.0, 40.0],
                                [20.0, 20.0, 56.0, 60.0]], np.float32),
                    (gb, 1, 1))
    classes = np.zeros((gb, 2), np.int32)
    valid = np.ones((gb, 2), bool)

    # each process feeds ONLY its process-major slice (production contract)
    lb = parallel.local_batch_size(gb)
    out["local_batch"] = lb
    sl = slice(a.pid * lb, (a.pid + 1) * lb)
    batch = parallel.shard_batch_local(mesh, {
        "images": images[sl], "boxes": boxes[sl],
        "classes": classes[sl], "valid": valid[sl]})

    # replicated-output checksums of the ASSEMBLED global arrays: must
    # equal the parent's checksums of the full batch (ordering included
    # via the weighted row sum)
    import jax.numpy as jnp
    rep = parallel.replicated_sharding(mesh)
    w = jnp.arange(1, gb + 1, dtype=jnp.float32)

    def checksums(t):
        rows = jnp.sum(t["images"], axis=(1, 2, 3))
        return jnp.sum(rows), jnp.sum(rows * w), jnp.sum(t["boxes"])

    c_total, c_weighted, c_boxes = jax.jit(
        checksums, out_shardings=(rep, rep, rep))(batch)
    out["checksum_total"] = float(c_total)
    out["checksum_weighted"] = float(c_weighted)
    out["checksum_boxes"] = float(c_boxes)

    state, metrics = jax.jit(trainer.train_step, donate_argnums=0)(
        state, batch["images"], batch["boxes"], batch["classes"],
        batch["valid"])
    out["loss"] = float(metrics["loss"])
    out["step"] = int(state.step)

    # -- per-process metric files + process-0-gated checkpoint ---------------
    mlog = MetricLogger(os.path.join(a.tmp, "logs"))
    mlog.log(int(state.step), {"loss": out["loss"]})
    mlog.close()
    out["metric_file"] = os.path.basename(mlog.path)
    if parallel.is_main_process():
        ckpt_io.save_state_bytes(
            os.path.join(a.tmp, "state-latest.msgpack"), state)
        with open(os.path.join(a.tmp, "ckpt_writer.txt"), "a") as f:
            f.write(f"{jax.process_index()}\n")

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
