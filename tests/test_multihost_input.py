"""Multi-host input-pipeline pieces, validated single-process.

On a real multi-host deployment every process loads a disjoint
1/process_count slice of the data and `shard_batch_local` assembles the
slices into globally-sharded arrays via
`jax.make_array_from_process_local_data`. With one process (this test
env) that API must produce EXACTLY what `shard_batch` produces — same
values, same shardings — which is what pins the code path; the
per-process slicing helpers (reader shards, source shards,
local_batch_size) are pure host logic tested directly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu import parallel
from mladversarialobjectdetection_tpu.data import pipeline, tfrecord


def _batch(hw=16):
    rng = np.random.default_rng(0)
    return {
        "images": rng.normal(size=(8, hw, hw, 3)).astype(np.float32),
        "boxes": rng.normal(size=(8, 4, 4)).astype(np.float32),
        "valid": np.ones((8, 4), bool),
    }


def _assert_same_shards(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert la.sharding == lb.sharding, (la.sharding, lb.sharding)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_shard_batch_local_matches_shard_batch_flat_mesh():
    mesh = parallel.make_mesh()
    batch = _batch()
    _assert_same_shards(parallel.shard_batch(mesh, batch),
                        parallel.shard_batch_local(mesh, batch))


def test_shard_batch_local_matches_on_serve_mesh():
    # ('data','spatial') mesh: the image leaf row-shards over 'spatial';
    # the label leaves stay batch-sharded — both entry points must agree
    mesh = parallel.make_serve_mesh(4, 2)
    batch = _batch()
    _assert_same_shards(parallel.shard_batch(mesh, batch),
                        parallel.shard_batch_local(mesh, batch))


def test_shard_batch_auto_single_process():
    mesh = parallel.make_mesh()
    batch = _batch()
    _assert_same_shards(parallel.shard_batch(mesh, batch),
                        parallel.shard_batch_auto(mesh, batch))


def test_local_batch_size_single_process():
    assert parallel.local_batch_size(24) == 24


def test_image_folder_source_shard_disjoint(tmp_path):
    files = [f"img_{i}.jpg" for i in range(7)]
    mk = lambda: pipeline.ImageFolderSource(
        str(tmp_path), 64, 127.0, 128.0, file_list=files, shuffle=False)
    s0 = mk().shard(0, 2)
    s1 = mk().shard(1, 2)
    assert set(s0.files) | set(s1.files) == set(files)
    assert not set(s0.files) & set(s1.files)
    assert len(s0) == 4 and len(s1) == 3
    with pytest.raises(ValueError, match="bad shard"):
        mk().shard(2, 2)


def test_tfrecord_reader_file_level_shard(tmp_path):
    # 3 files with 1/2/3 examples: shard 0 of 2 gets files 0+2 (4 ex),
    # shard 1 gets file 1 (2 ex) — disjoint and complete
    for i, n in enumerate((1, 2, 3)):
        tfrecord.write_fake_tfrecord(str(tmp_path / f"f{i}.tfrecord"), n=n)
    mk = lambda shard: tfrecord.DetectionTFRecordReader(
        str(tmp_path / "*.tfrecord"), image_size=64, mean_rgb=127.0,
        stddev_rgb=128.0, max_instances=4, shuffle=False, shard=shard)
    n_all = sum(1 for _ in mk(None)._examples())
    n0 = sum(1 for _ in mk((0, 2))._examples())
    n1 = sum(1 for _ in mk((1, 2))._examples())
    assert (n_all, n0, n1) == (6, 4, 2)


def test_tfrecord_reader_example_level_shard(tmp_path):
    # fewer files than shards -> every count-th EXAMPLE (still disjoint)
    tfrecord.write_fake_tfrecord(str(tmp_path / "one.tfrecord"), n=5)
    mk = lambda shard: tfrecord.DetectionTFRecordReader(
        str(tmp_path / "*.tfrecord"), image_size=64, mean_rgb=127.0,
        stddev_rgb=128.0, max_instances=4, shuffle=False, shard=shard)
    n0 = sum(1 for _ in mk((0, 2))._examples())
    n1 = sum(1 for _ in mk((1, 2))._examples())
    assert (n0, n1) == (3, 2)
    with pytest.raises(ValueError, match="bad shard"):
        mk((3, 2))
