"""Checkpoint/resume tests (SURVEY §5 checkpoint-resume subsystem)."""
import os

import jax
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io
from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer


@pytest.mark.slow
def test_full_state_roundtrip(tmp_path, tiny_cfg):
    """Full TrainState (params + BN stats + optimizer + EMA + step)
    roundtrips through the msgpack state checkpoint."""
    t = DetectorTrainer(tiny_cfg, steps_per_epoch=10)
    state = t.init_state(jax.random.PRNGKey(0))
    # advance one step so the optimizer state is non-trivial
    import jax.numpy as jnp
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                                minval=-1, maxval=1)
    gt_boxes = jnp.array([[[8, 8, 40, 40]], [[10, 10, 30, 30]]], jnp.float32)
    state, _ = jax.jit(t.train_step)(state, images, gt_boxes,
                                     jnp.zeros((2, 1), jnp.int32),
                                     jnp.ones((2, 1), bool))
    path = str(tmp_path / "state-latest.msgpack")
    ckpt_io.save_state_bytes(path, state)

    template = t.init_state(jax.random.PRNGKey(7))
    restored = ckpt_io.load_state_bytes(path, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b)), "state mismatch"
    # restored state continues training
    st2, m = jax.jit(t.train_step)(restored, images, gt_boxes,
                                   jnp.zeros((2, 1), jnp.int32),
                                   jnp.ones((2, 1), bool))
    assert int(st2.step) == 2 and np.isfinite(float(m["loss"]))


def test_pytree_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4)}}
    path = str(tmp_path / "tree")
    ckpt_io.save_pytree(path, tree)
    out = ckpt_io.load_pytree(path)
    assert np.allclose(out["a"], tree["a"])
    assert np.allclose(out["b"]["c"], tree["b"]["c"])


@pytest.mark.slow
def test_attack_driver_kill_and_resume(tmp_path):
    """Kill-and-resume == uninterrupted, step for step (the asymmetry
    VERDICT r3 called out: attack artifacts were patch+scale only, so
    resuming silently reset adam moments and plateau-LR state). A 3-epoch
    uninterrupted run must be reproduced exactly by 1 epoch + --resume for
    2 more: full state (adam moments, PRNG chain, aug key) and the data
    streams (fast-forwarded deterministically) all line up."""
    from mladversarialobjectdetection_tpu.attack import train as attack_train
    TINY = {"fpn_num_filters": 16, "fpn_cell_repeats": 1,
            "box_class_repeats": 1,
            "nms_configs": {"pre_nms_topk": 64, "max_output_size": 16},
            "max_boxes_per_image": 4}
    kw = dict(synthetic=True, image_size=64, batch_size=2,
              steps_per_epoch=2, config_override=TINY, patch_size=32,
              visualize_freq=3)  # exercise the viz val-batch accounting

    ref = attack_train.train("efficientdet-lite0", epochs=3,
                             save_dir=str(tmp_path / "ref"), **kw)

    rdir = str(tmp_path / "resumed")
    attack_train.train("efficientdet-lite0", epochs=1, save_dir=rdir, **kw)
    assert os.path.exists(os.path.join(rdir, "state-latest.msgpack"))
    res = attack_train.train("efficientdet-lite0", epochs=3, save_dir=rdir,
                             resume=True, **kw)

    np.testing.assert_array_equal(np.asarray(ref.patch),
                                  np.asarray(res.patch))
    np.testing.assert_array_equal(np.asarray(ref.scale),
                                  np.asarray(res.scale))
    np.testing.assert_array_equal(np.asarray(ref.key), np.asarray(res.key))
    assert int(ref.step) == int(res.step)
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(res.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_defense_driver_kill_and_resume(tmp_path):
    """Same trajectory-exact kill-and-resume guarantee for the defender."""
    from mladversarialobjectdetection_tpu.defense import train as defense_train
    TINY = {"fpn_num_filters": 16, "fpn_cell_repeats": 1,
            "box_class_repeats": 1,
            "nms_configs": {"pre_nms_topk": 64, "max_output_size": 16},
            "max_boxes_per_image": 4}
    kw = dict(synthetic=True, image_size=64, batch_size=2,
              steps_per_epoch=2, config_override=TINY)

    ref = defense_train.train("efficientdet-lite0", epochs=2,
                              save_dir=str(tmp_path / "ref"), **kw)

    rdir = str(tmp_path / "resumed")
    defense_train.train("efficientdet-lite0", epochs=1, save_dir=rdir, **kw)
    res = defense_train.train("efficientdet-lite0", epochs=2, save_dir=rdir,
                              resume=True, **kw)

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(res.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ref.step) == int(res.step)


def test_folder_source_skip_batches_no_io(tmp_path):
    """ImageFolderSource.repeat_batches(skip_batches=n) reproduces the
    stream position of n consumed batches WITHOUT reading the skipped
    images from disk."""
    from mladversarialobjectdetection_tpu.data.pipeline import (
        ImageFolderSource)
    from PIL import Image
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(str(d / f"{i:02d}.png"))

    reads = []

    class CountingSource(ImageFolderSource):
        def __getitem__(self, idx):
            reads.append(idx)
            return super().__getitem__(idx)

    # reference: consume 5 batches (batch 2 => ceil(5/2)=3 per epoch,
    # so 5 = 1 full epoch + 2), then take the next two
    it_ref = ImageFolderSource(str(d), 8, 127.0, 128.0,
                               seed=3).repeat_batches(2)
    for _ in range(5):
        next(it_ref)
    want = [next(it_ref), next(it_ref)]

    src = CountingSource(str(d), 8, 127.0, 128.0, seed=3)
    it = src.repeat_batches(2, skip_batches=5)
    got = [next(it), next(it)]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    # only the yielded batches' images were read (2 batches x 2 images)
    assert len(reads) == 4
