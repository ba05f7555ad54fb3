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
