"""Defender training-core tests (attack_detection.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.defense.defender import \
    PatchAttackDefender


@pytest.fixture(scope="module")
def defender(tiny_detector):
    cfg, spec, net, variables = tiny_detector
    patch = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(
        np.float32)
    return PatchAttackDefender(cfg, variables, eval_patch=patch,
                               eval_scale=0.4, n_filters=4)


@pytest.mark.slow
def test_train_step(defender, rand_images):
    st = defender.init_state(jax.random.PRNGKey(0))
    leaves0 = [np.asarray(x) for x in jax.tree.leaves(st.params)]
    step = jax.jit(defender.train_step)
    st2, metrics = step(st, rand_images)
    assert np.isfinite(float(metrics.loss))
    leaves1 = jax.tree.leaves(st2.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    assert int(st2.step) == 1


@pytest.mark.slow
def test_eval_step(defender, rand_images):
    st = defender.init_state(jax.random.PRNGKey(0))
    m = jax.jit(defender.eval_step)(st, rand_images)
    assert np.isfinite(float(m.loss))


def test_recover_bounds(defender, rand_images):
    st = defender.init_state(jax.random.PRNGKey(0))
    rec = jax.jit(defender.recover)(st, rand_images)
    assert rec.shape == rand_images.shape
    assert float(rec.min()) >= -1.0 and float(rec.max()) <= 1.0


@pytest.mark.slow
def test_detector_frozen(defender, rand_images):
    """Gradients must never reach the protege detector (layers frozen,
    attack_detection.py:46-47): det variables identical after a step."""
    st = defender.init_state(jax.random.PRNGKey(0))
    det0 = jax.tree.map(np.asarray, defender.det_variables)
    st, _ = jax.jit(defender.train_step)(st, rand_images)
    det1 = jax.tree.map(np.asarray, defender.det_variables)
    for a, b in zip(jax.tree.leaves(det0), jax.tree.leaves(det1)):
        assert np.array_equal(a, b)
