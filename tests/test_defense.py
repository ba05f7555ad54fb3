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


@pytest.mark.slow  # heavy numerics golden: slow tier (bound sweep)
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


@pytest.mark.slow
def test_eval_psnr_adr_metrics(tiny_detector, rand_images):
    """The north-star defense metrics (recovery PSNR over the patched
    region, attack-detection rate per the demo's >10-point recovery rule)
    are computed in eval and well-formed when the victim actually detects
    persons (class-head biased so every anchor is a confident person)."""
    cfg, spec, net, variables = tiny_detector
    variables = jax.tree.map(np.asarray, variables)  # deep host copy
    pred = variables["params"]["class_net"]["predict"]
    leaf = pred["pw"] if "pw" in pred else pred
    bias = np.full(leaf["bias"].shape, -10.0, np.float32)
    bias[0::cfg.num_classes] = 3.0
    leaf["bias"] = bias
    patch = np.random.default_rng(0).uniform(-1, 1, (32, 32, 3)).astype(
        np.float32)
    d = PatchAttackDefender(cfg, jax.tree.map(jnp.asarray, variables),
                            eval_patch=patch, eval_scale=0.4, n_filters=4)
    st = d.init_state(jax.random.PRNGKey(0))
    m = jax.jit(d.eval_step)(st, rand_images)
    psnr, adr = float(m.recovery_psnr), float(m.adr)
    assert np.isfinite(psnr) and 0.0 < psnr < 80.0
    assert np.isfinite(adr) and 0.0 <= adr <= 1.0


@pytest.mark.slow
def test_eval_psnr_adr_nan_without_region(tiny_detector, rand_images):
    """No-region contract: a zero-scale eval patch plants nothing (every
    slot is culled by the min-area filter), so recovery_psnr and adr must
    be NaN — the driver's np.nanmean aggregation then skips such val
    batches instead of polluting the epoch metric with zeros."""
    cfg, spec, net, variables = tiny_detector
    variables = jax.tree.map(np.asarray, variables)
    pred = variables["params"]["class_net"]["predict"]
    leaf = pred["pw"] if "pw" in pred else pred
    bias = np.full(leaf["bias"].shape, -10.0, np.float32)
    bias[0::cfg.num_classes] = 3.0
    leaf["bias"] = bias
    d = PatchAttackDefender(cfg, jax.tree.map(jnp.asarray, variables),
                            eval_patch=np.zeros((32, 32, 3), np.float32),
                            eval_scale=0.0, n_filters=4)
    st = d.init_state(jax.random.PRNGKey(0))
    m = jax.jit(d.eval_step)(st, rand_images)
    # zero-scale patch -> no region planted -> metrics are NaN by contract
    assert np.isnan(float(m.recovery_psnr)) and np.isnan(float(m.adr))
