"""Attack training-core tests (PatchAttacker semantics, attacker.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.attack import artifacts
from mladversarialobjectdetection_tpu.attack.attacker import (AttackState,
                                                              PatchAttacker)


@pytest.fixture(scope="module")
def attacker(tiny_detector):
    cfg, spec, net, variables = tiny_detector
    return PatchAttacker(cfg, variables, patch_size=32)


def test_init_state(attacker):
    st = attacker.init_state(jax.random.PRNGKey(0))
    assert st.patch.shape == (32, 32, 3)
    assert float(st.scale) == pytest.approx(0.4)
    assert float(st.patch.min()) >= -1 and float(st.patch.max()) <= 1


def test_train_step_updates_only_patch_and_scale(attacker, rand_images):
    st = attacker.init_state(jax.random.PRNGKey(0))
    p0, s0 = np.asarray(st.patch), float(st.scale)
    step = jax.jit(attacker.train_step)
    st2, metrics = step(st, rand_images)
    assert st2.step == 1
    assert not np.allclose(np.asarray(st2.patch), p0)
    assert float(st2.scale) != s0
    # constraints hold after the update
    assert float(st2.patch.min()) >= -1 and float(st2.patch.max()) <= 1
    assert 0.0 <= float(st2.scale) <= 1.0
    for name, v in metrics._asdict().items():
        assert np.isfinite(float(v)), name


def test_eval_step_no_mutation(attacker, rand_images):
    st = attacker.init_state(jax.random.PRNGKey(0))
    m = jax.jit(attacker.eval_step)(st, rand_images)
    assert np.isfinite(float(m.loss))
    assert 0.0 <= float(m.asr) <= 1.0 + 1e-6


def test_loss_matches_formula(attacker, rand_images):
    """loss = sum(max^2 + (max-scale)^2) + 1e-5*TV (attacker.py:190-193)."""
    st = attacker.init_state(jax.random.PRNGKey(0))
    m = jax.jit(attacker.eval_step)(st, rand_images)
    # with random weights, scores ~ sigmoid(-4.59) = .01; loss dominated by
    # B * scale^2 term
    b = rand_images.shape[0]
    approx = b * float(st.scale) ** 2
    assert abs(float(m.loss) - approx) / max(approx, 1e-6) < 1.0


def test_asr_calc():
    clean = jnp.array([[0.9, 0.6, 0.2]])
    cvalid = jnp.array([[True, True, True]])
    adv = jnp.array([[0.55, 0.1, 0.0]])
    avalid = jnp.array([[True, True, False]])
    asr = PatchAttacker.calc_asr(clean, cvalid, adv, avalid, 0.5)
    # clean >= .5: 2, adv >= .5: 1 -> asr = 1 - 1/2
    assert float(asr) == pytest.approx(0.5, abs=1e-5)


def test_asr_curve(attacker, rand_images):
    st = attacker.init_state(jax.random.PRNGKey(0))
    thresholds = np.arange(0.5, 0.8, 0.1, dtype=np.float32)
    curve = jax.jit(attacker.asr_curve)(st, rand_images, thresholds)
    assert curve.shape == thresholds.shape


def test_artifacts_roundtrip(tmp_path):
    patch = np.random.default_rng(0).uniform(-1, 1, (16, 16, 3)).astype(
        np.float32)
    d = str(tmp_path / "patch_00_1.0")
    artifacts.save_patch_dir(d, patch, 0.37)
    loaded, scale = artifacts.load_patch_dir(d)
    assert np.allclose(loaded, patch)
    assert scale == pytest.approx(0.37)


@pytest.mark.slow  # heavy numerics golden: slow tier (bench-hook audit)
def test_train_step_boxes_override(attacker, rand_images):
    """boxes_override (bench.py's live-slot regime hook) pins the EOT
    placement: with identical PRNG chains, a step with one live overridden
    slot must produce a different patch update than one with no live slots
    (the only difference is the composite + detector-response path)."""
    import functools

    st = attacker.init_state(jax.random.PRNGKey(0))
    k = attacker.max_boxes
    h, w = attacker.image_hw
    boxes = np.zeros((2, k, 4), np.float32)
    boxes[:, 0] = (4.0, 4.0, h - 4.0, w - 4.0)
    live = np.zeros((2, k), bool)
    live[:, 0] = True
    dead = np.zeros((2, k), bool)

    def run(valid):
        step = jax.jit(functools.partial(
            attacker.train_step,
            boxes_override=(jnp.asarray(boxes), jnp.asarray(valid))))
        st2, m = step(st, rand_images)
        for name, v in m._asdict().items():
            if name not in ("asr", "asr_to_scale"):
                assert np.isfinite(float(v)), name
        return np.asarray(st2.patch)

    p_live = run(live)
    p_dead = run(dead)
    assert not np.allclose(p_live, p_dead)


def test_freeze_scale_pins_scale(tiny_detector, rand_images):
    """freeze_scale=True: scale receives zero gradient (stays exactly at
    its init) and the loss drops the (max_score - scale)^2 coupling term
    (frontier-probe objective, examples/northstar_soak.py)."""
    cfg, spec, net, variables = tiny_detector
    atk = PatchAttacker(cfg, variables, patch_size=32, freeze_scale=True)
    st = atk.init_state(jax.random.PRNGKey(0), initial_scale=0.37)
    step = jax.jit(atk.train_step)
    st2, m = step(st, rand_images)
    st3, m3 = step(st2, rand_images)
    assert float(st3.scale) == float(np.float32(0.37))  # bit-exact pin
    assert not np.allclose(np.asarray(st3.patch), np.asarray(st.patch))
    # loss excludes the coupling term: with random weights max_scores are
    # tiny, so loss ~ sum(max^2) + tv << B * scale^2
    b = rand_images.shape[0]
    assert float(m.loss) < 0.5 * b * 0.37 ** 2
    # metric still reports the pinned scale
    assert float(m.scale) == float(np.float32(0.37))
