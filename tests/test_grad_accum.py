"""Gradient-accumulation parity for the supervised and defender trainers.

Two exact invariants, each matched to the trainer's loss convention:

- supervised: accumulation = ONE update with the MEAN of microbatch
  gradients at fixed params, so with plain SGD the accumulated step is
  exactly the average of the two single-microbatch steps (linearity).
- defender: the loss is a SUM over images with no normalizer, so on a
  DUPLICATED batch [x; x] (where per-microbatch BN statistics equal the
  full-batch statistics) the accumulated step equals the plain
  full-batch step to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mladversarialobjectdetection_tpu.defense import masker as masker_lib
from mladversarialobjectdetection_tpu.defense.defender import \
    PatchAttackDefender
from mladversarialobjectdetection_tpu.models.unet import PatchNeutralizer
from mladversarialobjectdetection_tpu.train.trainer import DetectorTrainer


def _tree_close(a, b, atol=1e-5):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=atol, rtol=1e-4)


def _tree_changed(before, after):
    return any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(before),
                               jax.tree.leaves(after)))


def _dup_batch(key, cfg, micro_b=1):
    hw = (cfg.image_size, cfg.image_size)
    x = jax.random.uniform(key, (micro_b, *hw, 3), minval=-1.0, maxval=1.0)
    return jnp.concatenate([x, x], axis=0)


@pytest.mark.slow
def test_supervised_accum_is_mean_of_micro_grads(tiny_cfg):
    """Accumulation semantics: ONE update with the MEAN of the microbatch
    gradients, every microbatch differentiated at the step's initial
    params. With plain SGD (update linear in the gradient) that makes
    the accumulated step exactly the average of the two single-microbatch
    steps: p_acc = p0 - lr*(g1+g2)/2 = (p1 + p2)/2.

    (A duplicated-batch equality against the FULL-batch step does NOT
    hold here by design: the detection loss normalizer is
    sum(num_positives) + 1.0 — the reference's own convention,
    train_lib.py BoxLoss/FocalLoss — so microbatch losses are normalized
    by n+1 while the full batch uses 2n+1.)"""
    hw = (tiny_cfg.image_size, tiny_cfg.image_size)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, *hw, 3),
                           minval=-1.0, maxval=1.0)
    x1, x2 = x[:1], x[1:]
    mk_labels = lambda b: (
        jnp.tile(jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), (b, 2, 1)),
        jnp.zeros((b, 2), jnp.int32), jnp.ones((b, 2), bool))

    def run(k, images):
        tr = DetectorTrainer(tiny_cfg, steps_per_epoch=10, grad_accum=k)
        # plain SGD so the parameter delta is LINEAR in the gradient —
        # adam's first step is ±lr*sign(g), which amplifies float-level
        # gradient noise at near-zero entries into full-lr sign flips
        tr.tx = optax.sgd(0.05)
        st = tr.init_state(jax.random.PRNGKey(0))
        st2, metrics = jax.jit(tr.train_step)(
            st, images, *mk_labels(images.shape[0]))
        return st, st2, metrics

    st0, st_m1, m1 = run(1, x1)
    _, st_m2, m2 = run(1, x2)
    _, st_acc, m_acc = run(2, jnp.concatenate([x1, x2], axis=0))

    assert _tree_changed(st0.params, st_m1.params)
    expected = jax.tree.map(lambda a, b: 0.5 * (a + b),
                            st_m1.params, st_m2.params)
    _tree_close(expected, st_acc.params)
    np.testing.assert_allclose(
        float(m_acc["loss"]),
        0.5 * (float(m1["loss"]) + float(m2["loss"])), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_acc["cls_loss"]),
        0.5 * (float(m1["cls_loss"]) + float(m2["cls_loss"])), rtol=1e-5)
    assert int(st_acc.step) == 1


@pytest.mark.slow
def test_attack_accum_matches_full_batch(tiny_detector):
    """Attack grad-accum: on a DUPLICATED batch with all EOT randomness
    pinned (zero noise/brightness/rotation/placement jitter, mean print
    transform) the loss is a pure sum over images plus the TV term — the
    accumulated step (TV weighted 1/k per microbatch so it enters the sum
    once) must equal the plain full-batch step exactly. Placement targets
    go in via boxes_override (fixed boxes) so a random-init victim's NMS
    tie-breaking can't discretely move the patches between the two step
    forms; the clean pass still executes in both."""
    import optax
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker

    cfg, spec, net, det_vars = tiny_detector
    images = _dup_batch(jax.random.PRNGKey(11), cfg)
    hw = cfg.image_size
    one = jnp.asarray([[[6.0, 6.0, 34.0, 30.0], [24.0, 28.0, 56.0, 60.0]]])
    boxes = jnp.tile(one, (2, 1, 1))                       # [2, 2, 4]
    valid = jnp.ones((2, 2), bool)
    pinned = dict(noise_mag=0.0, brightness_mag=0.0, rotation_mag=0.0,
                  print_jitter=False)

    results = []
    for k in (1, 2):
        a = PatchAttacker(cfg, det_vars, patch_size=32, tolerance=0.0,
                          eot_overrides=pinned, grad_accum=k)
        a.tx = optax.sgd(0.05)  # linear in the gradient (see above)
        st = a.init_state(jax.random.PRNGKey(1))
        st2, m = jax.jit(a.train_step,
                         static_argnames=("with_asr",))(
            st, images, with_asr=True, boxes_override=(boxes, valid))
        results.append((st, st2, m))

    (st0, st_full, m_full), (_, st_acc, m_acc) = results
    assert _tree_changed(st0.patch, st_full.patch)
    _tree_close(st_full.patch, st_acc.patch)
    np.testing.assert_allclose(float(st_full.scale), float(st_acc.scale),
                               atol=1e-6)
    np.testing.assert_allclose(float(m_full.loss), float(m_acc.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_full.scale_loss),
                               float(m_acc.scale_loss), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(m_full.tv_loss), float(m_acc.tv_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_full.mean_max_score),
                               float(m_acc.mean_max_score), rtol=1e-4)
    np.testing.assert_allclose(float(m_full.std_max_score),
                               float(m_acc.std_max_score),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(m_full.asr), float(m_acc.asr),
                               atol=1e-6)
    assert int(st_acc.step) == 1


@pytest.mark.slow
def test_attack_accum_without_override_runs(tiny_detector, rand_images):
    """The accum path's own first-pass box flow (no override): one jitted
    step advances state and returns finite metrics."""
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    cfg, spec, net, det_vars = tiny_detector
    a = PatchAttacker(cfg, det_vars, patch_size=32, grad_accum=2)
    st = a.init_state(jax.random.PRNGKey(2))
    st2, m = jax.jit(a.train_step, static_argnames=("with_asr",))(
        st, jnp.concatenate([rand_images] * 2, axis=0), with_asr=False)
    assert int(st2.step) == 1
    assert np.isfinite(float(m.loss))
    assert np.isnan(float(m.asr))


@pytest.mark.slow
def test_defender_accum_matches_full_batch(tiny_detector, monkeypatch):
    cfg, spec, net, det_vars = tiny_detector
    images = _dup_batch(jax.random.PRNGKey(5), cfg)

    # key-independent masker + dropout-free U-Net so the duplicated-batch
    # invariant is exact (the production path folds a fresh Masker key per
    # microbatch; randomness equality across the two step forms is not a
    # requirement of accumulation, determinism of the gradient math is)
    def fake_masker(key, imgs, boxes, boxes_valid, *, training,
                    **kwargs):
        return imgs * 0.8, imgs * 0.3

    monkeypatch.setattr(masker_lib, "apply_masker", fake_masker)

    results = []
    for k in (1, 2):
        d = PatchAttackDefender(cfg, det_vars, learning_rate=1e-3,
                                n_filters=4, grad_accum=k)
        d.unet = PatchNeutralizer(n_filters=4, dropout=0.0)
        d.tx = optax.sgd(0.05)  # linear in the gradient (see above)
        st = d.init_state(jax.random.PRNGKey(1))
        st2, metrics = jax.jit(
            d.train_step, static_argnames=("with_adv_scores",))(
                st, images, with_adv_scores=True)
        results.append((st, st2, metrics))

    (st0, st_full, m_full), (_, st_acc, m_acc) = results
    assert _tree_changed(st0.params, st_full.params)
    _tree_close(st_full.params, st_acc.params)
    # (batch_stats are NOT compared: the accumulated step advances the BN
    # running averages once per microbatch — k momentum applications vs
    # one — which is the documented ghost-batch semantics, not a bug)
    np.testing.assert_allclose(float(m_full.loss), float(m_acc.loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_full.mean_clean_score),
                               float(m_acc.mean_clean_score), rtol=1e-4)
    np.testing.assert_allclose(float(m_full.mean_adv_score),
                               float(m_acc.mean_adv_score), rtol=1e-4)


@pytest.mark.slow  # 42s of trace for an error-path check; slow tier
def test_accum_batch_divisibility_errors(tiny_cfg, tiny_detector):
    cfg, _, _, det_vars = tiny_detector
    hw = (tiny_cfg.image_size, tiny_cfg.image_size)
    images = jnp.zeros((3, *hw, 3))
    tr = DetectorTrainer(tiny_cfg, grad_accum=2)
    st = tr.init_state(jax.random.PRNGKey(0))
    boxes = jnp.zeros((3, 1, 4))
    with pytest.raises(ValueError, match="divisible"):
        tr.train_step(st, images, boxes, jnp.zeros((3, 1), jnp.int32),
                      jnp.ones((3, 1), bool))
    d = PatchAttackDefender(cfg, det_vars, n_filters=4, grad_accum=2)
    dst = d.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible"):
        d.train_step(dst, images)
    with pytest.raises(ValueError, match="grad_accum"):
        DetectorTrainer(tiny_cfg, grad_accum=0)
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    a = PatchAttacker(cfg, det_vars, patch_size=32, grad_accum=2)
    ast = a.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible"):
        a.train_step(ast, images)
    with pytest.raises(ValueError, match="grad_accum"):
        PatchAttacker(cfg, det_vars, grad_accum=0)
