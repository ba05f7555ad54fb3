"""Magnitude pruning (tf2/tfmot.py analog) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.utils import sparsity as sp


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 8, 16)),
                                       jnp.float32),
                 "bias": jnp.asarray(rng.normal(size=(16,)), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.normal(size=(32, 4)),
                                        jnp.float32)},
        "bn": {"bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}},
    }


def test_prune_low_magnitude_hits_target_and_prunes_smallest():
    params = _tree()
    pruned, report = sp.prune_low_magnitude(params, 0.5)
    for name in ("conv", "dense"):
        w0 = np.asarray(params[name]["kernel"])
        w1 = np.asarray(pruned[name]["kernel"])
        frac = (w1 == 0).mean()
        assert abs(frac - 0.5) < 2.0 / w0.size
        # survivors all have larger magnitude than any pruned weight
        pruned_mags = np.abs(w0[w1 == 0])
        kept_mags = np.abs(w0[w1 != 0])
        assert pruned_mags.max() <= kept_mags.min() + 1e-7
        assert abs(report[f"{name}/kernel"] - frac) < 1e-6
    # biases / BN untouched
    np.testing.assert_array_equal(pruned["conv"]["bias"],
                                  params["conv"]["bias"])
    np.testing.assert_array_equal(pruned["bn"]["bn"]["scale"],
                                  params["bn"]["bn"]["scale"])


def test_zero_sparsity_is_identity():
    params = _tree()
    pruned, _ = sp.prune_low_magnitude(params, 0.0)
    jax.tree.map(np.testing.assert_array_equal, pruned, params)


def test_scope_excludes_layers():
    params = _tree()
    pruned, report = sp.prune_low_magnitude(
        params, 0.5, scope=lambda p: not p.startswith("dense"))
    np.testing.assert_array_equal(pruned["dense"]["kernel"],
                                  params["dense"]["kernel"])
    assert "dense/kernel" not in report
    assert (np.asarray(pruned["conv"]["kernel"]) == 0).mean() > 0.4


def test_polynomial_decay_schedule():
    sched = sp.PolynomialDecaySchedule(initial_sparsity=0.2,
                                       final_sparsity=0.8,
                                       begin_step=10, end_step=50, power=3)
    assert float(sched(0)) == 0.0  # before begin: no pruning
    assert abs(float(sched(10)) - 0.2) < 1e-6
    assert abs(float(sched(50)) - 0.8) < 1e-6
    assert abs(float(sched(1000)) - 0.8) < 1e-6
    vals = [float(sched(s)) for s in range(10, 51)]
    assert all(b >= a - 1e-7 for a, b in zip(vals, vals[1:]))  # monotone


def test_magnitude_pruner_jits_and_ramps():
    params = _tree()
    pruner = sp.MagnitudePruner(sp.PolynomialDecaySchedule(
        final_sparsity=0.75, begin_step=0, end_step=10))

    @jax.jit
    def step(p, s):
        return pruner.prune(p, s)

    early = step(params, 0)
    late = step(params, 10)
    f_early = (np.asarray(early["conv"]["kernel"]) == 0).mean()
    f_late = (np.asarray(late["conv"]["kernel"]) == 0).mean()
    assert f_early < 0.05
    assert abs(f_late - 0.75) < 0.02
    rep = sp.sparsity_report(late)
    assert abs(rep["overall"] - 0.75) < 0.02


def test_get_method_registry():
    assert sp.get_method("prune") is sp.prune_low_magnitude
    q = sp.get_method("quantize")
    assert hasattr(q, "__name__")  # the inference.quantize module
    with pytest.raises(KeyError):
        sp.get_method("distill")


def test_set_config_binds_kwargs():
    """tfmot.py:37-43 set_config: pre-bound method kwargs."""
    try:
        sp.set_config({"prune": {"sparsity": 0.75}})
        bound = sp.get_method("prune")
        pruned, _ = bound(_tree())
        rep = sp.sparsity_report(pruned)
        assert abs(rep["overall"] - 0.75) < 0.02
        with pytest.raises(KeyError):
            sp.set_config({"distill": {}})
    finally:
        sp._optimization_methods.clear()
    assert sp.get_method("prune") is sp.prune_low_magnitude


def test_mask_like_follows_reference_zeros():
    params = _tree()
    pruned, _ = sp.prune_low_magnitude(params, 0.5)
    shadow = jax.tree.map(lambda x: x + 1.0, params)  # dense everywhere
    masked = sp.mask_like(pruned, shadow)
    for name in ("conv", "dense"):
        ref = np.asarray(pruned[name]["kernel"])
        out = np.asarray(masked[name]["kernel"])
        np.testing.assert_array_equal(out == 0, ref == 0)
    # non-kernel leaves pass through dense
    np.testing.assert_array_equal(masked["conv"]["bias"],
                                  shadow["conv"]["bias"])


@pytest.mark.slow
def test_supervised_train_prunes_params_and_ema(tmp_path, tiny_cfg):
    """--prune-sparsity integration: train/train.py masks kernels + EMA."""
    from mladversarialobjectdetection_tpu.train import train as train_cli

    over = tiny_cfg.as_dict()
    over.update({"num_epochs": 1})
    state = train_cli.train(
        "efficientdet-lite0", model_dir=str(tmp_path / "out"),
        batch_size=4, steps_per_epoch=3, image_size=64,
        config_override=over, prune_sparsity=0.5, prune_end=2)
    rep = sp.sparsity_report(jax.device_get(state.params))
    rep_ema = sp.sparsity_report(jax.device_get(state.ema_params))
    assert abs(rep["overall"] - 0.5) < 0.02
    assert abs(rep_ema["overall"] - 0.5) < 0.02
