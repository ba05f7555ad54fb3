"""Equivalence of the space-to-depth packed defender U-Net.

models/unet_packed.PackedPatchNeutralizer must be the SAME function as
models/unet.PatchNeutralizer (reference generator.py:17-261) — identical
variable pytree, identical fresh init, matching forward in both training
modes, matching batch-stats updates, and matching parameter gradients —
differing only in memory layout (the TPU lane-packing optimization,
BENCH_NOTES.md "Defender training").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.models.unet import PatchNeutralizer
from mladversarialobjectdetection_tpu.models.unet_packed import (
    PackedPatchNeutralizer, depth_to_space, pack_conv3_kernel,
    pack_convT_kernel, packed_conv3, packed_convT, phase_max,
    space_to_depth)

B, H = 2, 64


def _tree_allclose(a, b, atol, rtol=0.0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, x), (_, y) in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   atol=atol, rtol=rtol, err_msg=str(p))


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 10, 3)),
                    jnp.float32)
    y = space_to_depth(x)
    assert y.shape == (2, 4, 5, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)),
                                  np.asarray(x))
    # phase-major layout: channel (p*2+q)*C + c holds pixel (2i+p, 2j+q, c)
    np.testing.assert_array_equal(np.asarray(y[0, 1, 2, 3 * 3 + 1]),
                                  np.asarray(x[0, 3, 5, 1]))


def test_phase_max_is_maxpool():
    import flax.linen as nn
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 5)),
                    jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(phase_max(space_to_depth(x))),
                                  np.asarray(ref))


def test_packed_conv3_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = depth_to_space(packed_conv3(space_to_depth(x), w, b, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # the packed kernel is half zeros (each output phase uses 2 of 3 taps)
    wp = np.asarray(pack_conv3_kernel(w))
    assert wp.shape == (3, 3, 12, 20)
    assert np.count_nonzero(wp) == 9 * 3 * 5 * 4  # every tap routed 4x


def test_packed_convT_exact():
    import flax.linen as nn
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 9, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    mod = nn.ConvTranspose(6, (3, 3), strides=(2, 2), padding="SAME")
    ref = mod.apply({"params": {"kernel": w, "bias": b}}, x)
    got = depth_to_space(packed_convT(x, w, b, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert pack_convT_kernel(w).shape == (2, 2, 4, 24)


@pytest.fixture(scope="module")
def pair():
    """(unpacked variables, x) — shared across the equivalence tests."""
    std = PatchNeutralizer(n_filters=8)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(B, H, H, 3)),
                    jnp.float32)
    v = std.init({"params": jax.random.PRNGKey(0)}, x, False)
    return v, x


def test_identical_pytree_and_fresh_init(pair):
    v, x = pair
    vp = PackedPatchNeutralizer(n_filters=8).init(
        {"params": jax.random.PRNGKey(0)}, x, False)
    # same scope paths -> same param rng streams -> identical fresh init
    _tree_allclose(v, vp, atol=0.0)


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_forward_parity_eval(pair, levels):
    v, x = pair
    ref = PatchNeutralizer(n_filters=8).apply(v, x, False)
    got = PackedPatchNeutralizer(n_filters=8,
                                 packed_levels=levels).apply(v, x, False)
    assert got.dtype == ref.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_forward_and_batchstats_parity_training(pair):
    v, x = pair
    # dropout=0.0 disables the one source of intended divergence (mask
    # arrangement inside deconv3); BN batch stats must then match exactly
    std = PatchNeutralizer(n_filters=8, dropout=0.0)
    pkd = PackedPatchNeutralizer(n_filters=8, dropout=0.0)
    ref, mut_ref = std.apply(v, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    got, mut_got = pkd.apply(v, x, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    _tree_allclose(mut_got["batch_stats"], mut_ref["batch_stats"],
                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("levels", [1, 2, 3])
@pytest.mark.slow  # heavy numerics golden: slow tier (fast tier keeps dropout/phase smoke tests)
def test_grad_parity_exact_f64(pair, levels):
    """In float64 the packed module is the SAME function: forward output
    and every parameter gradient match to double-precision exactness (the
    multiply-add sets are identical; only f32 reduction order can differ,
    which f64 removes from the signal)."""
    v32, _ = pair
    with jax.enable_x64():
        std = PatchNeutralizer(n_filters=8, dropout=0.0)
        pkd = PackedPatchNeutralizer(n_filters=8, dropout=0.0,
                                     packed_levels=levels)
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(B, H, H, 3)),
            jnp.float64)
        v = jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                               jnp.float64), v32)
        ref = std.apply(v, x, True, mutable=["batch_stats"])[0]
        got = pkd.apply(v, x, True, mutable=["batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        g_ref = jax.grad(lambda p: loss(std, p))(v["params"])
        g_got = jax.grad(lambda p: loss(pkd, p))(v["params"])
        _tree_allclose(g_got, g_ref, atol=1e-6)


@pytest.mark.slow  # heavy numerics golden: slow tier (fast tier keeps dropout/phase smoke tests)
def test_grad_parity_f32(pair):
    """f32 gradients agree to reduction-order noise (per-leaf norms; the
    earliest layers see the most amplified noise through 9 BN backwards;
    exactness itself is pinned by test_grad_parity_exact_f64)."""
    v, x = pair
    std = PatchNeutralizer(n_filters=8, dropout=0.0)
    pkd = PackedPatchNeutralizer(n_filters=8, dropout=0.0)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"])
        return jnp.sum(out * out)

    g_ref = jax.grad(lambda p: loss(std, p))(v["params"])
    g_got = jax.grad(lambda p: loss(pkd, p))(v["params"])
    la = jax.tree_util.tree_leaves_with_path(g_ref)
    lb = jax.tree_util.tree_leaves_with_path(g_got)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, a), (_, b) in zip(la, lb):
        ref_n = float(jnp.linalg.norm(a))
        diff_n = float(jnp.linalg.norm(a - b))
        # 1% relative: biases directly followed by BN have true gradient
        # exactly 0 (BN subtracts the mean), both sides are pure noise
        # there — covered by the absolute term
        assert diff_n <= 5e-2 * ref_n + 0.5, (str(p), ref_n, diff_n)


@pytest.mark.slow  # heavy numerics golden: slow tier (fast tier keeps dropout/phase smoke tests)
def test_forward_parity_bf16(pair):
    v, x = pair
    ref = PatchNeutralizer(n_filters=8, dtype=jnp.bfloat16).apply(v, x,
                                                                  False)
    got = PackedPatchNeutralizer(n_filters=8, dtype=jnp.bfloat16).apply(
        v, x, False)
    assert got.dtype == jnp.float32
    # same multiply-add set; bf16 rounding differs only by reduction order
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_dropout_path_runs(pair):
    """training=True with dropout>0 draws masks over packed shapes —
    not bit-matched to the unpacked module by design, but must run and
    stay in tanh range."""
    v, x = pair
    out, _ = PackedPatchNeutralizer(n_filters=8).apply(
        v, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    o = np.asarray(out)
    assert np.isfinite(o).all() and (np.abs(o) <= 1.0).all()


@pytest.mark.slow  # heavy numerics golden: slow tier (fast tier keeps dropout/phase smoke tests)
def test_defender_packed_state_interop(pair):
    """PatchAttackDefender(packed=True) trains on a state initialized by
    the unpacked defender (checkpoint interop both ways)."""
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender)
    from tests.conftest import tiny_config

    cfg = tiny_config(64)
    det_vars = None
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    net = EfficientDetNet(spec_from_config(cfg))
    det_vars = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), False)
    d_std = PatchAttackDefender(cfg, det_vars)
    d_pkd = PatchAttackDefender(cfg, det_vars, packed=True)
    state = d_std.init_state(jax.random.PRNGKey(1))
    imgs = jnp.asarray(np.random.default_rng(9).normal(size=(2, 64, 64, 3))
                       .clip(-1, 1), jnp.float32)
    s2, m2 = jax.jit(d_pkd.train_step)(state, imgs)
    assert np.isfinite(float(m2.loss))
    # and the packed-trained state loads straight back into the unpacked one
    s3, m3 = jax.jit(d_std.train_step)(s2, imgs)
    assert np.isfinite(float(m3.loss))
