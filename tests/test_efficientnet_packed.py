"""Packed-entry backbone equivalence (models/efficientnet_packed.py).

The packed module must be pytree-identical to models/efficientnet.
EfficientNet and numerically equivalent (same multiply-adds in a
different layout) for every formulation it rewrites: packed-output stem,
s1 depthwise (k3 + k5) via channel-major grouped conv, s2 depthwise
packed->unpacked transition, per-phase 1x1s, phase-grouped BN, packed SE,
residual adds, and segment re-packing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.models.efficientnet import (
    BackboneSpec, BlockArgs, EfficientNet)
from mladversarialobjectdetection_tpu.models.efficientnet_packed import (
    PackedEntryEfficientNet, cm_to_pm, pack_dw_kernel_s1, pack_dw_kernel_s2,
    pm_to_cm)


def tiny_spec(use_se=True, act="relu6"):
    blocks = (
        BlockArgs(3, 1, 8, 8, 1, True, 0.25 if use_se else None, (1, 1)),
        BlockArgs(3, 1, 8, 12, 6, True, 0.25 if use_se else None, (2, 2)),
        BlockArgs(5, 1, 12, 12, 6, True, 0.25 if use_se else None, (1, 1)),
        BlockArgs(5, 1, 12, 16, 6, True, 0.25 if use_se else None, (2, 2)),
        BlockArgs(3, 1, 16, 16, 6, True, 0.25 if use_se else None, (1, 1)),
        BlockArgs(3, 1, 16, 24, 6, True, 0.25 if use_se else None, (2, 2)),
        BlockArgs(3, 1, 24, 24, 6, True, 0.25 if use_se else None, (1, 1)),
        BlockArgs(3, 1, 24, 32, 6, True, 0.25 if use_se else None, (2, 2)),
    )
    return BackboneSpec(blocks, stem_filters=8, act_type=act, use_se=use_se,
                        bn_momentum=0.99, bn_epsilon=1e-3,
                        survival_prob=None)


@pytest.fixture(scope="module")
def pair():
    spec = tiny_spec()
    net = EfficientNet(spec)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)),
                    jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(7)}, x,
                         training=False)
    return spec, net, variables, x


def test_pytree_parity(pair):
    spec, net, variables, x = pair
    packed = PackedEntryEfficientNet(spec, packed_blocks=4)
    pv = packed.init({"params": jax.random.PRNGKey(7)}, x, training=False)
    flat_u = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(pv)[0]
    paths_u = {jax.tree_util.keystr(p): l.shape for p, l in flat_u}
    paths_p = {jax.tree_util.keystr(p): l.shape for p, l in flat_p}
    assert paths_u == paths_p
    # same scope paths + same init fns => identical fresh-init values
    for (pu, lu), (pp, lp) in zip(flat_u, flat_p):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(lp), atol=0)


@pytest.mark.parametrize("n_packed", [1, 2, 4, 8])
def test_forward_equivalence_eval(pair, n_packed):
    """Packed forward == unpacked forward on the SAME params, eval mode.

    n_packed=2 exits at the first s2 transition; 4 re-packs a second
    segment (k5 depthwise); 8 runs every block packed."""
    spec, net, variables, x = pair
    ref = net.apply(variables, x, False)
    packed = PackedEntryEfficientNet(spec, packed_blocks=n_packed)
    got = packed.apply(variables, x, False)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-5)


@pytest.mark.slow  # heavy equivalence golden; fast tier keeps pytree/forward/dw smoke
def test_forward_and_stats_equivalence_train(pair):
    """Training mode: outputs AND updated BN batch_stats match."""
    spec, net, variables, x = pair
    ref, ref_mut = net.apply(variables, x, True, mutable=["batch_stats"])
    packed = PackedEntryEfficientNet(spec, packed_blocks=4)
    got, got_mut = packed.apply(variables, x, True, mutable=["batch_stats"])
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-5)
    ru = jax.tree_util.tree_flatten_with_path(ref_mut)[0]
    gu = jax.tree_util.tree_flatten_with_path(got_mut)[0]
    for (pr, lr), (pg, lg) in zip(ru, gu):
        assert jax.tree_util.keystr(pr) == jax.tree_util.keystr(pg)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lr),
                                   atol=2e-5, err_msg=str(pr))


@pytest.mark.slow  # heavy equivalence golden; fast tier keeps pytree/forward/dw smoke
def test_input_gradient_equivalence(pair):
    spec, net, variables, x = pair
    packed = PackedEntryEfficientNet(spec, packed_blocks=4)

    def loss_u(xx):
        return sum(jnp.sum(e ** 2) for e in net.apply(variables, xx, False))

    def loss_p(xx):
        return sum(jnp.sum(e ** 2)
                   for e in packed.apply(variables, xx, False))

    gu = jax.grad(loss_u)(x)
    gp = jax.grad(loss_p)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gu), atol=5e-4)


def test_packed_dw_kernels_standalone():
    """The two depthwise rewrites against lax reference convs."""
    from jax import lax
    rng = np.random.default_rng(1)
    c = 6
    x = jnp.asarray(rng.standard_normal((2, 12, 12, c)), jnp.float32)

    def conv(x, k, s, pad, fgc=1):
        return lax.conv_general_dilated(
            x, k, s, pad, feature_group_count=fgc,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    from mladversarialobjectdetection_tpu.models.unet_packed import (
        depth_to_space, space_to_depth)
    for k in (3, 5):
        kdw = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.float32)
        ref = conv(x, kdw, (1, 1), "SAME", fgc=c)
        kp = pack_dw_kernel_s1(kdw)
        pad = (kp.shape[0] - 1) // 2
        got = cm_to_pm(conv(pm_to_cm(space_to_depth(x)), kp, (1, 1),
                            ((pad, pad), (pad, pad)), fgc=c))
        np.testing.assert_allclose(np.asarray(depth_to_space(got)),
                                   np.asarray(ref), atol=1e-5)
        # stride-2: packed -> unpacked half-res
        ref2 = conv(x, kdw, (2, 2), "SAME", fgc=c)
        kp2, pl, ph = pack_dw_kernel_s2(kdw)
        got2 = conv(pm_to_cm(space_to_depth(x)), kp2, (1, 1),
                    ((pl, ph), (pl, ph)), fgc=c)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=1e-5)


@pytest.mark.slow  # heavy equivalence golden; fast tier keeps pytree/forward/dw smoke
def test_detector_packed_entry_serve_parity(tiny_detector):
    """EfficientDetNet(packed_entry=2) reproduces the unpacked detector's
    raw head outputs on the same variables."""
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet)
    cfg, spec, net, variables = tiny_detector
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1,
                                                     (2, *spec.image_size, 3)),
                    jnp.float32)
    cls_u, box_u = net.apply(variables, x, False)
    pnet = EfficientDetNet(spec, packed_entry=2)
    cls_p, box_p = pnet.apply(variables, x, False)
    for cu, cp in zip(cls_u, cls_p):
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cu),
                                   atol=2e-4)
    for bu, bp in zip(box_u, box_p):
        np.testing.assert_allclose(np.asarray(bp), np.asarray(bu),
                                   atol=2e-4)


@pytest.mark.slow  # heavy equivalence golden; fast tier keeps pytree/forward/dw smoke
def test_attacker_packed_victim_equivalence(tiny_detector, rand_images):
    """PatchAttacker(packed_entry=2): same loss and same patch gradient as
    the unpacked victim on identical state/variables/key."""
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    cfg, spec, net, variables = tiny_detector
    a_u = PatchAttacker(cfg, variables, patch_size=32)
    a_p = PatchAttacker(cfg, variables, patch_size=32, packed_entry=2)
    st = a_u.init_state(jax.random.PRNGKey(0))
    stu, mu = jax.jit(a_u.train_step)(st, rand_images)
    stp, mp = jax.jit(a_p.train_step)(st, rand_images)
    assert abs(float(mu.loss) - float(mp.loss)) < 1e-3 * max(
        1.0, abs(float(mu.loss)))
    np.testing.assert_allclose(np.asarray(stp.patch), np.asarray(stu.patch),
                               atol=5e-3)
    assert abs(float(stp.scale) - float(stu.scale)) < 1e-4
