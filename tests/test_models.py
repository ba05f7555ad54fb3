"""Model architecture tests: param-count parity with the reference
(automl README table) and forward shape checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mladversarialobjectdetection_tpu as mad
from mladversarialobjectdetection_tpu.models import (bifpn, efficientdet,
                                                     efficientnet, unet)


def _count_params(model_name):
    cfg = mad.get_efficientdet_config(model_name)
    spec = efficientdet.spec_from_config(cfg)
    net = efficientdet.EfficientDetNet(spec)
    x = jnp.zeros((1, *spec.image_size, 3))
    shapes = jax.eval_shape(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, x, False))
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))


def _check_param_count(name, expected_m):
    n = _count_params(name)
    tol = max(0.15, 0.01 * expected_m)  # README rounds to 0.1M
    assert abs(n / 1e6 - expected_m) < tol, f"{name}: {n/1e6:.2f}M"


@pytest.mark.parametrize("name,expected_m", [
    ("efficientdet-lite4", 15.1),
    ("efficientdet-lite0", 3.2),
    ("efficientdet-d0", 3.9),
    ("efficientdet-d1", 6.6),
])
def test_param_count_parity(name, expected_m):
    _check_param_count(name, expected_m)


@pytest.mark.slow
@pytest.mark.parametrize("name,expected_m", [
    # remainder of the published table, automl README.md:67-75,116-121
    # (eval_shape — no weights materialized; still ~3 s of tracing each)
    ("efficientdet-lite1", 4.2),
    ("efficientdet-lite2", 5.3),
    ("efficientdet-lite3", 8.4),
    ("efficientdet-lite3x", 9.3),
    ("efficientdet-d2", 8.1),
    ("efficientdet-d3", 12.0),
    ("efficientdet-d4", 20.7),
    ("efficientdet-d5", 33.7),
    ("efficientdet-d6", 51.9),
    ("efficientdet-d7", 51.9),
    ("efficientdet-d7x", 77.0),
])
def test_param_count_parity_full_table(name, expected_m):
    _check_param_count(name, expected_m)


def test_backbone_spec_lite4():
    spec = efficientnet.get_backbone_spec("efficientnet-lite4")
    assert spec.stem_filters == 32          # fix_head_stem: unscaled
    assert spec.act_type == "relu6"
    assert not spec.use_se
    # depth 1.8: first/last groups unscaled (fix_head_stem), middle ceil-scaled
    # repeats [1, 4, 4, 6, 6, 8, 1] -> 30 blocks
    assert len(spec.blocks) == 30
    # width 1.4 rounding: 16->24, 24->32, 40->56, 80->112, 112->160,
    # 192->272, 320->448
    out_filters = sorted({ba.output_filters for ba in spec.blocks})
    assert out_filters == [24, 32, 56, 112, 160, 272, 448]
    # b-variant: SE on, swish, scaled stem
    b4 = efficientnet.get_backbone_spec("efficientnet-b4")
    assert b4.use_se and b4.stem_filters == 48


def test_block_decoder():
    ba = efficientnet.decode_block_string("r2_k5_s22_e6_i24_o40_se0.25")
    assert ba == efficientnet.BlockArgs(5, 2, 24, 40, 6, True, 0.25, (2, 2))
    ba = efficientnet.decode_block_string("r1_k3_s11_e1_i32_o16_noskip")
    assert not ba.id_skip and ba.se_ratio is None


def test_round_filters():
    assert efficientnet.round_filters(32, 1.4) == 48
    assert efficientnet.round_filters(32, 1.0) == 32
    assert efficientnet.round_filters(32, 1.4, skip=True) == 32


def test_bifpn_topology():
    nodes = bifpn.bifpn_topology(3, 7)
    assert len(nodes) == 8
    # docstring example from fpn_configs.py:29-46
    assert nodes[0] == bifpn.FpnNode(6, (3, 4))
    assert nodes[3] == bifpn.FpnNode(3, (0, 7))
    assert nodes[4] == bifpn.FpnNode(4, (1, 7, 8))
    assert nodes[7] == bifpn.FpnNode(7, (4, 11))
    qu = bifpn.qufpn_topology(3, 7)
    assert len(qu) == 21


def test_forward_shapes(tiny_detector, rand_images):
    cfg, spec, net, variables = tiny_detector
    cls_out, box_out = jax.jit(lambda v, x: net.apply(v, x, False))(
        variables, rand_images)
    na = spec.num_anchors
    assert len(cls_out) == 5
    for lvl, c in enumerate(cls_out):
        h = spec.level_hw[spec.min_level + lvl][0]
        assert c.shape == (2, h, h, cfg.num_classes * na)
    assert box_out[0].shape[-1] == 4 * na


@pytest.mark.slow
def test_unet_shapes_and_range():
    net = unet.PatchNeutralizer(n_filters=4)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, x: net.init(r, x, False))(
        {"params": jax.random.PRNGKey(0)}, x)
    out = net.apply(variables, jnp.ones((2, 64, 64, 3)) * 0.3, False)
    assert out.shape == (2, 64, 64, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


@pytest.mark.slow
def test_unet_batchnorm_updates():
    net = unet.PatchNeutralizer(n_filters=4)
    x = jnp.ones((2, 32, 32, 3))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, False)
    out, mutated = net.apply(variables, x, True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    leaves0 = jax.tree.leaves(variables["batch_stats"])
    leaves1 = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


@pytest.mark.slow
def test_unet_remat_equivalence():
    """remat=True must be bit-identical to remat=False (same dropout rng
    replay) in eval forward AND train-mode input gradients."""
    from mladversarialobjectdetection_tpu.models.unet import PatchNeutralizer
    u0 = PatchNeutralizer(n_filters=4)
    u1 = PatchNeutralizer(n_filters=4, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = u0.init({"params": jax.random.PRNGKey(1)}, x[:1], False)

    def loss(u, xx):
        y, _ = u.apply(v, xx, True, rngs={"dropout": jax.random.PRNGKey(3)},
                       mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda xx: loss(u0, xx))(x)
    g1 = jax.grad(lambda xx: loss(u1, xx))(x)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    y0 = u0.apply(v, x, False)
    y1 = u1.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
