"""Fused frozen MBConv (ops/fused_mbconv.py) vs the stock flax block.

Covers: BN folding + composed-XLA impl parity with the unfused eval path,
the pallas forward kernel (interpret mode) vs the XLA impl, the custom_vjp
dx backward vs jax.grad of the XLA impl, and the model-level dispatch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.models.efficientnet import (
    BlockArgs, BackboneSpec, MBConvBlock)
import fused_mbconv as fm  # sibling archived module


def _spec(act="relu6"):
    return BackboneSpec(blocks=(), stem_filters=32, act_type=act,
                        use_se=False, bn_momentum=0.99, bn_epsilon=1e-3,
                        survival_prob=None)


def _block_variables(key, ba, spec, x):
    blk = MBConvBlock(ba, spec)
    variables = blk.init({"params": key}, x, training=False)
    # randomize BN params/stats so folding is non-trivial
    rng = np.random.RandomState(0)

    def jitter(tree, positive=False):
        return jax.tree.map(
            lambda a: jnp.asarray(
                np.abs(rng.normal(1.0, 0.3, a.shape)) + 0.1 if positive
                else rng.normal(0.0, 0.5, a.shape)).astype(a.dtype), tree)

    p = jax.tree.map(lambda a: a, variables["params"])  # unfreeze copy
    s = jax.tree.map(lambda a: a, variables["batch_stats"])
    for bn in ("bn0", "bn1", "bn2"):
        p[bn]["bn"]["scale"] = jitter(p[bn]["bn"]["scale"], positive=True)
        p[bn]["bn"]["bias"] = jitter(p[bn]["bn"]["bias"])
        s[bn]["bn"]["mean"] = jitter(s[bn]["bn"]["mean"])
        s[bn]["bn"]["var"] = jitter(s[bn]["bn"]["var"], positive=True)
    return blk, {"params": p, "batch_stats": s}


CASES = [
    # (C, Co, k, expand, H, W, residual)
    (8, 8, 3, 6, 16, 16, True),
    (8, 12, 3, 6, 16, 16, False),
    (8, 8, 5, 6, 20, 20, True),
]


@pytest.mark.parametrize("C,Co,k,expand,H,W,residual", CASES)
def test_folded_xla_matches_flax_eval(C, Co, k, expand, H, W, residual):
    ba = BlockArgs(kernel_size=k, num_repeat=1, input_filters=C,
                   output_filters=Co, expand_ratio=expand, id_skip=True,
                   se_ratio=None, strides=(1, 1))
    spec = _spec()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, C), jnp.float32)
    blk, variables = _block_variables(jax.random.PRNGKey(0), ba, spec, x)
    ref = blk.apply(variables, x, training=False)
    fb = fm.fold_block_params(variables["params"], variables["batch_stats"],
                              spec.bn_epsilon)
    got = fm.mbconv_eval(x, fb, act_type="relu6", residual=residual,
                         impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C,Co,k,expand,H,W,residual", CASES)
@pytest.mark.parametrize("act", ["relu6", "swish"])
def test_pallas_fwd_matches_xla(C, Co, k, expand, H, W, residual, act):
    E = C * expand
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 7)
    fb = fm.FoldedBlock(
        we=jax.random.normal(ks[0], (C, E)) * 0.3,
        be=jax.random.normal(ks[1], (E,)) * 0.3,
        wd=jax.random.normal(ks[2], (k, k, E)) * 0.3,
        bd=jax.random.normal(ks[3], (E,)) * 0.3,
        wp=jax.random.normal(ks[4], (E, Co if not residual else C)) * 0.3,
        bp=jax.random.normal(ks[5], (Co if not residual else C,)) * 0.3,
    )
    x = jax.random.normal(ks[6], (2, H, W, C), jnp.float32)
    ref = fm.mbconv_eval(x, fb, act_type=act, residual=residual, impl="xla")
    got = fm._mbconv_fwd_pallas(x, fb, act_type=act, residual=residual,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C,Co,k,expand,H,W,residual", CASES[:2])
def test_pallas_bwd_matches_xla_grad(C, Co, k, expand, H, W, residual):
    E = C * expand
    out_c = C if residual else Co
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    fb = fm.FoldedBlock(
        we=jax.random.normal(ks[0], (C, E)) * 0.3,
        be=jax.random.normal(ks[1], (E,)) * 0.3,
        wd=jax.random.normal(ks[2], (k, k, E)) * 0.3,
        bd=jax.random.normal(ks[3], (E,)) * 0.3,
        wp=jax.random.normal(ks[4], (E, out_c)) * 0.3,
        bp=jax.random.normal(ks[5], (out_c,)) * 0.3,
    )
    x = jax.random.normal(ks[6], (2, H, W, C), jnp.float32)
    w = jax.random.normal(ks[0], (2, H, W, out_c), jnp.float32)

    def loss_ref(xx):
        y = fm.mbconv_eval(xx, fb, act_type="relu6", residual=residual,
                           impl="xla")
        return jnp.sum(y * w)

    def loss_pallas(xx):
        y = fm.mbconv_eval(xx, fb, act_type="relu6", residual=residual,
                           impl="pallas", interpret=True)
        return jnp.sum(y * w)

    g_ref = jax.grad(loss_ref)(x)
    g_got = jax.grad(loss_pallas)(x)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_got) / scale,
                               np.asarray(g_ref) / scale,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_model_dispatch_fused_xla():
    """EfficientNet with spec.fused='xla' matches the stock path at eval."""
    from mladversarialobjectdetection_tpu.models.efficientnet import (
        EfficientNet, get_backbone_spec)
    spec = get_backbone_spec("efficientnet-lite0")
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3), jnp.float32)
    net = EfficientNet(spec)
    variables = net.init({"params": jax.random.PRNGKey(5)}, x, training=False)
    ref = net.apply(variables, x, training=False)
    net_f = EfficientNet(spec._replace(fused="xla"))
    got = net_f.apply(variables, x, training=False)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_weight_grad_raises():
    """Differentiating w.r.t. the folded weights must fail loudly, not
    silently return zeros (the op is frozen by construction)."""
    C, E = 8, 48
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    fb = fm.FoldedBlock(
        we=jax.random.normal(ks[0], (C, E)) * 0.3,
        be=jnp.zeros((E,)), wd=jax.random.normal(ks[2], (3, 3, E)) * 0.3,
        bd=jnp.zeros((E,)), wp=jax.random.normal(ks[4], (E, C)) * 0.3,
        bp=jnp.zeros((C,)))
    x = jax.random.normal(ks[6], (1, 8, 8, C), jnp.float32)

    def loss(we):
        y = fm.mbconv_eval(x, fb._replace(we=we), act_type="relu6",
                           residual=True, impl="pallas", interpret=True)
        return jnp.sum(y)

    with pytest.raises(Exception):
        jax.grad(loss)(fb.we)


def test_ops_import_inside_trace_subprocess():
    """Regression: the ops package must be importable from INSIDE a jit
    trace (the fused dispatch imports it lazily at apply time). ops
    modules therefore must not create jax arrays at import time
    (ops/color.py once did -> TracerArrayConversionError)."""
    import subprocess
    import sys
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from mladversarialobjectdetection_tpu.models.efficientnet import (\n"
        "    BlockArgs, BackboneSpec, MBConvBlock)\n"
        "import sys\n"
        "assert not any('mladversarialobjectdetection_tpu.ops' == m\n"
        "               for m in sys.modules), 'ops already imported'\n"
        "ba = BlockArgs(kernel_size=3, num_repeat=1, input_filters=8,\n"
        "               output_filters=8, expand_ratio=6, id_skip=True,\n"
        "               se_ratio=None, strides=(1, 1))\n"
        "spec = BackboneSpec(blocks=(), stem_filters=8, act_type='relu6',\n"
        "                    use_se=False, bn_momentum=0.99, bn_epsilon=1e-3,\n"
        "                    survival_prob=None, fused='xla')\n"
        "blk = MBConvBlock(ba, spec)\n"
        "x = jnp.ones((1, 16, 16, 8))\n"
        "v = blk.init({'params': jax.random.PRNGKey(0)}, x, training=False)\n"
        "y = jax.jit(lambda xx: blk.apply(v, xx, training=False))(x)\n"
        "print('ok', y.shape)\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
