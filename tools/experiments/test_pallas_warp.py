"""Pallas fused-warp kernel tests (interpret mode on the CPU mesh).

Verifies the pallas EOT backend against the matmul reference backend:
same regions, near-identical samples (the pallas path computes weights in
fp32 where the matmul path quantizes to bf16), matching gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pallas_warp  # sibling archived module
from mladversarialobjectdetection_tpu.ops import eot


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pallas_warp._INTERPRET
    pallas_warp._INTERPRET = True
    yield
    pallas_warp._INTERPRET = old


def _setup():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 64, 64, 3), minval=-1, maxval=1)
    bx = jnp.array([[[8, 8, 40, 40], [0, 0, 0, 0]],
                    [[10, 20, 50, 60], [5, 5, 20, 20]]], jnp.float32)
    bv = jnp.array([[True, False], [True, True]])
    patch = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 3),
                               minval=-1, maxval=1)
    return key, imgs, bx, bv, patch


def test_pallas_matches_matmul_forward():
    key, imgs, bx, bv, patch = _setup()
    out_m, reg_m = eot.apply_patches(key, imgs, bx, bv, patch, 0.5,
                                     backend="matmul", canvas_res=32)
    out_p, reg_p = eot.apply_patches(key, imgs, bx, bv, patch, 0.5,
                                     backend="pallas", canvas_res=32)
    assert bool(jnp.array_equal(reg_m, reg_p))
    assert float(jnp.abs(out_m - out_p).max()) < 5e-3


@pytest.mark.slow
def test_pallas_gradients_match():
    key, imgs, bx, bv, patch = _setup()

    def loss(p, backend):
        o, _ = eot.apply_patches(key, imgs, bx, bv, p, 0.5, backend=backend,
                                 canvas_res=32)
        return jnp.sum(o ** 2)

    gm = jax.grad(lambda p: loss(p, "matmul"))(patch)
    gp = jax.grad(lambda p: loss(p, "pallas"))(patch)
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gm - gp).max()) < 5e-3
    assert float(jnp.linalg.norm(gp)) == pytest.approx(
        float(jnp.linalg.norm(gm)), rel=1e-2)


def test_pass_kernels_identity_transform():
    """alpha=1, beta=0, gamma=0, radius=1 => each pass is the identity."""
    p0 = 16
    src = jax.random.uniform(jax.random.PRNGKey(2), (p0, p0, 3))
    one = jnp.asarray(1.0)
    zero = jnp.asarray(0.0)
    t = pallas_warp.pass1_fwd(src, zero, one, zero, one, p0)
    assert np.allclose(np.asarray(t), np.asarray(src), atol=1e-5)
    out = pallas_warp.pass2_fwd(t, one, zero, zero, one, p0)
    assert np.allclose(np.asarray(out), np.asarray(src), atol=1e-5)


@pytest.fixture(autouse=True)
def interpret_mode_v2():
    import pallas_warp2
    old = pallas_warp2._INTERPRET
    pallas_warp2._INTERPRET = True
    yield
    pallas_warp2._INTERPRET = old


def test_pallas2_matches_matmul_forward():
    """v2 channel-major FMA kernels == matmul backend (bf16-noise tol)."""
    key, imgs, bx, bv, patch = _setup()
    out_m, reg_m = eot.apply_patches(key, imgs, bx, bv, patch, 0.5,
                                     backend="matmul", canvas_res=32)
    out_p, reg_p = eot.apply_patches(key, imgs, bx, bv, patch, 0.5,
                                     backend="pallas2", canvas_res=32)
    assert bool(jnp.array_equal(reg_m, reg_p))
    assert float(jnp.abs(out_m - out_p).max()) < 0.02


@pytest.mark.slow
def test_pallas2_gradients_match():
    key, imgs, bx, bv, patch = _setup()

    def loss(p, backend):
        out, _ = eot.apply_patches(key, imgs, bx, bv, p, 0.5,
                                   backend=backend, canvas_res=32)
        return jnp.sum(out ** 2)

    g_m = jax.grad(lambda p: loss(p, "matmul"))(patch)
    g_p = jax.grad(lambda p: loss(p, "pallas2"))(patch)
    scale = float(jnp.abs(g_m).max()) + 1e-9
    assert float(jnp.abs(g_m - g_p).max()) / scale < 0.02


def test_pallas2_kernels_direct():
    """Direct kernel check vs the matmul warp at a non-pow2 window (tile
    picker path) and rotated geometry."""
    import pallas_warp2 as pw2
    p0, w = 96, 160
    rng = np.random.RandomState(0)
    canvas = jnp.asarray(rng.uniform(-1, 1, (p0, p0, 3)).astype(np.float32))
    geom_i = (jnp.float32(10.0), jnp.float32(20.0), jnp.float32(100.0),
              jnp.float32(141.0), jnp.float32(-0.3))
    oy, ox = jnp.float32(8.0), jnp.float32(16.0)
    ref, inside, _ = eot._warp_window_matmul(canvas, oy, ox, geom_i, w)
    p1s, p2s, radius = eot._warp_scalars(p0, oy, ox, geom_i)
    out = pw2.warp_window(canvas, p1s, p2s, radius, oy, ox, w)
    d = np.abs(np.asarray(out) - np.asarray(ref))[np.asarray(inside)]
    assert d.max() < 0.02
