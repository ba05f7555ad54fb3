"""Pallas TPU warp kernels, v2: channel-major FMA formulation.

Second-generation kernels for the EOT two-pass warp (see ops/eot.py and
ops/pallas_warp.py). v1 generated the dense hat-weight tensors per tile
and contracted on the MXU — correct, but the [.., .., 3]-minor operand
layout padded 3 channels to 128 lanes and left the MXU at ~2%
utilization, losing to XLA's fused einsum by ~8x.

v2 never materializes a weight tensor at all. Every array in the kernels
is a 2D [sublane, lane] tile with the lane dimension carrying a wide
spatial axis (the window w or the canvas side p0), and channels are an
unrolled python loop over separate 2D accumulators. The contraction is an
explicit fori_loop of VPU FMAs:

    pass 1:  t[c, x, i]   = sum_j hat(g(i,x) - j) * canvas[c, j, i] / norm
    pass 2:  out[c, y, x] = sum_i hat(u(y,x) - i) * t[c, i, x]      / norm

where g and u are affine in their coordinates (scalars prefetched) and
`hat` is the triangle filter. Each loop iteration loads one [1, lane]
row with a dynamic sublane index — no gathers, no weight traffic to HBM,
one hat evaluation shared by all three channels.

The backward passes are the linear transposes, computed row-by-row with
a sublane reduction per contraction index and a dynamic-sublane store.

STATUS (v5e, tools/bench_eot.py, 24 img x 16 slots, window 320, fwd+grad):
matmul (XLA einsum) 86 ms, pallas2 170 ms, pallas v1 416 ms. v2 fixes
v1's lane-padding disaster (2.4x) but the serial 96-iteration FMA loop
still loses 2x to XLA's MXU einsum pipeline, so the matmul backend
remains the production default; v2 is kept as the best hand-kernel
formulation found (and the starting point if a future generation's VPU
issue width changes the tradeoff).

Layout contracts (XLA transposes outside the kernels are cheap and fuse):
  canvas_cji [3, P0(j), P0(i)]  ->  t_cix [3, P0(i), W(x)]
  t_cix                         ->  out [W(y), W(x), 3]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_INTERPRET = False  # flipped by tests on CPU


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _pick_tile(w: int, max_tile: int = 128) -> int:
    """Largest divisor of w that is <= max_tile (sublane tiling; grids use
    exact division). E.g. 320 -> 80, 384 -> 128, 128 -> 128."""
    for t in range(min(max_tile, w), 0, -1):
        if w % t == 0:
            return t
    return w


def _hat(d, radius):
    return jnp.maximum(0.0, 1.0 - jnp.abs(d) / radius)


# ---------------------------------------------------------------------------
# pass 1 fwd: t[c, i, x] = sum_j hat(g_i*i + g_x*x + g_c - j) canvas[c, j, i]
# kernel computes in [x, i] orientation (x sublanes, i lanes) so the canvas
# row load broadcasts for free, then stores transposed blocks.
# ---------------------------------------------------------------------------

def _pass1_fwd_kernel(scalars, canvas_ref, out_ref):
    # canvas_ref [3, p0(j), p0(i)]; out_ref [3, x_tile, p0(i)]
    x_tile = out_ref.shape[1]
    p0 = out_ref.shape[2]
    g_i = scalars[0]
    g_x = scalars[1]
    g_c = scalars[2]
    radius = scalars[3]
    tx = pl.program_id(0) * x_tile

    xx = tx + _iota2((x_tile, p0), 0)
    ii = _iota2((x_tile, p0), 1)
    g = g_i * ii + g_x * xx + g_c                 # [x, i]

    def body(j, carry):
        acc0, acc1, acc2, norm = carry
        wgt = _hat(g - j.astype(jnp.float32), radius)
        r0 = canvas_ref[0, pl.ds(j, 1), :]        # [1, p0(i)]
        r1 = canvas_ref[1, pl.ds(j, 1), :]
        r2 = canvas_ref[2, pl.ds(j, 1), :]
        return (acc0 + wgt * r0, acc1 + wgt * r1, acc2 + wgt * r2,
                norm + wgt)

    zero = jnp.zeros((x_tile, p0), jnp.float32)
    acc0, acc1, acc2, norm = jax.lax.fori_loop(
        0, p0, body, (zero, zero, zero, zero))
    inv = 1.0 / jnp.maximum(norm, 1e-8)
    out_ref[0, :, :] = acc0 * inv
    out_ref[1, :, :] = acc1 * inv
    out_ref[2, :, :] = acc2 * inv


def pass1_fwd(canvas_cji, g_i, g_x, g_c, radius, w: int, *,
              x_tile: int | None = None):
    """canvas_cji [3, P0, P0] -> t_cxi [3, W, P0] (x sublanes, i lanes)."""
    p0 = canvas_cji.shape[1]
    x_tile = x_tile or _pick_tile(w)
    assert w % x_tile == 0
    scalars = jnp.stack([g_i, g_x, g_c, radius]).astype(jnp.float32)
    return pl.pallas_call(
        _pass1_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // x_tile,),
            in_specs=[pl.BlockSpec((3, p0, p0), lambda x, s: (0, 0, 0))],
            out_specs=pl.BlockSpec((3, x_tile, p0), lambda x, s: (0, x, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, w, p0), jnp.float32),
        interpret=_INTERPRET,
    )(scalars, canvas_cji)


# ---------------------------------------------------------------------------
# pass 2 fwd: out[c, y, x] = sum_i hat(a*y + b*x + cu - i) t[c, i, x]
# ---------------------------------------------------------------------------

def _pass2_fwd_kernel(scalars, t_ref, out_ref):
    # t_ref [3, p0(i), w(x)]; out_ref [3, y_tile, w]
    y_tile = out_ref.shape[1]
    w = out_ref.shape[2]
    p0 = t_ref.shape[1]
    a = scalars[0]
    b = scalars[1]
    cu = scalars[2]
    radius = scalars[3]
    ty = pl.program_id(0) * y_tile

    yy = ty + _iota2((y_tile, w), 0)
    xx = _iota2((y_tile, w), 1)
    u = a * yy + b * xx + cu                      # [y, x]

    def body(i, carry):
        acc0, acc1, acc2, norm = carry
        wgt = _hat(u - i.astype(jnp.float32), radius)
        r0 = t_ref[0, pl.ds(i, 1), :]             # [1, w]
        r1 = t_ref[1, pl.ds(i, 1), :]
        r2 = t_ref[2, pl.ds(i, 1), :]
        return (acc0 + wgt * r0, acc1 + wgt * r1, acc2 + wgt * r2,
                norm + wgt)

    zero = jnp.zeros((y_tile, w), jnp.float32)
    acc0, acc1, acc2, norm = jax.lax.fori_loop(
        0, p0, body, (zero, zero, zero, zero))
    inv = 1.0 / jnp.maximum(norm, 1e-8)
    out_ref[0, :, :] = acc0 * inv
    out_ref[1, :, :] = acc1 * inv
    out_ref[2, :, :] = acc2 * inv


def pass2_fwd(t_cix, a, b, cu, radius, w: int, *, y_tile: int | None = None):
    """t_cix [3, P0, W] -> out [3, W(y), W(x)]."""
    p0 = t_cix.shape[1]
    y_tile = y_tile or _pick_tile(w)
    assert w % y_tile == 0
    scalars = jnp.stack([a, b, cu, radius]).astype(jnp.float32)
    return pl.pallas_call(
        _pass2_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // y_tile,),
            in_specs=[pl.BlockSpec((3, p0, w), lambda y, s: (0, 0, 0))],
            out_specs=pl.BlockSpec((3, y_tile, w), lambda y, s: (0, y, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, w, w), jnp.float32),
        interpret=_INTERPRET,
    )(scalars, t_cix)


# ---------------------------------------------------------------------------
# pass 2 bwd: dt[c, i, x] = sum_y (hat(u(y,x) - i)/norm2(y,x)) g[c, y, x]
# one row of dt per contraction index i: a sublane reduction over y.
# ---------------------------------------------------------------------------

def _pass2_bwd_kernel(scalars, g_ref, out_ref):
    # g_ref [3, w(y), w(x)]; out_ref [3, p0(i), w(x)]
    p0 = out_ref.shape[1]
    w = out_ref.shape[2]
    a = scalars[0]
    b = scalars[1]
    cu = scalars[2]
    radius = scalars[3]

    yy = _iota2((w, w), 0)
    xx = _iota2((w, w), 1)
    u = a * yy + b * xx + cu

    # normalization field norm2(y, x) = sum_i hat(u - i)
    def nbody(i, n):
        return n + _hat(u - i.astype(jnp.float32), radius)
    norm = jax.lax.fori_loop(0, p0, nbody, jnp.zeros((w, w), jnp.float32))
    g0 = g_ref[0, :, :] / jnp.maximum(norm, 1e-8)
    g1 = g_ref[1, :, :] / jnp.maximum(norm, 1e-8)
    g2 = g_ref[2, :, :] / jnp.maximum(norm, 1e-8)

    def body(i, _):
        wgt = _hat(u - i.astype(jnp.float32), radius)
        out_ref[0, pl.ds(i, 1), :] = jnp.sum(wgt * g0, axis=0,
                                             keepdims=True)
        out_ref[1, pl.ds(i, 1), :] = jnp.sum(wgt * g1, axis=0,
                                             keepdims=True)
        out_ref[2, pl.ds(i, 1), :] = jnp.sum(wgt * g2, axis=0,
                                             keepdims=True)
        return 0

    jax.lax.fori_loop(0, p0, body, 0)


def pass2_bwd(g_cyx, a, b, cu, radius, p0: int):
    """g [3, W, W] -> dt [3, P0, W]."""
    w = g_cyx.shape[1]
    scalars = jnp.stack([a, b, cu, radius]).astype(jnp.float32)
    return pl.pallas_call(
        _pass2_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((3, w, w), lambda _, s: (0, 0, 0))],
            out_specs=pl.BlockSpec((3, p0, w), lambda _, s: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, p0, w), jnp.float32),
        interpret=_INTERPRET,
    )(scalars, g_cyx)


# ---------------------------------------------------------------------------
# pass 1 bwd: dcanvas[c, j, i] = sum_x (hat(g(i,x) - j)/norm1(i,x)) dt[c, i, x]
# computed in [x, i] orientation; one dcanvas row per j via sublane reduce.
# ---------------------------------------------------------------------------

def _pass1_bwd_kernel(scalars, dt_ref, out_ref):
    # dt_ref [3, w(x), p0(i)] (x sublanes); out_ref [3, p0(j), p0(i)]
    w = dt_ref.shape[1]
    p0 = out_ref.shape[1]
    g_i = scalars[0]
    g_x = scalars[1]
    g_c = scalars[2]
    radius = scalars[3]

    xx = _iota2((w, p0), 0)
    ii = _iota2((w, p0), 1)
    g = g_i * ii + g_x * xx + g_c                  # [x, i]

    def nbody(j, n):
        return n + _hat(g - j.astype(jnp.float32), radius)
    norm = jax.lax.fori_loop(0, p0, nbody, jnp.zeros((w, p0), jnp.float32))
    d0 = dt_ref[0, :, :] / jnp.maximum(norm, 1e-8)
    d1 = dt_ref[1, :, :] / jnp.maximum(norm, 1e-8)
    d2 = dt_ref[2, :, :] / jnp.maximum(norm, 1e-8)

    def body(j, _):
        wgt = _hat(g - j.astype(jnp.float32), radius)
        out_ref[0, pl.ds(j, 1), :] = jnp.sum(wgt * d0, axis=0,
                                             keepdims=True)
        out_ref[1, pl.ds(j, 1), :] = jnp.sum(wgt * d1, axis=0,
                                             keepdims=True)
        out_ref[2, pl.ds(j, 1), :] = jnp.sum(wgt * d2, axis=0,
                                             keepdims=True)
        return 0

    jax.lax.fori_loop(0, p0, body, 0)


def pass1_bwd(dt_cxi, g_i, g_x, g_c, radius, p0: int):
    """dt [3, W(x), P0(i)] -> dcanvas [3, P0(j), P0(i)]."""
    w = dt_cxi.shape[1]
    scalars = jnp.stack([g_i, g_x, g_c, radius]).astype(jnp.float32)
    return pl.pallas_call(
        _pass1_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((3, w, p0), lambda _, s: (0, 0, 0))],
            out_specs=pl.BlockSpec((3, p0, p0), lambda _, s: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, p0, p0), jnp.float32),
        interpret=_INTERPRET,
    )(scalars, dt_cxi)


# ---------------------------------------------------------------------------
# differentiable fused warp (same API as pallas_warp.warp_window)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def warp_window(canvas, p1_scalars, p2_scalars, radius, oy, ox, w):
    """Two-pass warp sample [w, w, 3] from canvas [P0, P0, 3].

    p1_scalars = (g_i, g_x, g_c); p2_scalars = (a, b, cu). Matches
    eot._warp_window_matmul sampling math (and pallas_warp v1's API)."""
    canvas_cji = jnp.transpose(canvas, (2, 1, 0))      # [3, j, i]
    t_cxi = pass1_fwd(canvas_cji, p1_scalars[0], p1_scalars[1],
                      p1_scalars[2], radius, w)        # [3, x, i]
    t_cix = jnp.transpose(t_cxi, (0, 2, 1))            # [3, i, x]
    out = pass2_fwd(t_cix, p2_scalars[0], p2_scalars[1], p2_scalars[2],
                    radius, w)                         # [3, y, x]
    return jnp.transpose(out, (1, 2, 0))               # [y, x, 3]


def _fwd(canvas, p1_scalars, p2_scalars, radius, oy, ox, w):
    out = warp_window(canvas, p1_scalars, p2_scalars, radius, oy, ox, w)
    return out, (canvas.shape[0], p1_scalars, p2_scalars, radius)


def _bwd(w, res, g):
    p0, p1s, p2s, radius = res
    g_cyx = jnp.transpose(g, (2, 0, 1))                # [3, y, x]
    dt_cix = pass2_bwd(g_cyx, p2s[0], p2s[1], p2s[2], radius, p0)
    dt_cxi = jnp.transpose(dt_cix, (0, 2, 1))          # [3, x, i]
    dcanvas_cji = pass1_bwd(dt_cxi, p1s[0], p1s[1], p1s[2], radius, p0)
    dcanvas = jnp.transpose(dcanvas_cji, (2, 1, 0))    # [i, j, c]
    zeros3 = lambda t: tuple(jnp.zeros_like(s) for s in t)
    return (dcanvas, zeros3(p1s), zeros3(p2s), jnp.zeros_like(radius),
            jnp.zeros(()), jnp.zeros(()))


warp_window.defvjp(_fwd, _bwd)
