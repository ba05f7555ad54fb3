"""Pallas TPU kernels for the EOT two-pass warp.

The matmul EOT backend (ops/eot.py) materializes its hat-weight tensors
(W1 [P0,W,P0], W2 [W,W,P0]) in HBM — ~50MB per patch slot, making the
composite bandwidth-bound on weights that are pure functions of four
scalars. These kernels generate the weights **inside VMEM** per output
tile and contract immediately on the MXU, eliminating that traffic.

All four contractions (two forward passes + their two cotangent
contractions) share one structure:

    out[m, n, c] = sum_k  w(m, n, k) * src[.., .., c]
    w(m, n, k)   = hat(alpha*m + beta*n + gamma - k) / sum_k hat(...)

with `hat(d) = max(0, 1 - |d|/radius)` and the four scalars streamed via
scalar prefetch. Geometry is stop-gradient in the attack (ops/eot.py), so
no scalar cotangents are needed.

Wired into ops/eot.apply_patches as `backend='pallas'`; numerically
verified against the matmul backend in tests (interpret mode on CPU;
losses match the matmul backend exactly on TPU).

STATUS: experimental — correct but currently ~8x slower than the XLA
matmul backend on v5e. The warp tensors carry channels=3 in the minor
dimension, which pads to 128 lanes inside kernel blocks (42x wasted VMEM
bandwidth) and leaves the per-tile [y_tile, p0] @ [p0, 3] matmuls at ~2%
MXU utilization; XLA's fused einsum pipelines the same math better. A
faster formulation needs channel-major blocking with a wide lane dim
(e.g. fusing slots/batch into lanes) — tracked for a later round. The
matmul backend stays the production default.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (needed for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
    _MEM = dict(vmem=pltpu.VMEM, smem=pltpu.SMEM)
except Exception:  # pragma: no cover
    pltpu = None
    _MEM = {}

_INTERPRET = False  # flipped by tests on CPU


def _hat_weights(idx_m, idx_n, idx_k, scalars_ref):
    """Normalized triangle-filter weights for one tile.

    scalars_ref holds [alpha, beta, gamma, radius]."""
    alpha = scalars_ref[0]
    beta = scalars_ref[1]
    gamma = scalars_ref[2]
    radius = scalars_ref[3]
    d = alpha * idx_m + beta * idx_n + gamma - idx_k
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d) / radius)
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


def _iota3(shape, dim):
    # mosaic requires integer iota; convert to f32 after
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


# ---------------------------------------------------------------------------
# pass 1: t[i, x, c] = sum_j w(i, x, j) * canvas[i, j, c]
# ---------------------------------------------------------------------------

def _pass1_fwd_kernel(scalars, canvas_ref, out_ref):
    i_tile = out_ref.shape[0]
    x_tile = out_ref.shape[1]
    p0 = canvas_ref.shape[1]
    ti = pl.program_id(0) * i_tile
    tx = pl.program_id(1) * x_tile
    shape = (i_tile, x_tile, p0)
    w = _hat_weights(ti + _iota3(shape, 0), tx + _iota3(shape, 1),
                     _iota3(shape, 2), scalars)
    # batched over i: [x_tile, p0] @ [p0, c]
    out_ref[:, :, :] = jax.lax.dot_general(
        w, canvas_ref[:, :, :],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _pass1_bwd_kernel(scalars, g_ref, out_ref):
    """dcanvas[i, j, c] = sum_x w(i, x, j) * g[i, x, c].

    Grid dim 0 tiles x (sequential); the output block is revisited and
    accumulated across x-tiles to bound VMEM."""
    i_tile = out_ref.shape[0]
    p0 = out_ref.shape[1]
    x_tile = g_ref.shape[1]
    tx = pl.program_id(0) * x_tile
    shape = (i_tile, x_tile, p0)
    w = _hat_weights(_iota3(shape, 0), tx + _iota3(shape, 1),
                     _iota3(shape, 2), scalars)
    # contract x: [p0(j), x_tile] @ [x_tile, c] batched over i
    partial = jax.lax.dot_general(
        w, g_ref[:, :, :],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:, :, :] = partial

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        out_ref[:, :, :] = out_ref[:, :, :] + partial


# ---------------------------------------------------------------------------
# pass 2: out[y, x, c] = sum_i w(y, x, i) * t[i, x, c]
# ---------------------------------------------------------------------------

def _pass2_fwd_kernel(scalars, t_ref, out_ref):
    y_tile = out_ref.shape[0]
    x_tile = out_ref.shape[1]
    p0 = t_ref.shape[0]
    ty = pl.program_id(0) * y_tile
    tx = pl.program_id(1) * x_tile
    shape = (x_tile, y_tile, p0)
    # weights indexed [x, y, i] so the contraction batches over x
    w = _hat_weights(ty + _iota3(shape, 1), tx + _iota3(shape, 0),
                     _iota3(shape, 2), scalars)
    # mosaic requires batch dims in the same position: bring x leading
    t_x = jnp.swapaxes(t_ref[:, :, :], 0, 1)  # [x_tile, p0, c]
    out = jax.lax.dot_general(
        w, t_x,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [x_tile, y_tile, c]
    out_ref[:, :, :] = jnp.swapaxes(out, 0, 1)


def _pass2_bwd_kernel(scalars, g_ref, out_ref):
    """dt[i, x, c] = sum_y w(y, x, i) * g[y, x, c].

    Grid: (x-tiles, y-tiles); the inner y dim revisits + accumulates the
    output block."""
    i_tile = out_ref.shape[0]
    x_tile = out_ref.shape[1]
    y_tile = g_ref.shape[0]
    tx = pl.program_id(0) * x_tile
    ty = pl.program_id(1) * y_tile
    shape = (x_tile, y_tile, i_tile)
    w = _hat_weights(ty + _iota3(shape, 1), tx + _iota3(shape, 0),
                     _iota3(shape, 2), scalars)
    # contract y, batch x leading on both operands
    g_x = jnp.swapaxes(g_ref[:, :, :], 0, 1)  # [x_tile, y_tile, c]
    out = jax.lax.dot_general(
        w, g_x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [x_tile, i_tile, c]
    partial = jnp.swapaxes(out, 0, 1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:, :, :] = partial

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        out_ref[:, :, :] = out_ref[:, :, :] + partial


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _scalars_arr(alpha, beta, gamma, radius):
    return jnp.stack([alpha, beta, gamma, radius]).astype(jnp.float32)


def _check_tiles(w: int, **tiles) -> None:
    """Grids use floor division; a ragged tail tile would silently be left
    unwritten (garbage output). Fail loudly instead."""
    for name, t in tiles.items():
        if w % t != 0:
            raise ValueError(
                f"pallas warp window {w} is not divisible by {name}={t}; "
                f"choose a window that is a multiple of the tile sizes")


def _call(kernel, scalars, src, out_shape, grid, src_spec, out_spec):
    if pltpu is None:
        raise RuntimeError("pallas tpu backend unavailable")
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[src_spec],
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(scalars, src)


def pass1_fwd(canvas: jnp.ndarray, alpha, beta, gamma, radius,
              w: int, *, x_tile: int = 32) -> jnp.ndarray:
    """canvas [P0, P0, 3] -> t [P0, w, 3]."""
    x_tile = min(x_tile, w)
    _check_tiles(w, x_tile=x_tile)
    p0 = canvas.shape[0]
    scalars = _scalars_arr(alpha, beta, gamma, radius)
    return _call(
        _pass1_fwd_kernel, scalars, canvas,
        jax.ShapeDtypeStruct((p0, w, 3), jnp.float32),
        grid=(1, w // x_tile),
        src_spec=pl.BlockSpec((p0, p0, 3), lambda i, x, s: (0, 0, 0)),
        out_spec=pl.BlockSpec((p0, x_tile, 3), lambda i, x, s: (0, x, 0)))


def pass1_bwd(g: jnp.ndarray, alpha, beta, gamma, radius,
              p0: int, *, x_tile: int = 32) -> jnp.ndarray:
    """g [P0, w, 3] -> dcanvas [P0, P0, 3] (accumulated over x-tiles)."""
    w = g.shape[1]
    x_tile = min(x_tile, w)
    _check_tiles(w, x_tile=x_tile)
    scalars = _scalars_arr(alpha, beta, gamma, radius)
    return _call(
        _pass1_bwd_kernel, scalars, g,
        jax.ShapeDtypeStruct((p0, p0, 3), jnp.float32),
        grid=(w // x_tile,),
        src_spec=pl.BlockSpec((p0, x_tile, 3), lambda x, s: (0, x, 0)),
        out_spec=pl.BlockSpec((p0, p0, 3), lambda x, s: (0, 0, 0)))


def pass2_fwd(t: jnp.ndarray, alpha, beta, gamma, radius, w: int, *,
              y_tile: int = 32, x_tile: int = 64) -> jnp.ndarray:
    """t [P0, w, 3] -> out [w, w, 3]."""
    y_tile = min(y_tile, w)
    x_tile = min(x_tile, w)
    _check_tiles(w, x_tile=x_tile, y_tile=y_tile)
    p0 = t.shape[0]
    scalars = _scalars_arr(alpha, beta, gamma, radius)
    return _call(
        _pass2_fwd_kernel, scalars, t,
        jax.ShapeDtypeStruct((w, w, 3), jnp.float32),
        grid=(w // y_tile, w // x_tile),
        src_spec=pl.BlockSpec((p0, x_tile, 3), lambda y, x, s: (0, x, 0)),
        out_spec=pl.BlockSpec((y_tile, x_tile, 3), lambda y, x, s: (y, x, 0)))


def pass2_bwd(g: jnp.ndarray, alpha, beta, gamma, radius,
              p0: int, *, x_tile: int = 64, y_tile: int = 32) -> jnp.ndarray:
    """g [w, w, 3] -> dt [P0, w, 3] (accumulated over y-tiles)."""
    w = g.shape[0]
    x_tile = min(x_tile, w)
    y_tile = min(y_tile, w)
    _check_tiles(w, x_tile=x_tile, y_tile=y_tile)
    scalars = _scalars_arr(alpha, beta, gamma, radius)
    return _call(
        _pass2_bwd_kernel, scalars, g,
        jax.ShapeDtypeStruct((p0, w, 3), jnp.float32),
        grid=(w // x_tile, w // y_tile),
        src_spec=pl.BlockSpec((y_tile, x_tile, 3), lambda x, y, s: (y, x, 0)),
        out_spec=pl.BlockSpec((p0, x_tile, 3), lambda x, y, s: (0, x, 0)))


# ---------------------------------------------------------------------------
# differentiable fused warp (matches eot._warp_window_matmul sampling math)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def warp_window(canvas, p1_scalars, p2_scalars, radius, oy, ox, w):
    """Two-pass warp sample [w, w, 3] from canvas [P0, P0, 3].

    p1_scalars = (g_i, g_x, g_c); p2_scalars = (a, b, cu)."""
    t = pass1_fwd(canvas, p1_scalars[0], p1_scalars[1], p1_scalars[2],
                  radius, w)
    return pass2_fwd(t, p2_scalars[0], p2_scalars[1], p2_scalars[2],
                     radius, w)


def _warp_window_fwd(canvas, p1_scalars, p2_scalars, radius, oy, ox, w):
    out = warp_window(canvas, p1_scalars, p2_scalars, radius, oy, ox, w)
    return out, (canvas.shape[0], p1_scalars, p2_scalars, radius)


def _warp_window_bwd(w, res, g):
    p0, p1s, p2s, radius = res
    dt = pass2_bwd(g, p2s[0], p2s[1], p2s[2], radius, p0)
    dcanvas = pass1_bwd(dt, p1s[0], p1s[1], p1s[2], radius, p0)
    zeros = tuple(jnp.zeros_like(s) for s in p1s)
    return (dcanvas, zeros, tuple(jnp.zeros_like(s) for s in p2s),
            jnp.zeros_like(radius), jnp.zeros(()), jnp.zeros(()))


warp_window.defvjp(_warp_window_fwd, _warp_window_bwd)
