"""Prototype: channel-major 3x3 conv pallas kernel for SMALL channel
counts (the U-Net's C=8/16 640px stages pay a 12x lane-padding tax in
XLA's NHWC layout — BENCH_NOTES.md "Defender training").

Layout: x [B, C, H+2, W+2] (channel-major, pre-padded SAME halo) so the
lane dim is W (well packed) instead of C (12x padded). The conv is
C_out x C_in x 9 shifted VPU FMAs over [th, W] f32 tiles; slices are
static so mosaic folds the shifts into the loads.

    python tools/proto_cmconv.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, th, W, C, Co):
    # x_ref [1, 1, C, th+2, W+2]; w_ref [3,3,C,Co]; o_ref [1, Co, th, W]
    for co in range(Co):
        acc = jnp.zeros((th, W), jnp.float32)
        for c in range(C):
            xc = x_ref[0, 0, c]
            for dy in range(3):
                for dx in range(3):
                    acc = acc + (xc[dy:dy + th, dx:dx + W].astype(jnp.float32)
                                 * w_ref[dy, dx, c, co])
        o_ref[0, co] = acc.astype(o_ref.dtype)


def _halo_rows(x, th):
    """[B, C, H+2, W+2] -> [B, nR, C, th+2, W+2] overlapping row tiles.

    Needed because mosaic blocks must tile the array exactly (last two
    dims divisible by (8,128) or equal); with halos that never aligns,
    so materialize the overlap once (an extra ~0.5 ms of HBM traffic at
    the 640px C8 shape — counted in the measurement)."""
    B, C, Hp, Wp = x.shape
    H = Hp - 2
    n_r = H // th
    tiles = [jax.lax.slice_in_dim(x, r * th, r * th + th + 2, axis=2)
             for r in range(n_r)]
    return jnp.stack(tiles, axis=1)


def cmconv(x, w, *, th=64, interpret=False):
    """x [B, C, H, W] bf16, w [3,3,C,Co] f32 -> [B, Co, H, W] bf16."""
    B, C, H, W = x.shape
    Co = w.shape[3]
    assert H % th == 0
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    xh = _halo_rows(xp, th)  # [B, nR, C, th+2, W+2]
    kern = functools.partial(_kernel, th=th, W=W, C=C, Co=Co)
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec((1, 1, C, th + 2, W + 2),
                         lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda b, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Co, th, W), lambda b, r: (b, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Co, H, W), x.dtype),
        interpret=interpret,
    )(xh, w)


def main():
    B, C, H, W = 24, 8, 640, 640
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (3, 3, C, C), jnp.float32) * 0.3
    x = jax.random.normal(k, (B, C, H, W)).astype(jnp.bfloat16)

    def ref_nhwc(xh):
        return lax.conv_general_dilated(
            xh, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # correctness vs XLA (transpose for comparison only)
    xh = jnp.transpose(x, (0, 2, 3, 1))
    y_ref = jnp.transpose(ref_nhwc(xh), (0, 3, 1, 2))
    y = cmconv(x, w)
    err = float(jnp.abs(y.astype(jnp.float32)
                        - y_ref.astype(jnp.float32)).max())
    print(f"max abs diff vs lax.conv: {err:.4f} (bf16 inputs)", flush=True)

    def fenced(fn, *a, n=20):
        fence = lambda o: float(jnp.sum(o.astype(jnp.float32)))
        for _ in range(2):
            fence(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*a)
        fence(o)
        return (time.perf_counter() - t0) / n

    f_ref = jax.jit(ref_nhwc)
    for th in (32, 64, 128):
        f = jax.jit(functools.partial(cmconv, w=w, th=th))
        try:
            t = fenced(f, x)
            print(f"cmconv th={th}: {t*1e3:6.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cmconv th={th}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    print(f"lax.conv NHWC:  {fenced(f_ref, xh)*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    main()
