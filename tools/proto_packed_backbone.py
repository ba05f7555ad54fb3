"""Micro-bench: packed (space-to-depth) formulations of the EfficientNet
entry-stage ops at d7x stage-1 shapes, BEFORE building a packed backbone.

tools/profile_hlo.py (d7x @1536 b8 backbone) shows blocks 0-9 at 768px
C=32/64 cost 68 ms of the 148 ms backbone at 242 GB/s achieved — the
lane padding tax (C=32 pads 4x, C=64 2x). A 2x2 space-to-depth makes
those C=128/256 (perfect lanes). The U-Net proved the trick for FULL
convs (models/unet_packed.py, +53%); the backbone additionally needs:

  - depthwise k3/k5 -> grouped conv on the packed grid
    (feature_group_count=C, kernel [k+1,k+1,4,4C] with zero structure)
  - 1x1 expand/project -> per-phase channel mix
    (feature_group_count=4, kernel [1,1,C,4Co])
  - stem s2 conv -> sub-pixel conv straight into packed layout

Each is benched against its unpacked original at the exact d7x shapes.
Verdicts decide whether models/efficientnet_packed.py gets built.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def fenced(fn, *args, n=10):
    f = jax.jit(fn)
    for _ in range(3):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def conv(x, k, strides=(1, 1), fgc=1):
    return lax.conv_general_dilated(
        x, k, strides, "SAME", feature_group_count=fgc,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def space_to_depth(x):
    """Phase-major packing: flat channel = (sy*2+sx)*C + cc."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def space_to_depth_cm(x):
    """Channel-major packing: flat channel = cc*4 + (sy*2+sx).

    This is the layout a packed DEPTHWISE conv needs: XLA grouped-conv
    groups are contiguous channel ranges, so feature_group_count=C only
    groups "the 4 phases of channel cc" together when they are adjacent.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space_cm(y):
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, h * 2, w * 2, c)


def pack_dw_kernel(k_dw, c):
    """[kh,kw,1,C] depthwise -> [pk,pk,4,4C] grouped kernel on the
    CHANNEL-MAJOR packed grid (see space_to_depth_cm).

    Output phase (p,q) at packed row Y covers unpacked row 2Y+p; its tap
    (dy,dx) reads unpacked row 2Y+p+dy = packed row Y + (p+dy)//2, phase
    (p+dy)%2. Over p in {0,1} and dy in [-r,r] the packed offsets span
    [floor(-r/2), floor((1+r)/2)] — {-1,0,1} for both k=3 and k=5, i.e.
    pk=3 taps per axis with center index 1 (a single 2x2 kernel CANNOT
    encode k=3: output phase 0 needs offsets {-1,0}, phase 1 needs
    {0,+1}). With feature_group_count=C, group cc holds the 4 phases of
    channel cc: kernel in-dim = input phase, out channel = cc*4 + phase.
    """
    kh = k_dw.shape[0]
    r = kh // 2
    lo = (0 - r) // 2          # most negative packed offset (phase 0)
    hi = (1 + r) // 2          # most positive packed offset (phase 1)
    pk = hi - lo + 1
    ctr = -lo
    assert pk % 2 == 1, (kh, pk)  # SAME conv needs an odd packed kernel
    kp = np.zeros((pk, pk, 4, 4 * c), k_dw.dtype)
    for p in range(2):
        for q in range(2):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    ip, iq = (p + dy) % 2, (q + dx) % 2
                    ty, tx = (p + dy) // 2 + ctr, (q + dx) // 2 + ctr
                    in_ph = ip * 2 + iq
                    for cc in range(c):
                        out_ch = cc * 4 + (p * 2 + q)
                        kp[ty, tx, in_ph, out_ch] = k_dw[dy + r, dx + r, 0, cc]
    return jnp.asarray(kp)


def main(batch, hw, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, hw, hw, c)), jnp.bfloat16)
    xp = jax.jit(space_to_depth)(x)
    print(f"shapes: unpacked {x.shape}, packed {xp.shape}", flush=True)

    xcm = jax.jit(space_to_depth_cm)(x)

    # ---- depthwise k3 (channel-major packed layout) ----
    kdw = jnp.asarray(rng.standard_normal((3, 3, 1, c)), jnp.bfloat16)
    t_dw = fenced(lambda a: conv(a, kdw, fgc=c), x)
    kdwp = pack_dw_kernel(np.asarray(kdw, np.float32), c).astype(jnp.bfloat16)
    t_dwp = fenced(lambda a: conv(a, kdwp, fgc=c), xcm)
    # correctness (f32, small slice)
    xs = jnp.asarray(rng.standard_normal((1, 16, 16, c)), jnp.float32)
    ref = conv(xs, kdw.astype(jnp.float32), fgc=c)
    got = conv(space_to_depth_cm(xs), kdwp.astype(jnp.float32), fgc=c)
    err = float(jnp.abs(depth_to_space_cm(got) - ref).max())
    assert err < 1e-4, f"packed depthwise k3 mismatch: {err}"
    print(f"depthwise k3: unpacked {t_dw*1e3:7.3f} ms  packed-grouped "
          f"{t_dwp*1e3:7.3f} ms  ({t_dw/t_dwp:4.2f}x)  maxerr {err:.2e}",
          flush=True)

    # ---- depthwise k5 (same packed-kernel math, pk stays 3) ----
    kdw5 = jnp.asarray(rng.standard_normal((5, 5, 1, c)), jnp.bfloat16)
    t_dw5 = fenced(lambda a: conv(a, kdw5, fgc=c), x)
    kdw5p = pack_dw_kernel(np.asarray(kdw5, np.float32), c).astype(jnp.bfloat16)
    t_dw5p = fenced(lambda a: conv(a, kdw5p, fgc=c), xcm)
    ref5 = conv(xs, kdw5.astype(jnp.float32), fgc=c)
    got5 = conv(space_to_depth_cm(xs), kdw5p.astype(jnp.float32), fgc=c)
    err5 = float(jnp.abs(depth_to_space_cm(got5) - ref5).max())
    assert err5 < 1e-4, f"packed depthwise k5 mismatch: {err5}"
    print(f"depthwise k5: unpacked {t_dw5*1e3:7.3f} ms  packed-grouped "
          f"{t_dw5p*1e3:7.3f} ms  ({t_dw5/t_dw5p:4.2f}x)  maxerr {err5:.2e}",
          flush=True)

    # ---- layout permutation cost (phase-major <-> channel-major) ----
    # a packed MBConv needs channel-major for the grouped depthwise but
    # phase-major for the per-phase 1x1 einsum (models/unet_packed.py
    # packed_1x1); this minor-dim permutation is the glue cost between them
    perm = np.array([ph * c + cc for cc in range(c) for ph in range(4)])
    t_perm = fenced(lambda a: jnp.take(a, jnp.asarray(perm), axis=3), xp)
    print(f"pm->cm minor permutation: {t_perm*1e3:7.3f} ms", flush=True)

    def depth_to_space(y):
        """Phase-major inverse (for the phase-major 1x1 benches below)."""
        b, h, w, c4 = y.shape
        cc = c4 // 4
        y = y.reshape(b, h, w, 2, 2, cc).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * 2, w * 2, cc)

    # ---- 1x1 project c -> c//2 ----
    co = c // 2
    k11 = jnp.asarray(rng.standard_normal((1, 1, c, co)), jnp.bfloat16)
    t_p = fenced(lambda a: conv(a, k11), x)
    # packed: per-phase channel mix == grouped conv, 4 groups
    k11p = jnp.tile(k11, (1, 1, 1, 4))  # block-diag as grouped: [1,1,C,4Co]
    t_pp = fenced(lambda a: conv(a, k11p, fgc=4), xp)
    ref = conv(xs, k11.astype(jnp.float32))
    gotp = conv(space_to_depth(xs), k11p.astype(jnp.float32), fgc=4)
    err = float(jnp.abs(depth_to_space(gotp) - ref).max())
    print(f"1x1 {c}->{co}: unpacked {t_p*1e3:7.3f} ms  packed-grouped "
          f"{t_pp*1e3:7.3f} ms  ({t_p/t_pp:4.2f}x)  maxerr {err:.2e}",
          flush=True)

    # ---- 1x1 expand c -> 6c ----
    ke = jnp.asarray(rng.standard_normal((1, 1, c, 6 * c)), jnp.bfloat16)
    t_e = fenced(lambda a: conv(a, ke), x)
    kep = jnp.tile(ke, (1, 1, 1, 4))
    t_ep = fenced(lambda a: conv(a, kep, fgc=4), xp)
    print(f"1x1 {c}->{6*c}: unpacked {t_e*1e3:7.3f} ms  packed-grouped "
          f"{t_ep*1e3:7.3f} ms  ({t_e/t_ep:4.2f}x)", flush=True)

    # ---- full 3x3 (stage-2 fused-style reference point) ----
    kf = jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.bfloat16)
    t_f = fenced(lambda a: conv(a, kf), x)
    # packed full conv: a [3,3,4C,4C] kernel with the phase zero-structure
    # (exact construction lives in models/unet_packed.py). For TIMING a
    # dense random kernel of the packed shape is equivalent — XLA does not
    # exploit kernel sparsity — so bench the dense packed conv here.
    rnd = rng.standard_normal
    kfp = jnp.asarray(rnd((3, 3, 4 * c, 4 * c)), jnp.bfloat16)
    t_fp = fenced(lambda a: conv(a, kfp), xp)
    print(f"full 3x3 {c}->{c}: unpacked {t_f*1e3:7.3f} ms  packed-2x2-dense "
          f"{t_fp*1e3:7.3f} ms  ({t_f/t_fp:4.2f}x)", flush=True)

    # ---- stem: s2 conv 3->C from image vs sub-pixel into packed ----
    img = jnp.asarray(rng.standard_normal((batch, hw * 2, hw * 2, 3)),
                      jnp.bfloat16)
    ks = jnp.asarray(rng.standard_normal((3, 3, 3, c)), jnp.bfloat16)
    t_s = fenced(lambda a: conv(a, ks, strides=(2, 2)), img)
    # packed-output stem: stride-4 conv with 4x the output channels reads
    # the image once and writes [hw/2, hw/2, 4C] directly (each output
    # phase = the s2 conv at offset (p,q); kernel 4x4 covers the union of
    # the four shifted 3x3 windows)
    ksp = jnp.asarray(rnd((4, 4, 3, 4 * c)), jnp.bfloat16)
    t_sp = fenced(lambda a: conv(a, ksp, strides=(4, 4)), img)
    print(f"stem s2 3->{c}: unpacked {t_s*1e3:7.3f} ms  packed-out s4 "
          f"{t_sp*1e3:7.3f} ms  ({t_s/t_sp:4.2f}x)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=768)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars are ignored by "
                         "this jax build; smoke tests must not steal the "
                         "TPU from a running soak)")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(a.batch, a.hw, a.c)
