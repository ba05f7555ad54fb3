"""Kernel tuning bench: dispatch-overhead-free per-op timing via an
in-jit chain of 10 applications, with row-tile sweep.

Usage: python tools/bench_block2.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "experiments"))
import fused_mbconv as fm  # archived experiment (tools/experiments)

CHAIN = 10


def fenced(fn, *args, n=8):
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _i in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def dispatch_overhead():
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    t = fenced(f, x, n=16)
    print(f"trivial jit dispatch: {t*1e3:.3f} ms", flush=True)


def bench_stage(label, C, Co, k, E, H, th_list, batch=24):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    fb = fm.FoldedBlock(
        we=jax.random.normal(ks[0], (C, E)) * 0.2,
        be=jax.random.normal(ks[1], (E,)) * 0.2,
        wd=jax.random.normal(ks[2], (k, k, E)) * 0.2,
        bd=jax.random.normal(ks[3], (E,)) * 0.2,
        wp=jax.random.normal(ks[4], (E, C)) * 0.2,
        bp=jax.random.normal(ks[5], (C,)) * 0.2)
    x = (jax.random.normal(ks[6], (batch, H, H, C)) * 0.5).astype(jnp.bfloat16)

    def mk(impl):
        @jax.jit
        def f(xx):
            for _ in range(CHAIN):
                xx = fm.mbconv_eval(xx, fb, act_type="relu6",
                                    residual=True, impl=impl)
            return xx
        return f

    tx = fenced(mk("xla"), x) / CHAIN
    line = f"  {label} C{C:3d} E{E:4d} k{k} {H:3d}px: xla {tx*1e3:6.2f}"
    orig = fm._pick_row_tile
    for th in th_list:
        if H % th:
            continue
        try:
            fm._pick_row_tile = lambda *a, **kw: th
            tp = fenced(mk("pallas"), x) / CHAIN
            line += f" | th{th}: {tp*1e3:6.2f}"
        except Exception as exc:  # noqa: BLE001
            line += f" | th{th}: FAIL({type(exc).__name__})"
        finally:
            fm._pick_row_tile = orig
    print(line + " ms", flush=True)


if __name__ == "__main__":
    dispatch_overhead()
    # every stride-1 fused-eligible lite4 stage shape
    bench_stage("s2 rep", 32, 32, 3, 192, 160, [8, 16, 32])
    bench_stage("s3 rep", 56, 56, 5, 336, 80, [8, 16, 20])
    bench_stage("s4 rep", 112, 112, 3, 672, 40, [8, 10, 20, 40])
    bench_stage("s5 rep", 160, 160, 5, 960, 40, [5, 8, 10, 20])
    bench_stage("s6 rep", 272, 272, 5, 1632, 20, [5, 10, 20])
    bench_stage("s7 rep", 448, 448, 3, 2688, 20, [5, 10, 20])
