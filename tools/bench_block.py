"""Per-block fused-vs-XLA microbench on TPU (lite4 stride-1 shapes).

Usage: python tools/bench_block.py
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


def fenced(fn, *args, n=16):
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _i in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


# lite4@640 stride-1 block stage shapes: (label, C, Co, k, E, H, reps)
STAGES = [
    ("s2 rep", 32, 32, 3, 192, 160, 3),
    ("s3 rep", 56, 56, 5, 336, 80, 3),
    ("s4 rep", 112, 112, 3, 672, 40, 5),
    ("s5 rep", 160, 160, 5, 960, 40, 6),
    ("s6 rep", 272, 272, 5, 1632, 20, 7),
    ("s7    ", 272, 448, 3, 1632, 20, 1),
]


def main(batch=24):
    print(f"per-block fused vs XLA, batch {batch}, bf16", flush=True)
    tot_x, tot_p = 0.0, 0.0
    for label, C, Co, k, E, H, reps in STAGES:
        ks = jax.random.split(jax.random.PRNGKey(0), 7)
        fb = fm.FoldedBlock(
            we=jax.random.normal(ks[0], (C, E)) * 0.2,
            be=jax.random.normal(ks[1], (E,)) * 0.2,
            wd=jax.random.normal(ks[2], (k, k, E)) * 0.2,
            bd=jax.random.normal(ks[3], (E,)) * 0.2,
            wp=jax.random.normal(ks[4], (E, Co)) * 0.2,
            bp=jax.random.normal(ks[5], (Co,)) * 0.2)
        x = (jax.random.normal(ks[6], (batch, H, H, C)) * 0.5
             ).astype(jnp.bfloat16)
        res = C == Co

        def mk(impl):
            @jax.jit
            def f(xx):
                return fm.mbconv_eval(xx, fb, act_type="relu6",
                                      residual=res, impl=impl)
            return f

        tx = fenced(mk("xla"), x)
        tp = fenced(mk("pallas"), x)
        th = fm._pick_row_tile(H, H, C, E, Co, (k - 1) // 2, 2)
        tot_x += tx * reps
        tot_p += tp * reps
        print(f"  {label} C{C:3d} E{E:4d} k{k} {H:3d}px th={th:3d}: "
              f"xla {tx*1e3:6.2f} ms  pallas {tp*1e3:6.2f} ms  "
              f"({tx/tp:4.2f}x)  x{reps}", flush=True)
    print(f"  stage-1 totals (x reps): xla {tot_x*1e3:.1f} ms  "
          f"pallas {tot_p*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
