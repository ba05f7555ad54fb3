"""EOT compositor backend microbenchmark on real hardware.

Times the full-load composite (ALL K slots valid on every image — the
worst case; the production step skips dead slots) fwd+grad for each
backend: matmul (XLA einsum), pallas (v1, MXU tiles), pallas2 (v2,
channel-major FMA). Fenced host-read timing (see BENCH_NOTES.md).

Usage: python tools/bench_eot.py [--batch 24] [--window 320] [--k 16]
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


def main(batch=24, hw=640, window=320, k=16, patch_size=640, iters=8):
    from mladversarialobjectdetection_tpu.ops import eot

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, hw, hw, 3)), jnp.float32)
    # K valid, well-separated-ish boxes per image (sizes ~160-320 px)
    yx = rng.uniform(0, hw - 340, (batch, k, 2))
    wh = rng.uniform(160, 320, (batch, k, 2))
    boxes = jnp.asarray(np.concatenate([yx, yx + wh], -1), jnp.float32)
    valid = jnp.ones((batch, k), bool)
    patch = jnp.asarray(rng.uniform(-1, 1, (patch_size, patch_size, 3)),
                        jnp.float32)
    key = jax.random.PRNGKey(0)

    for backend in ("matmul", "pallas2", "pallas"):
        def loss(p):
            out, _ = eot.apply_patches(key, images, boxes, valid, p, 0.4,
                                       window=window, backend=backend)
            return jnp.sum(out ** 2)

        g = jax.jit(jax.value_and_grad(loss))
        try:
            v, gr = g(patch)
            _ = float(v) + float(jnp.sum(gr))  # fence
            v, gr = g(patch)
            _ = float(v) + float(jnp.sum(gr))
            t0 = time.perf_counter()
            for _i in range(iters):
                v, gr = g(patch)
            _ = float(v) + float(jnp.sum(gr))
            dt = (time.perf_counter() - t0) / iters
            print(f"{backend:8s}: {dt*1e3:8.1f} ms fwd+grad "
                  f"({batch} img x {k} slots, window {window})", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{backend:8s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--window", type=int, default=320)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    a = p.parse_args()
    main(batch=a.batch, window=a.window, k=a.k, iters=a.iters)
