"""Exact lax.top_k vs lax.approx_max_k on the attack's candidate-select
shape ([B, 76725] anchor scores -> 256), plus the full first_pass cost
with each. Informs whether approx top-k is worth a config knob.

    python tools/bench_topk.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def fenced(fn, *args, n=20):
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _i in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def main(batch=24, anchors=76725, k=256):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, anchors))

    @jax.jit
    def exact(s):
        return jax.lax.top_k(s, k)

    @jax.jit
    def approx(s):
        return jax.lax.approx_max_k(s, k, recall_target=0.95)

    @jax.jit
    def approx99(s):
        return jax.lax.approx_max_k(s, k, recall_target=0.99)

    print(f"[B={batch}, A={anchors}] -> top {k}")
    print(f"  exact top_k:            {fenced(exact, x)*1e3:6.2f} ms")
    print(f"  approx_max_k r=.95:     {fenced(approx, x)*1e3:6.2f} ms")
    print(f"  approx_max_k r=.99:     {fenced(approx99, x)*1e3:6.2f} ms")

    # gather of boxes by the returned indices (same either way)
    boxes = jax.random.normal(jax.random.PRNGKey(1), (batch, anchors, 4))

    @jax.jit
    def exact_gather(s, b):
        ts, ti = jax.lax.top_k(s, k)
        return ts, jnp.take_along_axis(b, ti[..., None], axis=1)

    @jax.jit
    def approx_gather(s, b):
        ts, ti = jax.lax.approx_max_k(s, k, recall_target=0.99)
        return ts, jnp.take_along_axis(b, ti[..., None], axis=1)

    print(f"  exact + box gather:     {fenced(exact_gather, x, boxes)*1e3:6.2f} ms")
    print(f"  approx99 + box gather:  {fenced(approx_gather, x, boxes)*1e3:6.2f} ms")


if __name__ == "__main__":
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    main()
