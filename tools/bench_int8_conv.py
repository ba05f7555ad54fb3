"""Microbenchmark: int8 vs bf16 conv throughput on this TPU.

Decides whether an int8 serving mode can beat the bf16 roofline
(ROADMAP round-3 candidate 4). Representative lite4@640 serve shapes:
1x1 expand/project convs (MXU matmuls) and 3x3/5x5 depthwise stacks.

Timing follows BENCH_NOTES methodology: weights are closed-over jit
constants (small), iterations chain through the data to prevent DCE,
and sections are fenced with host reads.

Run: python tools/bench_int8_conv.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 30


def _fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def bench(fn, x):
    c = jax.jit(fn)
    y = c(x)
    _fence(y)  # compile + warmup
    t0 = time.perf_counter()
    y = c(x)
    _fence(y)
    return (time.perf_counter() - t0) * 1e3 / ITERS


def conv_chain_bf16(w, feature_group_count=1):
    def f(x):
        def body(i, x):
            y = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
                preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        return lax.fori_loop(0, ITERS, body, x)
    return f


def conv_chain_int8(w_q, feature_group_count=1):
    def f(x):
        def body(i, x):
            y = lax.conv_general_dilated(
                x, w_q, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
                preferred_element_type=jnp.int32)
            # cheap requant to chain the loop (realistic serve step)
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return lax.fori_loop(0, ITERS, body, x)
    return f


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    cases = [
        # (name, B, H, W, Cin, Cout, k, groups)
        ("1x1 expand  [8,40,40,192->1152]", 8, 40, 40, 192, 1152, 1, 1),
        ("1x1 project [8,40,40,1152->192]", 8, 40, 40, 1152, 192, 1, 1),
        ("3x3 bifpn   [8,80,80,224->224]", 8, 80, 80, 224, 224, 3, 1),
        ("3x3 head    [8,80,80,224->224]", 8, 80, 80, 224, 224, 3, 1),
        ("5x5 dwise   [8,40,40,672]", 8, 40, 40, 672, 672, 5, 672),
    ]
    for name, B, H, W, Ci, Co, k, g in cases:
        x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
        w = rng.standard_normal((k, k, Ci // g, Co)).astype(np.float32) * 0.05
        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        xq = jnp.clip(jnp.asarray(x * 32), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.asarray(w * 512), -127, 127).astype(jnp.int8)
        try:
            t_bf = bench(conv_chain_bf16(wb, g), xb)
        except Exception as e:  # pragma: no cover
            print(f"{name}: bf16 FAILED: {type(e).__name__}: {e}")
            continue
        try:
            t_q = bench(conv_chain_int8(wq, g), xq)
            print(f"{name}: bf16 {t_bf:7.3f} ms  int8 {t_q:7.3f} ms  "
                  f"speedup {t_bf / t_q:4.2f}x", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: bf16 {t_bf:7.3f} ms  int8 FAILED: "
                  f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
