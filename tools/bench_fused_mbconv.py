"""TPU check + benchmark of the fused MBConv path (ops/fused_mbconv.py).

1. numerics: compiled pallas fwd/bwd vs folded-XLA on real lite4 block
   shapes (bf16).
2. perf: full lite4@640 backbone fwd / fwd+dx-bwd, fused vs stock.

NOTE: on this platform weights must be closure constants of the jitted
fn (argument-passed weights re-upload per call; see BENCH_NOTES.md).
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "experiments"))
import fused_mbconv as fm  # archived experiment (tools/experiments)


def fenced(fn, *args, n=8):
    # fence with a DEVICE-SIDE reduction: np.asarray on a big activation
    # would download it through the tunnel and corrupt the timing
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _i in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def check_block(C, Co, k, E, H, W, residual, batch=2, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    fb = fm.FoldedBlock(
        we=jax.random.normal(ks[0], (C, E)) * 0.2,
        be=jax.random.normal(ks[1], (E,)) * 0.2,
        wd=jax.random.normal(ks[2], (k, k, E)) * 0.2,
        bd=jax.random.normal(ks[3], (E,)) * 0.2,
        wp=jax.random.normal(ks[4], (E, Co)) * 0.2,
        bp=jax.random.normal(ks[5], (Co,)) * 0.2)
    x = (jax.random.normal(ks[6], (batch, H, W, C)) * 0.5).astype(dtype)
    w = jax.random.normal(ks[0], (batch, H, W, Co)).astype(jnp.float32)

    def run(impl):
        def loss(xx):
            y = fm.mbconv_eval(xx, fb, act_type="relu6", residual=residual,
                               impl=impl)
            return jnp.sum(y.astype(jnp.float32) * w), y

        f = jax.jit(jax.value_and_grad(loss, has_aux=True))
        (_, y), g = f(x)
        return np.asarray(y, np.float32), np.asarray(g, np.float32)

    y_ref, g_ref = run("xla")
    y_got, g_got = run("pallas")
    sy = np.abs(y_ref).max() + 1e-9
    sg = np.abs(g_ref).max() + 1e-9
    dy = np.abs(y_got - y_ref)
    d = np.abs(g_got - g_ref)
    ey_mean, ey_max = dy.mean() / sy, dy.max() / sy
    eg_mean, eg_max = d.mean() / sg, d.max() / sg
    print(f"  C{C}->E{E}->Co{Co} k{k} {H}x{W} res={residual}: "
          f"fwd mean {ey_mean:.2e} max {ey_max:.2e}, "
          f"grad mean {eg_mean:.2e} max {eg_max:.2e}", flush=True)
    # max err is dominated by relu6 clip/mask flips at z==0/6 between two
    # equally-valid bf16 evaluations (the pallas grad is self-consistent
    # with the pallas forward); the mean pins everything else
    assert ey_mean < 5e-3 and eg_mean < 5e-3, "fused kernel mismatch"


def bench_backbone(model="efficientdet-lite4", batch=24):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        spec_from_config)
    from mladversarialobjectdetection_tpu.models.efficientnet import (
        EfficientNet)

    cfg = mad.get_efficientdet_config(model)
    cfg.mixed_precision = True
    spec = spec_from_config(cfg)
    hw = spec.image_size
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, *hw, 3),
                           minval=-1, maxval=1)
    net0 = EfficientNet(spec.backbone._replace(fused="none"), None,
                        jnp.bfloat16)
    variables = jax.jit(net0.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)
    _ = float(np.asarray(jax.tree.leaves(variables["params"])[0]).reshape(-1)[0])
    print(f"backbone {model} @ {hw} batch {batch}", flush=True)

    for mode in ("none", "pallas"):
        net = EfficientNet(spec.backbone._replace(fused=mode), None,
                           jnp.bfloat16)

        # close over variables: argument-passed weights re-upload per call
        @jax.jit
        def fwd(xx):
            return net.apply(variables, xx.astype(jnp.bfloat16), False)

        t = fenced(fwd, x)
        print(f"  fused={mode:6s} fwd:        {t*1e3:7.2f} ms", flush=True)

        @jax.jit
        def grad(xx):
            def loss(im):
                outs = net.apply(variables, im.astype(jnp.bfloat16), False)
                return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
            return jax.grad(loss)(xx)

        t = fenced(grad, x)
        print(f"  fused={mode:6s} fwd+dx bwd: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--skip-checks", action="store_true")
    a = p.parse_args()
    if not a.skip_checks:
        print("numerics (bf16, compiled pallas vs folded XLA):", flush=True)
        # real lite4 stride-1 block shapes
        check_block(C=32, Co=32, k=3, E=192, H=160, W=160, residual=True)
        check_block(C=56, Co=56, k=5, E=336, H=80, W=80, residual=True)
        check_block(C=160, Co=160, k=5, E=960, H=40, W=40, residual=True)
        check_block(C=272, Co=272, k=5, E=1632, H=20, W=20, residual=True)
        check_block(C=272, Co=448, k=3, E=1632, H=20, W=20, residual=False)
    bench_backbone(a.model, a.batch)
