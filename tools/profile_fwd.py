"""Forward-pass component split on real hardware: backbone vs FPN+heads.

Usage: python tools/profile_fwd.py [--model efficientdet-lite4] [--batch 24]

NOTE: the jitted fns CLOSE OVER the weights — on this platform, weights
passed as call arguments are re-uploaded through the tunnel on every call
and the timing is garbage (see BENCH_NOTES.md measurement methodology).
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


def main(model_name, batch):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.models.efficientnet import EfficientNet

    cfg = mad.get_efficientdet_config(model_name)
    cfg.mixed_precision = True
    spec = spec_from_config(cfg)
    net = EfficientDetNet(spec)
    hw = spec.image_size
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, *hw, 3),
                           minval=-1, maxval=1)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)
    _ = float(np.asarray(jax.tree.leaves(variables["params"])[0]).reshape(-1)[0])
    print(f"model {model_name} @ {hw} batch {batch} "
          f"(backbone fused={spec.backbone.fused})", flush=True)

    bb = EfficientNet(spec.backbone, None, jnp.bfloat16)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}

    @jax.jit
    def bfwd(xx):
        return bb.apply(bb_vars, xx.astype(jnp.bfloat16), False)

    t_bb = fenced(bfwd, x)
    print(f"backbone fwd:        {t_bb*1e3:7.2f} ms", flush=True)

    @jax.jit
    def fwd(xx):
        return net.apply(variables, xx, False)

    t_full = fenced(fwd, x)
    print(f"full fwd:            {t_full*1e3:7.2f} ms "
          f"(fpn+heads ~ {(t_full-t_bb)*1e3:.2f} ms)", flush=True)

    @jax.jit
    def bgrad(xx):
        def loss(im):
            outs = bb.apply(bb_vars, im.astype(jnp.bfloat16), False)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return jax.grad(loss)(xx)

    t_bbg = fenced(bgrad, x)
    print(f"backbone fwd+dx bwd: {t_bbg*1e3:7.2f} ms", flush=True)

    @jax.jit
    def fgrad(xx):
        def loss(im):
            outs = net.apply(variables, im, False)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for head in outs for o in head)
        return jax.grad(loss)(xx)

    t_fg = fenced(fgrad, x)
    print(f"full fwd+dx bwd:     {t_fg*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--batch", type=int, default=24)
    a = p.parse_args()
    main(a.model, a.batch)
