"""Serving (inference) throughput benchmark on real hardware.

Times the device serve program — detector forward + postprocess_global,
fixed shapes, bf16 activations — the body of Detector.serve. Comparable
to the vendored automl README's V100 numbers (README.md:87: D0 batch-1
10.2 ms / 97 fps, batch-8 209 fps end-to-end).

Usage: python tools/bench_serve.py [--model efficientdet-d0] [--batches 1 8]
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


def main(model_name="efficientdet-d0", batches=(1, 8), iters=20):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.ops import postprocess

    cfg = mad.get_efficientdet_config(model_name)
    cfg.mixed_precision = True
    cfg.nms_configs.update({"pre_nms_topk": 1024})
    spec = spec_from_config(cfg)
    net = EfficientDetNet(spec)
    params = cfg.as_dict()
    hw = spec.image_size
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, *hw, 3)), training=False)
    _ = float(np.asarray(jax.tree.leaves(variables["params"])[0]
                         ).reshape(-1)[0])

    def serve(images, scales):
        cls_out, box_out = net.apply(variables, images, False)
        return postprocess.postprocess_global(params, cls_out, box_out,
                                              image_scales=scales)

    for b in batches:
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, *hw, 3),
                               minval=-1, maxval=1)
        scales = jnp.ones((b,), jnp.float32)
        f = jax.jit(serve)
        det = f(x, scales)
        _ = float(jnp.sum(det.scores))  # fence
        det = f(x, scales)
        _ = float(jnp.sum(det.scores))
        t0 = time.perf_counter()
        for _i in range(iters):
            det = f(x, scales)
        _ = float(jnp.sum(det.scores))
        dt = (time.perf_counter() - t0) / iters
        print(f"{model_name} @ {hw} batch {b}: {dt*1e3:7.2f} ms "
              f"({b/dt:7.1f} img/s)", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientdet-d0")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()
    main(a.model, tuple(a.batches), a.iters)
