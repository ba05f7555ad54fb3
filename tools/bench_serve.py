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


def main(model_name="efficientdet-d0", batches=(1, 8), iters=20,
         packed_entry=0):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.ops import postprocess

    cfg = mad.get_efficientdet_config(model_name)
    cfg.mixed_precision = True
    cfg.nms_configs.update({"pre_nms_topk": 1024})
    spec = spec_from_config(cfg)
    net = EfficientDetNet(spec, packed_entry=packed_entry)
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
        tag = f" packed{packed_entry}" if packed_entry else ""
        print(f"{model_name} @ {hw} batch {b}{tag}: {dt*1e3:7.2f} ms "
              f"({b/dt:7.1f} img/s)", flush=True)




def bench_pipelined(model_name="efficientdet-lite4", n_frames=64,
                    batch_size=4):
    """End-to-end streaming throughput: serial Detector.serve per frame vs
    serve_pipelined (host preprocess overlapped with device compute)."""
    from mladversarialobjectdetection_tpu.inference.detector import Detector

    det = Detector(model_name=model_name,
                   params={"mixed_precision": True,
                           "nms_configs": {"pre_nms_topk": 1024}})
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 255, (720, 1280, 3)).astype(np.uint8)
              for _ in range(n_frames)]

    # warm both programs
    det.serve(frames[:1])
    list(det.serve_pipelined(iter(frames[:2 * batch_size]),
                             batch_size=batch_size))

    t0 = time.perf_counter()
    for f in frames:
        det.serve(np.asarray(f)[None])
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_out = sum(1 for _ in det.serve_pipelined(iter(frames),
                                               batch_size=batch_size))
    t_piped = time.perf_counter() - t0
    assert n_out == n_frames

    det.serve(np.stack(frames[:batch_size]), device_preprocess=True)  # warm
    t0 = time.perf_counter()
    for i in range(0, n_frames, batch_size):
        det.serve(np.stack(frames[i:i + batch_size]),
                  device_preprocess=True)
    t_dev = time.perf_counter() - t0

    list(det.serve_pipelined(iter(frames[:2 * batch_size]),
                             batch_size=batch_size, device_preprocess=True))
    t0 = time.perf_counter()
    n_out = sum(1 for _ in det.serve_pipelined(
        iter(frames), batch_size=batch_size, device_preprocess=True))
    t_both = time.perf_counter() - t0
    assert n_out == n_frames
    print(f"  pipelined+device-preprocess b{batch_size}: "
          f"{n_frames/t_both:.1f} fps ({t_serial/t_both:.2f}x)", flush=True)
    print(f"streaming {model_name} 720p x{n_frames}: "
          f"serial b1 {n_frames/t_serial:.1f} fps | "
          f"pipelined b{batch_size} {n_frames/t_piped:.1f} fps "
          f"({t_serial/t_piped:.2f}x) | "
          f"device-preprocess b{batch_size} {n_frames/t_dev:.1f} fps "
          f"({t_serial/t_dev:.2f}x)", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientdet-d0")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--pipelined", action="store_true",
                   help="streaming serial-vs-pipelined comparison instead")
    p.add_argument("--packed-entry", type=int, default=0,
                   help="leading backbone blocks in the space-to-depth "
                        "packed layout (models/efficientnet_packed.py)")
    a = p.parse_args()
    if a.pipelined:
        bench_pipelined(a.model)
    else:
        main(a.model, tuple(a.batches), a.iters, a.packed_entry)
