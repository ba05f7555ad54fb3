"""Throughput-optimal global batch sweep for the attack train step.

Round-1 found b24 optimal (BENCH_NOTES.md); the step has since changed
(off-step ASR, data-adaptive EOT, pallas NMS), so re-sweep occasionally:

    python tools/bench_batch_sweep.py [--batches 16,24,32,40]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(batch, model="efficientdet-lite4", iters=10):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)

    config = mad.get_efficientdet_config(model)
    config.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                               "pre_nms_topk": 256})
    config.mixed_precision = True
    spec = spec_from_config(config)
    net = EfficientDetNet(spec)
    x1 = jnp.zeros((1, *spec.image_size, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x1, training=False)
    float(jax.tree.leaves(variables["params"])[0].sum())
    attacker = PatchAttacker(config, variables, window=320)
    state = attacker.init_state(jax.random.PRNGKey(1))
    images = jax.random.uniform(jax.random.PRNGKey(2),
                                (batch, *spec.image_size, 3),
                                minval=-1.0, maxval=1.0)
    jax.block_until_ready(state.patch)
    step_fn = jax.jit(functools.partial(attacker.train_step, with_asr=False),
                      donate_argnums=0)
    step = lambda s, im: step_fn(s, im, det_variables=variables)
    fence = lambda s: float(jnp.sum(s.scale))
    state, _ = step(state, images)
    fence(state)
    for _ in range(2):
        state, _ = step(state, images)
    fence(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, images)
    fence(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"b{batch:3d}: {dt*1e3:7.1f} ms/step  {batch/dt:7.1f} img/s/chip",
          flush=True)
    return batch / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,24,32,40")
    p.add_argument("--model", default="efficientdet-lite4")
    a = p.parse_args()
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    for b in (int(s) for s in a.batches.split(",")):
        bench(b, a.model)
