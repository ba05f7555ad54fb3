"""Roofline accounting for the attack-step components via XLA's own
cost model (compiled.cost_analysis). Answers "is there perf left?"
without a profiler: compares each program's bandwidth/compute floor
against v5e peaks.

    python tools/roofline.py [--batch 24] [--model efficientdet-lite4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

V5E_HBM_GBS = 819.0   # HBM bandwidth, GB/s
V5E_BF16_TFLOPS = 197.0


def report(name, compiled):
    ca = compiled.cost_analysis()
    fl = ca.get("flops", 0.0)
    ba = ca.get("bytes accessed", 0.0)
    print(f"{name:18s} {fl/1e9:8.1f} GFLOP  {ba/1e9:7.2f} GB  "
          f"compute floor {fl/(V5E_BF16_TFLOPS*1e12)*1e3:6.2f} ms  "
          f"bandwidth floor {ba/(V5E_HBM_GBS*1e9)*1e3:6.2f} ms", flush=True)
    return ba


def main(model="efficientdet-lite4", batch=24):
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
    x = jnp.zeros((batch, *spec.image_size, 3))
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)

    print(f"{model} @ {spec.image_size} b{batch} (v5e peaks: "
          f"{V5E_HBM_GBS:.0f} GB/s, {V5E_BF16_TFLOPS:.0f} bf16 TFLOP/s)")

    fwd = jax.jit(lambda xx: net.apply(variables, xx.astype(jnp.bfloat16),
                                       False))
    report("detector fwd", fwd.lower(x).compile())

    def loss(xx):
        cls_out, box_out = net.apply(variables, xx.astype(jnp.bfloat16),
                                     False)
        return (sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in cls_out)
                + sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in box_out))

    report("detector fwd+bwd", jax.jit(jax.grad(loss)).lower(x).compile())

    attacker = PatchAttacker(config, variables, window=320)
    state = attacker.init_state(jax.random.PRNGKey(1))
    import functools
    step = jax.jit(functools.partial(attacker.train_step, with_asr=False),
                   donate_argnums=0)
    ba = report("full attack step",
                step.lower(state, x, det_variables=variables).compile())
    floor_ms = ba / (V5E_HBM_GBS * 1e9) * 1e3
    print(f"absolute step ceiling at the HBM roofline: "
          f"{batch / floor_ms * 1e3:.1f} img/s/chip")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--model", default="efficientdet-lite4")
    a = p.parse_args()
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    main(a.model, a.batch)
