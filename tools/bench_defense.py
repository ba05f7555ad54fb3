"""Defender (self-supervised U-Net) training throughput on one chip.

The reference trains the defender at batch 24 for 200 epochs
(defender_train.py:44,56); this measures the per-chip step rate of the
rebuilt pipeline: frozen-detector pass -> Masker composite (self-sup
crops) -> U-Net fwd+bwd -> adam update.

    python tools/bench_defense.py [--batch 24]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main(model="efficientdet-lite4", batch=24, iters=10, packed=0):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.defense.defender import (
        PatchAttackDefender)
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

    defender = PatchAttackDefender(config, variables, packed=packed)
    state = defender.init_state(jax.random.PRNGKey(1))
    images = jax.random.uniform(jax.random.PRNGKey(2),
                                (batch, *spec.image_size, 3),
                                minval=-1.0, maxval=1.0)
    jax.block_until_ready(jax.tree.leaves(state)[0])

    step_fn = jax.jit(defender.train_step, donate_argnums=0)
    step = lambda s, im: step_fn(s, im, det_variables=variables)
    fence = lambda s: float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
    state, m = step(state, images)
    fence(state)
    for _ in range(2):
        state, m = step(state, images)
    fence(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    fence(state)
    dt = (time.perf_counter() - t0) / iters
    tag = f" packed{packed}" if packed else ""
    print(f"defender train{tag} b{batch}: {dt*1e3:.1f} ms/step, "
          f"{batch/dt:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--packed", type=int, nargs="?", const=3, default=0,
                   help="space-to-depth lane-packed U-Net "
                        "(models/unet_packed.py); value = packing depth 1-3")
    a = p.parse_args()
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    main(a.model, a.batch, packed=a.packed)
