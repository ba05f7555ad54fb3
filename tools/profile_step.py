"""Component-level profile of the attack training step on real hardware.

Usage:  python tools/profile_step.py [--model efficientdet-lite4]
                                     [--image-size 640] [--batch 12]

Prints fenced per-component timings (detector forward, first pass with
NMS, EOT forward+grad, full train step). All timings are host-read fenced
(see BENCH_NOTES.md: block_until_ready is unreliable on remote-execution
platforms).
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
    # two warm fenced calls: the first can absorb leftover device-queue work
    # on this platform and report garbage (see BENCH_NOTES.md). The fence
    # reduces ON DEVICE first — np.asarray on a [B,H,W,C] activation would
    # download it through the tunnel and corrupt the timing.
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _i in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def bias_person_detections(variables, num_classes=90):
    """Make every anchor a confident person: class-predict bias +3 for
    class 0, -10 elsewhere. Forces ALL max_boxes EOT slots live — the
    worst-case (and round-1-comparable) compositing load."""
    params = variables["params"]
    pred = params["class_net"]["predict"]
    leaf = pred["pw"] if "pw" in pred else pred
    bias = np.asarray(leaf["bias"])
    a_c = bias.shape[0]
    new_bias = np.full((a_c,), -10.0, np.float32)
    new_bias[0::num_classes] = 3.0
    leaf["bias"] = jnp.asarray(new_bias)
    return variables


def main(model_name="efficientdet-lite4", image_size=None, batch=12,
         bias_detections=False):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.ops import eot

    cfg = mad.get_efficientdet_config(model_name)
    # benched operating point (bench.py / attack/train.py defaults)
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                            "pre_nms_topk": 256})
    cfg.mixed_precision = True
    if image_size is not None:
        cfg.image_size = image_size
    spec = spec_from_config(cfg)
    net = EfficientDetNet(spec)
    hw = spec.image_size
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, *hw, 3),
                           minval=-1, maxval=1)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)
    _ = float(np.asarray(jax.tree.leaves(variables["params"])[0]).reshape(-1)[0])
    if bias_detections:
        variables = bias_person_detections(variables, cfg.num_classes)
    print(f"model {model_name} @ {hw} batch {batch} "
          f"bias_detections={bias_detections}", flush=True)

    # close over variables: argument-passed weights re-upload through the
    # tunnel on every call on this platform (see BENCH_NOTES.md)
    fwd = jax.jit(lambda xx: net.apply(variables, xx, False))
    print(f"detector fwd:        {fenced(fwd, x)*1e3:7.1f} ms",
          flush=True)

    attacker = PatchAttacker(cfg, variables, window=320)
    fp = jax.jit(attacker.first_pass)
    print(f"first_pass (+NMS):   {fenced(fp, x)*1e3:7.1f} ms", flush=True)

    boxes, scores, valid = fp(x)
    bx = boxes[:, :attacker.max_boxes]
    bv = valid[:, :attacker.max_boxes]
    print(f"live slots (max/img): {int(np.asarray(bv).sum(1).max())} "
          f"mean {float(np.asarray(bv).sum(1).mean()):.1f}", flush=True)
    patch = jax.random.uniform(jax.random.PRNGKey(1),
                               (attacker.patch_size, attacker.patch_size, 3),
                               minval=-1, maxval=1)
    key = jax.random.PRNGKey(2)

    def eot_loss(k, im, b, v, p):
        out, _ = eot.apply_patches(k, im, b, v, p, 0.4, window=320)
        return jnp.sum(out ** 2)

    g = jax.jit(jax.value_and_grad(eot_loss, argnums=4))
    print(f"EOT fwd+grad:        {fenced(g, key, x, bx, bv, patch)*1e3:7.1f} ms",
          flush=True)

    state = attacker.init_state(jax.random.PRNGKey(3))
    step = jax.jit(attacker.train_step, static_argnames=("with_asr",))
    dt = fenced(lambda s, xx: step(s, xx, with_asr=True,
                                   det_variables=variables)[0].patch,
                state, x)
    print(f"full step (+ASR):    {dt*1e3:7.1f} ms "
          f"({batch/dt:.1f} img/s/chip)", flush=True)
    dt = fenced(lambda s, xx: step(s, xx, with_asr=False,
                                   det_variables=variables)[0].patch,
                state, x)
    print(f"full step (no ASR):  {dt*1e3:7.1f} ms "
          f"({batch/dt:.1f} img/s/chip)", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientdet-lite4")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--bias-detections", action="store_true")
    a = p.parse_args()
    main(a.model, a.image_size, a.batch, a.bias_detections)
