"""Benchmark harness: adversarial-patch training throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: attack-training images/sec/chip on the reference's headline
workload — efficientdet-lite4 victim at 640x640, batch 24 (the reference
uses batch 12 on a 16GB GPU, attacker_train.py:45; per-chip throughput is
batch-normalized so the larger batch only amortizes overheads), the full
two-pass + EOT-composite + backward step. The operating point
(pre_nms_topk 256, window 320) matches the shipped driver defaults
(attack/train.py).

Workload regimes (--regime):
  live (default, the RECORDED number): the EOT compositor places patches
    on a pinned distribution of person boxes — 1-5 valid slots per image
    cycling across the batch (mean 3, batch max 5), the documented
    typical regime of attack training on real data (1-5 persons/image;
    the data-adaptive slot skip in ops/eot.py keys on the batch max).
    Injected via train_step's boxes_override hook; the clean detector
    pass still runs at full cost (see attacker.py), so this measures the
    complete two-pass + compositing + backward program.
  zero: no live slots — the data-adaptive skip removes all compositing
    (what a random-init victim on random images produces; this was the
    recorded regime in BENCH_r02 — kept as an upper-bound row).
  full: all 16 slots live on every image — worst-case compositing load.

Baseline: the reference publishes no attack-training throughput
(BASELINE.md). The vs_baseline denominator is an estimate of the TF 2.8
single-GPU (V100-class) pipeline derived from the vendored automl numbers:
EfficientDet-D2@640 single-image inference is 14.8 ms on V100
(automl/efficientdet/README.md:106; lite4@640 has comparable FLOPs). One
attack step = 2 forwards + 1 backward (~2x forward) ~= 4 forward-equivalents
plus the serial per-person while_loop patcher => <= ~17 img/s. We use
17 img/s; see BENCH_NOTES.md for the derivation.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 17.0


def make_live_slot_boxes(batch: int, image_hw, max_boxes: int = 16,
                         lives=(1, 2, 3, 4, 5), seed: int = 0):
    """Pinned person-box workload: image i gets lives[i % len] valid slots.

    Box shapes follow the typical person-detection regime on 640px frames:
    heights 150-400 px, aspect ~0.3-0.5, uniformly placed fully in-bounds.
    Deterministic (seeded numpy) so every bench run composites the exact
    same geometry.
    """
    h, w = image_hw
    rng = np.random.default_rng(seed)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    valid = np.zeros((batch, max_boxes), bool)
    for i in range(batch):
        n = lives[i % len(lives)]
        for j in range(n):
            bh = rng.uniform(150.0, 400.0)
            bw = bh * rng.uniform(0.3, 0.5)
            y0 = rng.uniform(0.0, h - bh)
            x0 = rng.uniform(0.0, w - bw)
            boxes[i, j] = (y0, x0, y0 + bh, x0 + bw)
            valid[i, j] = True
    return boxes, valid


def bench_attack_train(model_name: str = "efficientdet-lite4",
                       batch_size: int = 24, iters: int = 10,
                       warmup: int = 3, regime: str = "live",
                       verbose: bool = False,
                       packed_entry: int = 0) -> float:
    import sys

    import jax
    import jax.numpy as jnp

    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)

    def log(msg):
        if verbose:
            print(f"[bench +{time.perf_counter() - t_start:.0f}s] {msg}",
                  file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    log(f"start (regime={regime})")
    config = mad.get_efficientdet_config(model_name)
    config.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                               # static NMS candidate cap: with score_thresh
                               # .5 there are never 256 above-threshold
                               # person anchors in an image
                               "pre_nms_topk": 256})
    # bf16 activations / fp32 params+predictions: the TPU-native precision
    # policy for the attack (automl utils.py:552-642 equivalent)
    config.mixed_precision = True
    spec = spec_from_config(config)
    net = EfficientDetNet(spec)
    x = jnp.zeros((1, *spec.image_size, 3))
    log("compiling init")
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x, training=False)
    float(jax.tree.leaves(variables["params"])[0].sum())  # host fence
    log("init done")

    # 320px composite window covers the learned-scale patch regime
    # (diag <= 320 <=> patch side <= 226px; see ops/eot.py)
    attacker = PatchAttacker(config, variables, window=320,
                             packed_entry=packed_entry)
    state = attacker.init_state(jax.random.PRNGKey(1))
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (batch_size, *spec.image_size, 3),
        minval=-1.0, maxval=1.0)

    if regime == "zero":
        override = None  # random-init victim detects nothing -> no slots
    elif regime == "live":
        b, v = make_live_slot_boxes(batch_size, spec.image_size,
                                    attacker.max_boxes)
        override = (jnp.asarray(b), jnp.asarray(v))
    elif regime == "full":
        b, v = make_live_slot_boxes(batch_size, spec.image_size,
                                    attacker.max_boxes,
                                    lives=(attacker.max_boxes,))
        override = (jnp.asarray(b), jnp.asarray(v))
    else:
        raise ValueError(f"unknown regime {regime!r}")

    jax.block_until_ready(state.patch)
    log("state ready; compiling train_step")

    # NOTE: timings are fenced with explicit host reads — on this platform
    # block_until_ready can return before device execution completes, but
    # the steps form a dependency chain through the donated state, so a
    # final host read bounds the true wall time.
    def fence(s):
        return float(jnp.sum(s.scale))

    # steady-state driver step: the ASR metrics-NMS runs only on logged
    # steps (1/50 in attack/train.py), so the representative per-step cost
    # excludes it
    # det_variables and boxes_override are passed at each CALL, not bound
    # via closure/partial: partial-bound arrays become trace-time constants
    # embedded in the program (60 MB of victim weights -> oversized compile
    # payloads over the tunnel; see attack/attacker.py note)
    step_fn = jax.jit(
        functools.partial(attacker.train_step, with_asr=False),
        donate_argnums=0)

    def train_step(s, imgs):
        return step_fn(s, imgs, boxes_override=override,
                       det_variables=variables)

    state, metrics = train_step(state, images)
    fence(state)
    log("train_step compiled")
    for _ in range(warmup - 1):
        state, metrics = train_step(state, images)
    fence(state)
    log("warmup done")

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, images)
    fence(state)
    dt = time.perf_counter() - t0
    n_chips = max(1, jax.local_device_count())
    return batch_size * iters / dt / n_chips


def main():
    import argparse
    import os
    import sys
    import threading

    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    p = argparse.ArgumentParser()
    p.add_argument("--regime", default="live",
                   choices=("live", "zero", "full"))
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--packed-entry", type=int, default=0,
                   help="victim entry blocks in the space-to-depth packed "
                        "layout (models/efficientnet_packed.py); bench "
                        "lever, default off until measured to win")
    args = p.parse_args()
    enable_compilation_cache()  # reuse compiled programs across bench runs

    # Fail fast when the device tunnel is unreachable: backend init
    # otherwise blocks forever and the harness records nothing actionable.
    ready = threading.Event()
    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))

    def watchdog():
        if not ready.wait(init_timeout):
            print(f"bench: device backend failed to initialize within "
                  f"{init_timeout:.0f}s (tunnel down?)", file=sys.stderr,
                  flush=True)
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    jax.local_device_count()  # forces backend init under the watchdog
    ready.set()
    ips = bench_attack_train(batch_size=args.batch, regime=args.regime,
                             packed_entry=args.packed_entry,
                             verbose=bool(os.environ.get("BENCH_VERBOSE")))
    print(json.dumps({
        "metric": "attack_train_images_per_sec_per_chip_lite4_640",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
