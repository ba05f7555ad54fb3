"""Per-HLO time attribution for a forward program on real hardware.

Runs the backbone (or full) forward under jax.profiler.trace and
aggregates device-stream op durations from the perfetto trace, printing
the top ops and a stage bucket summary (stem / early blocks / late
blocks / fpn / heads by HLO metadata). Answers WHERE the giants'
backbone slack lives (tools/profile_fwd_split.py showed d7x backbone at
59% of its byte floor while BiFPN runs at 89%).

Usage: python tools/profile_hlo.py --model efficientdet-d7x --batch 8
       [--part backbone|full]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def run_traced(fn, *args):
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    # warm up (compile) outside the trace
    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(tmp):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise RuntimeError(f"no trace produced under {tmp} "
                           "(device profiling unsupported on this "
                           "platform?)")
    with gzip.open(max(files, key=os.path.getmtime), "rt") as f:
        return json.load(f)


def device_events(trace):
    """Duration events from TPU/device tracks (skip host python threads)."""
    pids = {p["pid"] for p in trace.get("traceEvents", [])
            if p.get("ph") == "M" and p.get("name") == "process_name"
            and any(k in str(p.get("args", {}).get("name", "")).lower()
                    for k in ("tpu", "device", "xla", "/device:"))}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and (not pids or ev.get("pid") in pids):
            yield ev


def main(model_name, batch, part):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.models.efficientnet import (
        EfficientNet)

    cfg = mad.get_efficientdet_config(model_name)
    cfg.mixed_precision = True
    spec = spec_from_config(cfg)
    hw = spec.image_size
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, *hw, 3),
                           minval=-1, maxval=1)

    net = EfficientDetNet(spec)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)
    _ = float(np.asarray(
        jax.tree.leaves(variables["params"])[0]).reshape(-1)[0])

    if part == "backbone":
        bb = EfficientNet(spec.backbone, None, jnp.bfloat16)
        bb_vars = {"params": variables["params"]["backbone"],
                   "batch_stats": variables["batch_stats"]["backbone"]}
        fn = jax.jit(lambda xx: bb.apply(bb_vars, xx.astype(jnp.bfloat16),
                                         False))
    else:
        fn = jax.jit(lambda xx: net.apply(variables, xx, False))

    print(f"{model_name} @ {hw} b{batch} part={part}", flush=True)
    trace = run_traced(fn, x)

    # aggregate by the flax scope carried in the tf_op arg; track bytes
    # so per-op achieved bandwidth falls out (dur is µs; the richer
    # device_duration_ps is only on HLO events — use dur for uniformity)
    by_op = collections.defaultdict(lambda: [0.0, 0.0])  # dur_us, bytes
    total = 0.0
    for ev in device_events(trace):
        args = ev.get("args") or {}
        dur = float(ev.get("dur", 0.0))
        name = str(args.get("tf_op", "") or "").strip(":") or ev.get(
            "name", "?")
        # skip the enclosing jit span (it double-counts its children)
        if name.startswith("jit_") or "(" in name and "/" not in name:
            continue
        rec = by_op[name]
        rec[0] += dur
        rec[1] += float(args.get("bytes_accessed", 0) or 0)
        total += dur
    print(f"total device-event time {total/3e3:.2f} ms/run")
    print("top 40 ops (ms/run, share, achieved GB/s, scope):")
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])
    for name, (dur, by) in top[:40]:
        bw = (by / 1e9) / (dur / 1e6) if dur else 0.0
        print(f"  {dur/3e3:9.3f} ms {dur/total:6.1%} {bw:8.1f} GB/s  "
              f"{name[:100]}")

    buckets = collections.defaultdict(lambda: [0.0, 0.0])
    for name, (dur, by) in by_op.items():
        key = "other"
        if "stem" in name:
            key = "stem"
        elif "blocks_" in name:
            i = name.split("blocks_")[1]
            i = int("".join(c for c in i.split("/")[0] if c.isdigit()) or 0)
            key = f"blocks_{i//10*10:02d}s"
        elif "fpn" in name.lower():
            key = "fpn"
        elif "class_net" in name or "box_net" in name:
            key = "heads"
        b = buckets[key]
        b[0] += dur
        b[1] += by
    print("buckets (ms/run, share, achieved GB/s):")
    for key, (dur, by) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        bw = (by / 1e9) / (dur / 1e6) if dur else 0.0
        print(f"  {dur/3e3:9.3f} ms {dur/total:6.1%} {bw:8.1f} GB/s  {key}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="efficientdet-d7x")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--part", default="backbone",
                    choices=("backbone", "full"))
    a = ap.parse_args()
    main(a.model, a.batch, a.part)
