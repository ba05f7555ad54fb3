"""Model-zoo serving benchmark: every EfficientDet variant on real TPU.

The vendored automl README publishes a per-model latency/throughput table
(automl/efficientdet/README.md:85-95: V100 end-to-end batch-1/batch-8).
This sweeps our serve program — forward + postprocess_global, bf16, fixed
shapes — across the whole family and records the TPU-chip equivalent.

Usage: python tools/bench_zoo.py [--models lite0 lite4 d0] [--out file]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ALL_MODELS = [f"efficientdet-lite{i}" for i in range(5)] + \
             [f"efficientdet-d{i}" for i in range(8)] + ["efficientdet-d7x"]


def bench_model(model_name: str, batches=(1, 8), iters=20,
                packed_entry=0):
    import jax
    import jax.numpy as jnp
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
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *hw, 3)),
        training=False)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(variables["params"]))

    # variables as a runtime argument: closure-captured weights lower as
    # embedded HLO constants — d7x's 310 MB of f32 params blew the tunnel's
    # remote-compile payload limit (HTTP 413) and slowed every compile
    def serve(variables, images, scales):
        cls_out, box_out = net.apply(variables, images, False)
        return postprocess.postprocess_global(params, cls_out, box_out,
                                              image_scales=scales)

    f0 = jax.jit(serve)
    f = lambda x, s: f0(variables, x, s)
    # v5e peaks for the roofline columns (tools/roofline.py)
    HBM_GBS, BF16_TFLOPS = 819.0, 197.0
    rows = {}
    for b in batches:
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, *hw, 3),
                               minval=-1, maxval=1)
        scales = jnp.ones((b,), jnp.float32)
        t0 = time.perf_counter()
        lowered = f0.lower(variables, x, scales)
        compiled = lowered.compile()
        det = f(x, scales)
        _ = float(jnp.sum(det.scores))  # fence through a host read
        compile_s = time.perf_counter() - t0
        ca = compiled.cost_analysis() or {}
        flops, bytes_ = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        # XLA-cost-model floor: the larger of the compute / bandwidth bounds
        floor_ms = max(flops / (BF16_TFLOPS * 1e12),
                       bytes_ / (HBM_GBS * 1e9)) * 1e3
        for _ in range(3):
            det = f(x, scales)
        _ = float(jnp.sum(det.scores))
        t0 = time.perf_counter()
        for _ in range(iters):
            det = f(x, scales)
        _ = float(jnp.sum(det.scores))
        dt = (time.perf_counter() - t0) / iters
        rows[b] = {"ms": dt * 1e3, "fps": b / dt, "compile_s": compile_s,
                   "gflop": flops / 1e9, "gb_accessed": bytes_ / 1e9,
                   "roofline_floor_ms": floor_ms,
                   "pct_of_roofline": 100.0 * floor_ms / (dt * 1e3)}
        print(f"{model_name} @ {hw[0]} b{b}: {dt*1e3:7.2f} ms "
              f"({b/dt:7.1f} img/s, compile {compile_s:.0f}s, "
              f"{100.0*floor_ms/(dt*1e3):.0f}% of roofline)", flush=True)
    return {"image_size": hw[0], "params_m": n_params / 1e6,
            "batches": rows}


def main():
    from mladversarialobjectdetection_tpu.utils.debug import (
        enable_compilation_cache)
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=None,
                   help="short names (lite0, d3, d7x) or full; default all")
    p.add_argument("--batches", nargs="*", type=int, default=[1, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="docs/ZOO_BENCH.json")
    p.add_argument("--packed-entry", type=int, default=0,
                   help="leading backbone blocks in the packed layout")
    a = p.parse_args()
    models = ([m if m.startswith("efficientdet") else f"efficientdet-{m}"
               for m in a.models] if a.models else ALL_MODELS)

    import jax
    # merge into an existing sweep file so a targeted re-run
    # (--models d7x) updates rows in place instead of dropping the rest
    results = {}
    if os.path.isfile(a.out):
        try:
            results = json.load(open(a.out)).get("results", {})
        except Exception:
            pass
    payload = {"device": str(jax.devices()[0].device_kind),
               "dtype": "bf16 activations / f32 params",
               "program": "serve = forward + postprocess_global",
               "results": results}
    for m in models:
        try:
            row = bench_model(m, tuple(a.batches), a.iters,
                              a.packed_entry)
            # merge batches into an existing row so `--models lite0
            # --batches 32` augments the b1/b8 data instead of dropping it
            prior = results.get(m, {})
            if "batches" in prior and "error" not in prior:
                merged = dict(prior["batches"])
                merged.update({str(k): v for k, v in row["batches"].items()})
                row["batches"] = merged
            results[m] = row
        except Exception as e:  # record and continue the sweep
            print(f"{m}: FAILED {type(e).__name__}: {e}", flush=True)
            results[m] = {"error": f"{type(e).__name__}: {e}"}
        # checkpoint the sweep after every model so a partial run lands
        with open(a.out, "w") as f:
            json.dump(payload, f, indent=1)
    print(f"\nwrote {a.out}\n")

    # markdown table
    print("| model | size | params | b1 ms | b1 img/s | b8 ms | b8 img/s "
          "| b8 %roof |")
    print("|---|---|---|---|---|---|---|---|")
    for m, r in results.items():
        if "error" in r:
            print(f"| {m} | — | — | {r['error']} | | | | |")
            continue
        b1 = r["batches"].get(1) or r["batches"].get("1")
        b8 = r["batches"].get(8) or r["batches"].get("8")
        cell = lambda b, k, f: (f % b[k]) if b and b.get(k) is not None else "—"
        print(f"| {m} | {r['image_size']} | {r['params_m']:.1f}M "
              f"| {cell(b1, 'ms', '%.2f')} | {cell(b1, 'fps', '%.0f')} "
              f"| {cell(b8, 'ms', '%.2f')} | {cell(b8, 'fps', '%.0f')} "
              f"| {cell(b8, 'pct_of_roofline', '%.0f%%')} |")


if __name__ == "__main__":
    main()
