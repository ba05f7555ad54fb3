"""Three-way forward split on real hardware: backbone / BiFPN / heads.

Localizes the giants' serve-roofline gap (d5-d7x b8 run at 66-72% of the
XLA cost-model HBM floor; postprocess was ruled out by measurement —
BENCH_NOTES "Round 4: decode-after-select"). Each stage is timed as its
own jitted program on materialized interface tensors AND compared to its
own cost-model byte floor, so the output names which stage is below
roofline rather than guessing.

Usage: python tools/profile_fwd_split.py --model efficientdet-d7x --batch 8

NOTE: jitted fns CLOSE OVER the weights — on this platform, weights
passed as call arguments re-upload through the tunnel every call and the
timing is garbage (BENCH_NOTES measurement methodology). That is the
opposite of the production convention (weights as args) and fine here:
these programs are throwaway probes.
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

HBM_GBPS = 819.0  # v5e


def fenced(fn, *args, n=8):
    def fence(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    for _ in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    return c.get("bytes accessed", 0.0), c.get("flops", 0.0)


def report(tag, fn, *args):
    jfn = jax.jit(fn)
    t = fenced(jfn, *args)
    by, fl = cost(fn, *args)
    floor = by / (HBM_GBPS * 1e9)
    frac = floor / t if t else 0.0
    print(f"{tag:24s} {t*1e3:8.2f} ms   {by/1e9:7.2f} GB  "
          f"floor {floor*1e3:7.2f} ms  ({frac:5.1%} of roofline)  "
          f"{fl/1e12:6.2f} TFLOP", flush=True)
    return t


def main(model_name, batch):
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.models import bifpn, heads
    from mladversarialobjectdetection_tpu.models.efficientdet import (
        EfficientDetNet, spec_from_config)
    from mladversarialobjectdetection_tpu.models.efficientnet import (
        EfficientNet)

    cfg = mad.get_efficientdet_config(model_name)
    cfg.mixed_precision = True
    spec = spec_from_config(cfg)
    net = EfficientDetNet(spec)
    hw = spec.image_size
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, *hw, 3),
                           minval=-1, maxval=1)
    variables = jax.jit(net.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, x[:1], training=False)
    # force weight materialization before timing
    _ = float(np.asarray(
        jax.tree.leaves(variables["params"])[0]).reshape(-1)[0])
    print(f"model {model_name} @ {hw} batch {batch}", flush=True)

    cdtype = jnp.bfloat16
    p, bs = variables["params"], variables["batch_stats"]

    # --- stage 1: backbone -> endpoints + extra resample levels -> feats
    bb = EfficientNet(spec.backbone, None, cdtype)
    bb_vars = {"params": p["backbone"], "batch_stats": bs["backbone"]}
    resamples = {
        level: (bifpn.ResampleFeatureMap(
            spec.fpn_num_filters, spec.level_hw[level],
            apply_bn=spec.apply_bn_for_resampling,
            conv_after_downsample=spec.conv_after_downsample,
            dtype=cdtype),
            # levels whose input already has fpn_num_filters channels are
            # pure pooling — no params/batch_stats collections exist
            {k: v for k, v in
             (("params", p.get(f"resample_p{level}")),
              ("batch_stats", bs.get(f"resample_p{level}")))
             if v})
        for level in range(6, spec.max_level + 1)}

    def backbone_stage(xx):
        endpoints = bb.apply(bb_vars, xx.astype(cdtype), False)
        feats = [endpoints[level - 1] for level in
                 range(spec.min_level, min(spec.max_level, 5) + 1)]
        for level in range(6, spec.max_level + 1):
            mod, mvars = resamples[level]
            feats.append(mod.apply(mvars, feats[-1], False))
        return feats

    t_bb = report("backbone+resample", backbone_stage, x)
    feats = jax.block_until_ready(jax.jit(backbone_stage)(x))

    # --- stage 2: BiFPN
    fpn = bifpn.FPNCells(
        spec.fpn_nodes, spec.min_level, spec.max_level,
        spec.fpn_cell_repeats, spec.fpn_num_filters, spec.level_hw,
        spec.fpn_weight_method, spec.act_type, spec.separable_conv,
        spec.apply_bn_for_resampling, spec.conv_after_downsample,
        spec.conv_bn_act_pattern, None, cdtype, False)
    fpn_vars = {"params": p["fpn_cells"], "batch_stats": bs["fpn_cells"]}

    def fpn_stage(ff):
        return fpn.apply(fpn_vars, ff, False)

    t_fpn = report("bifpn", fpn_stage, feats)
    fpn_feats = jax.block_until_ready(jax.jit(fpn_stage)(feats))

    # --- stage 3: heads
    num_levels = spec.max_level - spec.min_level + 1
    cnet = heads.class_net(
        spec.num_classes, spec.num_anchors, spec.fpn_num_filters,
        num_levels, spec.box_class_repeats, spec.act_type,
        spec.separable_conv, spec.survival_prob, None, False, cdtype)
    bnet = heads.box_net(
        spec.num_anchors, spec.fpn_num_filters, num_levels,
        spec.box_class_repeats, spec.act_type, spec.separable_conv,
        spec.survival_prob, None, False, cdtype)
    c_vars = {"params": p["class_net"], "batch_stats": bs["class_net"]}
    b_vars = {"params": p["box_net"], "batch_stats": bs["box_net"]}

    def heads_stage(ff):
        c = cnet.apply(c_vars, ff, False)
        b = bnet.apply(b_vars, ff, False)
        return ([o.astype(jnp.float32) for o in c],
                [o.astype(jnp.float32) for o in b])

    t_heads = report("class+box heads", heads_stage, fpn_feats)

    # --- whole forward for reference
    def full(xx):
        return net.apply(variables, xx, False)

    t_full = report("FULL forward", full, x)
    print(f"stage sum {1e3*(t_bb+t_fpn+t_heads):.2f} ms vs full "
          f"{1e3*t_full:.2f} ms (diff = fusion across stage boundaries "
          f"+ interface tensor traffic)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="efficientdet-d7x")
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()
    main(a.model, a.batch)
