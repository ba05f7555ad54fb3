"""Victim-confidence probe for the north-star ceiling analysis.

The synthetic victim (examples/northstar_soak.py) is trained on
high-contrast rectangle "persons" and is expected to be far more
confident than a COCO-trained lite4 — which caps the achievable
asr_to_scale: suppressing a 0.97-score detection below the 0.5 ASR
threshold is a much larger logit move than suppressing the reference
detector's typical 0.6-0.8 scores.

Reports the clean max-score distribution per image over held-out scenes
(the same fixed val stream the soak uses) plus the per-anchor score mass.

Run (TPU, after a soak saved its victim):
  python tools/victim_confidence.py --victim-ckpt /tmp/northstar/victim_ckpt
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--victim-ckpt", required=True)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--seed", type=int, default=777)  # soak val stream
    ap.add_argument("--out", default="")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from production_soak import synthetic_person_batch
    import mladversarialobjectdetection_tpu as mad
    from mladversarialobjectdetection_tpu.attack.attacker import PatchAttacker
    from mladversarialobjectdetection_tpu.ckpt import io as ckpt_io

    cfg = mad.get_efficientdet_config("efficientdet-lite4")
    cfg.nms_configs.update({"iou_thresh": 0.5, "score_thresh": 0.5,
                            "pre_nms_topk": 256})
    cfg.mixed_precision = True
    det_vars = jax.device_put(ckpt_io.load_pytree(a.victim_ckpt))
    attacker = PatchAttacker(cfg, det_vars, window=320)
    fp = jax.jit(attacker.first_pass)

    rng = np.random.default_rng(a.seed)
    per_img_max, all_scores = [], []
    for _ in range(a.batches):
        imgs, _, _, _ = synthetic_person_batch(rng, 24, 640)
        _, scores, valid = fp(jnp.asarray(imgs), det_vars)
        s = np.asarray(scores)
        v = np.asarray(valid)
        for i in range(s.shape[0]):
            si = s[i][v[i]]
            all_scores.extend(si.tolist())
            per_img_max.append(float(si.max()) if si.size else 0.0)
    pm = np.array(per_img_max)
    al = np.array(all_scores)
    rec = {"victim": a.victim_ckpt, "n_images": int(pm.size),
           "n_detections": int(al.size),
           "per_image_max": {"mean": float(pm.mean()),
                             "p10": float(np.percentile(pm, 10)),
                             "p50": float(np.percentile(pm, 50)),
                             "p90": float(np.percentile(pm, 90))},
           "all_detections": {"mean": float(al.mean()),
                              "p10": float(np.percentile(al, 10)),
                              "p50": float(np.percentile(al, 50)),
                              "p90": float(np.percentile(al, 90))}}
    print(json.dumps(rec, indent=1), flush=True)
    if a.out:
        json.dump(rec, open(a.out, "w"), indent=1)


if __name__ == "__main__":
    main()
