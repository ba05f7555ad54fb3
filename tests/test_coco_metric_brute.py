"""Randomized differential test for utils/coco_metric.COCOEvaluator.

The real pycocotools cross-check (test_postprocess_extras.py) skips in
environments without the package. This file closes as much of that gap
as possible offline: `_brute_cocoeval` below is an INDEPENDENT, direct,
unoptimized transcription of the published pycocotools COCOeval "bbox"
algorithm (cocoeval.py: evaluateImg + accumulate + summarize semantics,
the same spec the reference's coco_metric.py:186-214 defers to) —
xywh-style IoU math, per-(T, image, class) greedy matching with the
crowd/ignore rules, all-images mergesort accumulation, 101-point
interpolation via searchsorted, and the -1 empty-category convention.
It shares no code or structure with COCOEvaluator (which caches IoU
matrices per (image, class), evaluates only the six summarized cells,
and short-circuits), so agreement on adversarially randomized inputs is
meaningful evidence, not a tautology.
"""
import numpy as np
import pytest

from mladversarialobjectdetection_tpu.utils import coco_metric

T_THRS = np.arange(0.5, 1.0, 0.05)
R_THRS = np.linspace(0.0, 1.0, 101)
AREAS = {"all": (0.0, float("inf")), "small": (0.0, 1024.0),
         "medium": (1024.0, 9216.0), "large": (9216.0, float("inf"))}


def _iou_xywh(d, g, iscrowd):
    """maskUtils.iou for bboxes: [D, G]; crowd columns use inter/areaD."""
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        for j, gb in enumerate(g):
            x0 = max(db[0], gb[0])
            y0 = max(db[1], gb[1])
            x1 = min(db[0] + db[2], gb[0] + gb[2])
            y1 = min(db[1] + db[3], gb[1] + gb[3])
            inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
            da = db[2] * db[3]
            ga = gb[2] * gb[3]
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _brute_evaluate_img(dts, gts, area_rng, max_det):
    """cocoeval.COCOeval.evaluateImg, transcribed for one (img, cls).

    dts: list of dict(bbox=xywh, score); gts: list of dict(bbox, iscrowd).
    Returns dict(dtScores, dtMatches[T, D], dtIgnore[T, D], gtIgnore[G]).
    """
    for g in gts:
        a = g["bbox"][2] * g["bbox"][3]
        g["_ignore"] = 1 if (g["iscrowd"] or a < area_rng[0]
                             or a > area_rng[1]) else 0
    # sort gts by _ignore (stable), dts by -score (stable), cap maxDet
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind][:max_det]
    iscrowd = [int(g["iscrowd"]) for g in gts]
    ious = _iou_xywh(np.array([d["bbox"] for d in dts]).reshape(-1, 4),
                     np.array([g["bbox"] for g in gts]).reshape(-1, 4),
                     iscrowd)
    T, G, D = len(T_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if G:
        for tind, t in enumerate(T_THRS):
            for dind, d in enumerate(dts):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and iscrowd[gind] == 0:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1
                gtm[tind, m] = 1
    # unmatched out-of-area dets are ignored
    a = np.array([d["bbox"][2] * d["bbox"][3] for d in dts])
    out = (a < area_rng[0]) | (a > area_rng[1])
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                np.tile(out, (T, 1))))
    return dict(dtScores=np.array([d["score"] for d in dts]),
                dtMatches=dtm, dtIgnore=dt_ig, gtIgnore=gt_ig)


def _brute_accumulate(per_img):
    """cocoeval accumulate for one (cls, area, maxDet) cell over images.
    Returns (precision[T, 101], recall[T]) or None (npig == 0)."""
    per_img = [e for e in per_img if e is not None]
    if not per_img:
        return None
    npig = int(sum((e["gtIgnore"] == 0).sum() for e in per_img))
    if npig == 0:
        return None
    scores = np.concatenate([e["dtScores"] for e in per_img])
    inds = np.argsort(-scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in per_img], 1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in per_img], 1)[:, inds]
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    T = len(T_THRS)
    precision = np.zeros((T, len(R_THRS)))
    recall = np.zeros(T)
    for t in range(T):
        tp = np.cumsum(tps[t]).astype(float)
        fp = np.cumsum(fps[t]).astype(float)
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall[t] = rc[-1] if nd else 0.0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, R_THRS, side="left")
        q = np.zeros(len(R_THRS))
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = q
    return precision, recall


def _brute_cocoeval(images):
    """The 12 summarize() stats from a list of per-image dicts with keys
    det_boxes/det_scores/det_classes (yxyx pixels) and gt_boxes/
    gt_classes/gt_crowd."""
    classes = sorted({int(c) for im in images
                      for c in list(im["gt_classes"])
                      + list(im["det_classes"])})

    def to_xywh(b):
        return [b[1], b[0], b[3] - b[1], b[2] - b[0]]

    def cell(cls, area_name, max_det):
        per_img = []
        for im in images:
            dts = [dict(bbox=to_xywh(b), score=float(s))
                   for b, s, c in zip(im["det_boxes"], im["det_scores"],
                                      im["det_classes"]) if int(c) == cls]
            gts = [dict(bbox=to_xywh(b), iscrowd=bool(cr))
                   for b, c, cr in zip(im["gt_boxes"], im["gt_classes"],
                                       im["gt_crowd"]) if int(c) == cls]
            if not dts and not gts:
                per_img.append(None)
                continue
            per_img.append(_brute_evaluate_img(dts, gts,
                                               AREAS[area_name], max_det))
        return _brute_accumulate(per_img)

    def summarize_ap(area_name, max_det, thr=None):
        vals = []
        for cls in classes:
            acc = cell(cls, area_name, max_det)
            if acc is None:
                continue
            p = acc[0]
            if thr is not None:
                p = p[[int(np.argmin(np.abs(T_THRS - thr)))]]
            vals.extend(p.reshape(-1).tolist())
        return float(np.mean(vals)) if vals else -1.0

    def summarize_ar(area_name, max_det):
        vals = []
        for cls in classes:
            acc = cell(cls, area_name, max_det)
            if acc is None:
                continue
            vals.extend(acc[1].reshape(-1).tolist())
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": summarize_ap("all", 100), "AP50": summarize_ap("all", 100, .5),
        "AP75": summarize_ap("all", 100, .75),
        "APs": summarize_ap("small", 100),
        "APm": summarize_ap("medium", 100),
        "APl": summarize_ap("large", 100),
        "ARmax1": summarize_ar("all", 1), "ARmax10": summarize_ar("all", 10),
        "ARmax100": summarize_ar("all", 100),
        "ARs": summarize_ar("small", 100), "ARm": summarize_ar("medium", 100),
        "ARl": summarize_ar("large", 100),
    }


def _random_scene(rng):
    """Adversarial scene generator: crowds, score ties (1-decimal
    quantization), duplicate/degenerate boxes, empty images, classes
    with dets-but-no-gt and gt-but-no-dets, areas pinned to the exact
    32^2 small/medium boundary, >10 dets for maxDet truncation."""
    images = []
    for _ in range(rng.integers(2, 6)):
        n_gt = int(rng.integers(0, 6))
        if n_gt:
            yx = rng.uniform(0, 200, (n_gt, 2))
            wh = rng.uniform(4, 130, (n_gt, 2))
            if rng.random() < 0.3:    # pin one gt to the area boundary
                wh[0] = (32.0, 32.0)
            g_boxes = np.concatenate([yx, yx + wh], 1)
        else:
            g_boxes = np.zeros((0, 4))
        g_cls = rng.integers(1, 4, n_gt)
        g_crowd = rng.random(n_gt) < 0.3
        n_dt = int(rng.integers(0, 13))
        d_boxes = np.zeros((n_dt, 4))
        for i in range(n_dt):
            if n_gt and rng.random() < 0.75:    # perturb a gt box; mixed
                jitter = rng.choice([0.0, 2.0, 8.0, 20.0])  # scales so the
                d_boxes[i] = (g_boxes[rng.integers(0, n_gt)]   # high-IoU
                              + rng.uniform(-jitter, jitter, 4))  # thresholds
                # (.75+) see matches too, not only the .5 band
                d_boxes[i, 2:] = np.maximum(d_boxes[i, 2:],
                                            d_boxes[i, :2])  # may degenerate
            else:                               # unrelated FP
                yx = rng.uniform(0, 250, 2)
                d_boxes[i] = np.concatenate([yx, yx + rng.uniform(2, 90, 2)])
        if n_dt >= 2 and rng.random() < 0.4:    # exact duplicate det
            d_boxes[1] = d_boxes[0]
        d_cls = rng.integers(1, 4, n_dt)
        d_scores = np.round(rng.uniform(0.05, 1.0, n_dt), 1)  # force ties
        images.append(dict(det_boxes=d_boxes, det_scores=d_scores,
                           det_classes=d_cls, gt_boxes=g_boxes,
                           gt_classes=g_cls, gt_crowd=g_crowd))
    return images


@pytest.mark.parametrize("seed", range(12))
def test_coco_metric_matches_brute_force_cocoeval(seed):
    rng = np.random.default_rng(seed)
    images = _random_scene(rng)
    ev = coco_metric.COCOEvaluator()
    for im in images:
        ev.add_image(im["det_boxes"], im["det_scores"], im["det_classes"],
                     im["gt_boxes"], im["gt_classes"],
                     gt_is_crowd=im["gt_crowd"])
    ours = ev.result()
    ref = _brute_cocoeval(images)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-9), (k, seed)
