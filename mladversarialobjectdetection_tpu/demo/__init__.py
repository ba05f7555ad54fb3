from . import draw  # noqa: F401


def make_demo_detector(model_name, detector_ckpt=None, detector_params=None):
    """Detector with the demos' permissive NMS defaults (iou .5, score 0 —
    the demos threshold per-overlay instead; demo.py:55-63). Shared by
    demo.py and demo_v2.py so their defaulting cannot drift."""
    from ..inference.detector import Detector
    params = dict(detector_params or {})
    nms = dict(params.get("nms_configs") or {})
    nms.setdefault("iou_thresh", 0.5)
    nms.setdefault("score_thresh", 0.0)
    params["nms_configs"] = nms
    return Detector(model_name=model_name, ckpt_path=detector_ckpt,
                    params=params)
