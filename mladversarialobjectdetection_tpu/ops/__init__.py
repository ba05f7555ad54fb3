from . import (anchors, color, eot, iou_loss, nms, nms_np,  # noqa: F401
               postprocess, preprocess, wbf)
