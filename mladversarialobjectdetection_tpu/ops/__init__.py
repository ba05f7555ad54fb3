from . import anchors, nms, preprocess, color, eot  # noqa: F401
